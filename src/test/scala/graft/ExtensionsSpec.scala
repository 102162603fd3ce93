package graft

import graft.plans.GraftExtensions

/** The native expressions must be reachable from plain SQL once
  * registered — and agree with the Column-API path. */
class ExtensionsSpec extends SparkSpecBase {

  test("registered SQL functions match the Column API") {
    GraftExtensions.registerAll(spark)
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f"), (2L, "x y z")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("ext_docs")

    val viaSql = spark.sql(
      """SELECT doc_id, simhash64(shingle_hashes(text, 2)) AS sim,
        |size(minhash_band_keys(shingle_hashes(text, 2), 16, 4)) AS nb
        |FROM ext_docs""".stripMargin)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap

    val viaApi = docs.select(
        org.apache.spark.sql.functions.col("doc_id"),
        graft.functions.HashExprs.simhash(
          graft.functions.HashExprs.shingleHashes(
            org.apache.spark.sql.functions.col("text"), 2)).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(viaSql.view.mapValues(_._1).toMap === viaApi)
    assert(viaSql.values.forall(_._2 === 4))

    val dot = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D))").head().getDouble(0)
    assert(dot === 11.0)

    // fingerprint kernels: SQL path agrees with the Column API, and
    // the winnow minimum is the rolling min-sample
    val fpSql = spark.sql(
      """SELECT doc_id, rolling_min_hash(text, 4) AS fp,
        |array_min(winnow_hashes(text, 4, 2)) AS wmin
        |FROM ext_docs""".stripMargin)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val fpApi = docs.select(
        org.apache.spark.sql.functions.col("doc_id"),
        graft.functions.HashExprs.rollingMinHash(
          org.apache.spark.sql.functions.col("text"), 4).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fpSql.view.mapValues(_._1).toMap === fpApi)
    assert(fpSql.values.forall { case (fp, wmin) => fp === wmin })

    // quantization kernels: SQL path agrees with the Column API, and
    // the quantized cosine of a vector with itself is exactly 1
    val qRow = spark.sql(
      """SELECT quantize_int8(array(0.5D, -1.0D, 0.25D)) AS q,
        |quantized_cosine(quantize_int8(array(0.5D, -1.0D, 0.25D)),
        |                 quantize_int8(array(0.5D, -1.0D, 0.25D))) AS c
        |""".stripMargin).head()
    assert(qRow.getAs[Array[Byte]](0).toSeq === Seq[Byte](64, -127, 32))
    assert(qRow.getDouble(1) === 1.0)
  }
}
