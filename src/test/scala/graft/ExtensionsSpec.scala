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

  test("lsh_keys and ivf_cells are SQL-callable with constant configs") {
    GraftExtensions.registerAll(spark)
    // ivf_cells: nearest of two axis centroids by dot product
    val cellRow = spark.sql(
      """SELECT ivf_cells(array(0.9D, 0.1D),
        |  array(array(1.0D, 0.0D), array(0.0D, 1.0D)), 2) AS cells
        |""".stripMargin).head()
    assert(cellRow.getSeq[Int](0) === Seq(0, 1))
    // lsh_keys: SQL path must agree with the Column-API path bit for bit
    val planes = Seq(graft.operators.Similarity.hyperplanes(3, 2, seed = 5L))
    val planesSql = planes.map(_.map(_.mkString("array(", "D, ", "D)"))
      .mkString("array(", ", ", ")")).mkString("array(", ", ", ")")
    val viaSql = spark.sql(
      s"SELECT lsh_keys(array(0.3D, -0.7D), $planesSql, 1) AS k").head()
      .getSeq[Long](0)
    import spark.implicits._
    val viaApi = Seq(Tuple1(Seq(0.3, -0.7))).toDF("v")
      .select(graft.functions.LshKeys.keys(
        org.apache.spark.sql.functions.col("v").cast("array<double>"),
        planes, 1).as("k"))
      .head().getSeq[Long](0)
    assert(viaSql === viaApi)
    // non-constant config is rejected at analysis, not at runtime
    val err = intercept[Exception](spark.sql(
      """SELECT ivf_cells(array(1.0D), array(array(rand())), 1)""").head())
    assert(err.getMessage.contains("constant"))
    // a foldable NULL of the right type gets the same clean analysis
    // error, not an NPE from eval() returning null
    val nullMat = intercept[Exception](spark.sql(
      """SELECT ivf_cells(array(1.0D),
        |  CAST(NULL AS ARRAY<ARRAY<DOUBLE>>), 1)""".stripMargin).head())
    assert(nullMat.getMessage.contains("constant"), nullMat.getMessage)
    val nullTen = intercept[Exception](spark.sql(
      """SELECT lsh_keys(array(1.0D),
        |  CAST(NULL AS ARRAY<ARRAY<ARRAY<DOUBLE>>>), 0)""".stripMargin).head())
    assert(nullTen.getMessage.contains("constant"), nullTen.getMessage)
  }

  test("pq functions are SQL-callable and agree with the Column API") {
    GraftExtensions.registerAll(spark)
    // two subspaces of one dim each, two centroids per book; the unit
    // vector (0.6, 0.8) codes to the nearest centroid per subspace and
    // the ADC score is the sum of the two table lookups
    val books = "array(array(array(0.6D), array(-1.0D))," +
      " array(array(0.8D), array(0.1D)))"
    val row = spark.sql(
      s"""SELECT pq_adc_score(pq_codes(array(0.6D, 0.8D), $books),
         |  pq_adc_table(array(0.6D, 0.8D), $books)) AS s""".stripMargin).head()
    // unit(v) = (0.6, 0.8): subspace dots are 0.36 and 0.64 -> 1.0
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-9)
    import spark.implicits._
    val booksApi = Array(Array(Array(0.6), Array(-1.0)),
      Array(Array(0.8), Array(0.1)))
    val viaApi = Seq(Tuple1(Seq(0.6, 0.8))).toDF("v")
      .select(graft.functions.Pq.adcScore(
        graft.functions.Pq.codes(
          org.apache.spark.sql.functions.col("v").cast("array<double>"), booksApi),
        graft.functions.Pq.adcTable(
          org.apache.spark.sql.functions.col("v").cast("array<double>"), booksApi))
        .as("s")).head().getDouble(0)
    assert(math.abs(row.getDouble(0) - viaApi) < 1e-12)
    // non-constant codebooks rejected at analysis
    val err = intercept[Exception](spark.sql(
      """SELECT pq_codes(array(1.0D), array(array(array(rand()))))""").head())
    assert(err.getMessage.contains("constant"))
    // empty tensor shapes get the clean analysis error too, not a raw
    // empty.max / head-on-empty from the expression's initializers
    val empty = intercept[Exception](spark.sql(
      """SELECT pq_adc_table(array(1.0D),
        |  CAST(array() AS ARRAY<ARRAY<ARRAY<DOUBLE>>>))""".stripMargin).head())
    assert(empty.getMessage.contains("non-empty"), empty.getMessage)
    val emptyBook = intercept[Exception](spark.sql(
      """SELECT pq_codes(array(1.0D),
        |  array(CAST(array() AS ARRAY<ARRAY<DOUBLE>>)))""".stripMargin).head())
    assert(emptyBook.getMessage.contains("non-empty"), emptyBook.getMessage)
    // NULL nested inside an otherwise-valid constant: still the clean
    // error, not an NPE from the materialization loop
    val nullInner = intercept[Exception](spark.sql(
      """SELECT pq_codes(array(1.0D),
        |  array(array(array(1.0D)),
        |        CAST(NULL AS ARRAY<ARRAY<DOUBLE>>)))""".stripMargin).head())
    assert(nullInner.getMessage.contains("NULL matrices"), nullInner.getMessage)
    val nullRow = intercept[Exception](spark.sql(
      """SELECT ivf_cells(array(1.0D),
        |  array(array(1.0D), CAST(NULL AS ARRAY<DOUBLE>)), 1)""".stripMargin).head())
    assert(nullRow.getMessage.contains("NULL rows"), nullRow.getMessage)
    // ragged constants would crash per-row on executors (or silently
    // score a prefix) — rejected at analysis instead
    val ragged = intercept[Exception](spark.sql(
      """SELECT pq_codes(array(1.0D, 2.0D),
        |  array(array(array(0.0D, 0.0D), array(0.0D))))""".stripMargin).head())
    assert(ragged.getMessage.contains("rectangular"), ragged.getMessage)
    val raggedMat = intercept[Exception](spark.sql(
      """SELECT ivf_cells(array(1.0D, 2.0D),
        |  array(array(1.0D, 0.0D), array(1.0D)), 1)""".stripMargin).head())
    assert(raggedMat.getMessage.contains("rectangular"), raggedMat.getMessage)
    // all_finite: the trainers' sample predicate is SQL-visible too
    val fin = spark.sql(
      """SELECT all_finite(array(1.0D, 2.0D)) AS a,
        |  all_finite(array(1.0D, CAST('NaN' AS DOUBLE))) AS b,
        |  all_finite(CAST(NULL AS ARRAY<DOUBLE>)) AS c""".stripMargin).head()
    assert(fin.getBoolean(0) && !fin.getBoolean(1) && fin.isNullAt(2))
  }

  test("bpe_tokens is SQL-callable with a constant merge list") {
    GraftExtensions.registerAll(spark)
    // the hand-computed classic merges tokenize 'low newest' the same
    // through SQL as through the Column API (BpeSpec's fixture)
    val toks = spark.sql(
      """SELECT bpe_tokens('low newest',
        |  array(array('e','s'), array('es','t'), array('est','</w>'),
        |        array('l','o'), array('lo','w'))) AS t""".stripMargin)
      .head().getSeq[String](0)
    assert(toks === Seq("low", "</w>", "n", "e", "w", "est</w>"))
    // malformed pair shapes get the clean analysis error
    val err = intercept[Exception](spark.sql(
      """SELECT bpe_tokens('x', array(array('a')))""").head())
    assert(err.getMessage.contains("2-element"), err.getMessage)
    val nonConst = intercept[Exception](spark.sql(
      """SELECT bpe_tokens('x', array(array(uuid(), 'b')))""").head())
    assert(nonConst.getMessage.contains("constant"), nonConst.getMessage)
    // duplicate pairs would silently reorder greedy application (the
    // rank map keeps the last occurrence) — rejected at construction
    val dup = intercept[Exception](spark.sql(
      """SELECT bpe_tokens('abc',
        |  array(array('a','b'), array('b','c'), array('a','b')))""".stripMargin)
      .head())
    assert(dup.getMessage.contains("duplicate"), dup.getMessage)
  }
}
