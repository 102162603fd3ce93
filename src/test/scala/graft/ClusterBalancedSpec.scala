package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Cluster-balanced sampling: sketch-plane determinism, the per-cell
  * cap against the definitional window reference, and the bounded
  * no-window plan shape. */
class ClusterBalancedSpec extends SparkSpecBase {

  private lazy val emb = graft.queries.Tables.embeddings(spark, sf)
  private lazy val planes = Sampling.sketchPlanes(3, 64, "cb")

  test("sketch planes are ±1, deterministic in the seed, seed-sensitive") {
    assert(planes.size === 3 && planes.forall(_.size === 64))
    assert(planes.flatten.forall(w => w == 1.0 || w == -1.0))
    assert(Sampling.sketchPlanes(3, 64, "cb") === planes)
    assert(Sampling.sketchPlanes(3, 64, "other") !== planes)
    assert(planes.distinct.size === 3, "planes must differ from each other")
  }

  test("equals the definitional per-cluster window prefix") {
    val got = Sampling.clusterBalancedSample(emb, "vec_id", "embedding",
        planes, k = 7, seed = "t")
      .collect().map(r => (r.getAs[Long]("cluster"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("rank"))).toSet
    // reference: same cluster ids, ROW_NUMBER window per cluster
    val v = graft.operators.Similarity.asDouble(col("embedding"))
    val cluster = planes.zipWithIndex.map { case (p, i) =>
      when(round(graft.operators.Similarity.dot(v, typedLit(p)), 6) >= 0,
        lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    val w = Window.partitionBy(col("cluster"))
      .orderBy(substring(md5(concat(lit("t"), col("vec_id").cast("string"))),
        1, 8), col("vec_id"))
    val ref = emb.select(cluster.as("cluster"), col("vec_id"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 7)
      .collect().map(r => (r.getAs[Long]("cluster"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("rank"))).toSet
    assert(got === ref)
  }

  test("every cell holds min(k, cell size) rows; stable under repartition") {
    val full = emb.count()
    val sizes = Sampling.clusterBalancedSample(emb, "vec_id", "embedding",
        planes, k = 65536, seed = "t")
      .groupBy(col("cluster")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Long]("cluster") -> r.getAs[Long]("n")).toMap
    assert(sizes.values.sum === full, "uncapped sample must keep everything")
    val capped = Sampling.clusterBalancedSample(emb, "vec_id", "embedding",
        planes, k = 7, seed = "t")
      .groupBy(col("cluster")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Long]("cluster") -> r.getAs[Long]("n")).toMap
    assert(capped.keySet === sizes.keySet)
    capped.foreach { case (c, n) => assert(n === math.min(7L, sizes(c))) }
    val re = Sampling.clusterBalancedSample(emb.repartition(13), "vec_id",
        "embedding", planes, k = 7, seed = "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = Sampling.clusterBalancedSample(emb, "vec_id", "embedding",
        planes, k = 7, seed = "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(re === got)
  }

  test("IVF-cell variant equals the per-cell window prefix on trained cells") {
    import graft.operators.Similarity
    val cents = Similarity.trainIvfCentroids(emb, "vec_id", "embedding",
      nlist = 4)
    val got = Sampling.clusterBalancedSampleCells(emb, "vec_id", "embedding",
        cents, k = 7, seed = "ti")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val cell = element_at(graft.functions.IvfCells.cells(
      Similarity.asDouble(col("embedding")), cents, 1), 1).cast("long")
    val w = Window.partitionBy(col("cluster"))
      .orderBy(substring(md5(concat(lit("ti"), col("vec_id").cast("string"))),
        1, 8), col("vec_id"))
    val ref = emb.select(cell.as("cluster"), col("vec_id"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === ref)
    // every trained cell holds min(k, cell size) rows
    val sizes = emb.select(cell.as("cluster"))
      .groupBy(col("cluster")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kept = got.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(kept.keySet === sizes.keySet)
    kept.foreach { case (c, n) => assert(n === math.min(7L, sizes(c))) }
  }

  test("plans as a bounded partial aggregate, never a window") {
    val p = Sampling.clusterBalancedSample(emb, "vec_id", "embedding",
        planes, k = 7, seed = "t")
      .queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), s"no partial top-k aggregate:\n$p")
    assert(!p.contains("Window"), s"window crept in:\n$p")
  }
}
