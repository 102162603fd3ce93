package graft

// Leg profile for embed_ann_ivf_sq8: split train (driver k-means) from
// search (probe join + rerank) to see where the 0.74s floor lives.
object IvfSq8Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    import graft.queries.Tables
    def time[A](n: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $n%-26s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // warmup round
    val embW = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val qW = embW.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), Similarity.asDouble(col("embedding")).as("qv"))
    Force.count(Similarity.ivfSq8TopK(embW, "vec_id", "embedding", qW, k = 10))
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), Similarity.asDouble(col("embedding")).as("qv"))
    (1 to 3).foreach { i =>
      val cents = time(s"train rep$i")(
        Similarity.trainIvfCentroids(emb, "vec_id", "embedding", 32, 10000))
      time(s"search rep$i")(Force.count(
        Similarity.ivfSq8TopK(emb, "vec_id", "embedding", queries, k = 10,
          centroids = cents)))
      time(s"full rep$i")(Force.count(
        Similarity.ivfSq8TopK(emb, "vec_id", "embedding", queries, k = 10)))
    }
    spark.stop()
  }
}
