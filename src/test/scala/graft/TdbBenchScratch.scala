package graft

// One-off timing for the native TrailDB reader vs the reference's
// recorded C-scan number (BASELINE.md: read_traildb field="title" on
// pydata.tdb = 73.8 ms for the 109 626 x 37 393 one-hot). Not a test.
object TdbBenchScratch {
  def main(args: Array[String]): Unit = {
    val path = "/root/reference/sparsity/test/pydata.tdb"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](n: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[tdb-bench] $n%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // driver-only decode (the apples-to-apples leg vs the C scan:
    // same machine, single pass, no Spark job)
    (1 to 3).foreach { i =>
      time(s"driver decode all trails rep$i") {
        val db = graft.sources.TrailDb.open(path)
        var n = 0L
        (0 until db.numTrails.toInt).foreach { t =>
          n += graft.sources.TrailDb.decodeTrail(db, t).size
        }
        require(n == 109626L, s"expected 109626 events, got $n")
        n
      }
    }
    (1 to 3).foreach { i =>
      time(s"distributed events() count rep$i") {
        val n = graft.sources.TrailDb.events(spark, path).count()
        require(n == 109626L); n
      }
    }
    (1 to 2).foreach { i =>
      time(s"readTraildb(title) COO count rep$i") {
        val rel = graft.sources.TrailDb.readTraildb(spark, path, "title")
        val n = rel.df.count()
        require(n > 100000L); n
      }
    }
    spark.stop()
  }
}
