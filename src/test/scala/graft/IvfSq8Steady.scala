package graft

// Isolated steady-state timing for embed_ann_ivf_sq8 (round-16 watch
// item: 0.49s r14 floor vs 0.66-0.93s r15). Mirrors Bench's protocol
// (same session config, sf0.001 warmup, Force.count) but runs ONE
// query for `reps` consecutive reps so its floor is measured without
// cross-row cache interference. Test/runMain graft.IvfSq8Steady
// [sfDir] [reps] [name]
object IvfSq8Steady {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 6
    val name = if (args.length > 2) args(2) else "embed_ann_ivf_sq8"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = SparkEntry.queries(name)
    import scala.jdk.CollectionConverters._
    val gcBeans = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala
    def gcMs: Long = gcBeans.map(_.getCollectionTime).sum
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    Force.count(q(spark, "/root/testdata/sf0.001"))
    val times = (1 to reps).map { i =>
      val g0 = gcMs
      val t0 = System.nanoTime()
      Force.count(q(spark, sfDir))
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[steady] $name rep$i $t%.3f s gc=${gcMs - g0}ms " +
        f"load=${os.getSystemLoadAverage}%.1f")
      t
    }
    println(f"[steady] $name min=${times.min}%.3f median=" +
      f"${times.sorted.apply(reps / 2)}%.3f max=${times.max}%.3f")
    spark.stop()
  }
}
