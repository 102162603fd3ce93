package graft

// Exploratory scratch main (round 16): dump the golden perceptual-hash
// tables (image dHash per id, JPEG-twin dHash per id<16, audio envelope
// hash per id, gain-1.02-twin hash per id<16) as fixed-stride 16-hex
// strings for freezing into GoldenMediaHashes. Not a test; run with
// Test/runMain. Ids 0..4999 cover every shipped SF (max doc_id 4999).
object PairScanScratch {
  def main(args: Array[String]): Unit = {
    import graft.operators.Multimodal
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val n = 5000L
    val ids = spark.range(0, n).select(col("id").as("doc_id"))
    def hex(rows: Array[(Long, Long)], count: Long): String = {
      val m = rows.toMap
      require(m.size == count, s"expected $count hashes, got ${m.size}")
      (0L until count).map(i => f"${m(i)}%016x").mkString
    }
    def collect(df: org.apache.spark.sql.DataFrame, offset: Long = 0L) =
      df.collect().map(r => (r.getLong(0) - offset, r.getLong(1)))
    val imgBase = collect(Multimodal.perceptualHash(spark,
      Multimodal.syntheticPatternMedia(ids)))
    val imgTwin = collect(Multimodal.perceptualHash(spark,
      Multimodal.transcodeImages(spark,
          Multimodal.syntheticPatternMedia(ids.filter(col("doc_id") < 16)), "jpg")
        .withColumn("media_id", col("media_id") + lit(1000000L))), 1000000L)
    val audBase = collect(Multimodal.audioEnvelopeHash(spark,
      Multimodal.syntheticModulatedAudio(ids)))
    val audTwin = collect(Multimodal.audioEnvelopeHash(spark,
      Multimodal.syntheticModulatedAudio(ids.filter(col("doc_id") < 16),
          ampScale = 1.02)
        .withColumn("media_id", col("media_id") + lit(1000000L))), 1000000L)
    def write(path: String, s: String): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(path),
        s.getBytes("UTF-8"))
    write("/tmp/golden_img.hex", hex(imgBase, n))
    write("/tmp/golden_img_twin.hex", hex(imgTwin, 16))
    write("/tmp/golden_aud.hex", hex(audBase, n))
    write("/tmp/golden_aud_twin.hex", hex(audTwin, 16))
    println("GOLDEN_DUMPED")
    spark.stop()
  }
}
