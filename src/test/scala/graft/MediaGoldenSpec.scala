package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.queries.GoldenMediaHashes

/** The frozen golden hash tables ([[graft.queries.GoldenMediaHashes]])
  * back the media-dedup oracles — this spec is the drift alarm: it
  * recomputes a sample of every table through the running JVM's real
  * codecs and compares bit-for-bit against the freeze. A failure here
  * means the JVM's PNG/JPEG/WAV codec or Java2D resampler changed —
  * regenerate via `Test/runMain graft.PairScanScratch` ONLY after
  * confirming the change is intentional (a silent regeneration would
  * turn the oracle gate vacuous). */
class MediaGoldenSpec extends SparkSpecBase {

  // 64 base ids spread across the id space + all 16 twins: wide enough
  // to catch any codec drift (a resampler change moves essentially
  // every hash), cheap enough to run in every suite pass
  private val sampleIds = (0L until 16L) ++ (16L until 4996L by 83L)

  private def idsDf = spark.range(0, 5000)
    .filter(col("id").isin(sampleIds: _*)).select(col("id").as("doc_id"))

  test("image dHash table matches the running codec") {
    val got = Multimodal.perceptualHash(spark,
        Multimodal.syntheticPatternMedia(idsDf))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === sampleIds.size)
    sampleIds.foreach { id =>
      assert(got(id) === GoldenMediaHashes.imgHash(id.toInt),
        s"image dHash drifted for id=$id — codec change?")
    }
  }

  test("JPEG twin dHash table matches the running codec") {
    val got = Multimodal.perceptualHash(spark,
        Multimodal.transcodeImages(spark,
          Multimodal.syntheticPatternMedia(
            idsDf.filter(col("doc_id") < 16)), "jpg"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 16).foreach { id =>
      assert(got(id.toLong) === GoldenMediaHashes.imgTwinHash(id),
        s"twin dHash drifted for id=$id")
    }
  }

  test("audio envelope hash tables match the running codec") {
    val got = Multimodal.audioEnvelopeHash(spark,
        Multimodal.syntheticModulatedAudio(idsDf))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    sampleIds.foreach { id =>
      assert(got(id) === GoldenMediaHashes.audHash(id.toInt),
        s"audio hash drifted for id=$id")
    }
    val twins = Multimodal.audioEnvelopeHash(spark,
        Multimodal.syntheticModulatedAudio(
          idsDf.filter(col("doc_id") < 16), ampScale = 1.02))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 16).foreach { id =>
      assert(twins(id.toLong) === GoldenMediaHashes.audTwinHash(id),
        s"audio twin hash drifted for id=$id")
    }
  }
}
