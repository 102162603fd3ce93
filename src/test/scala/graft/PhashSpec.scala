package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Perceptual-hash image near-dup: transcode invariance (the planted
  * property), discrimination across patterns, and the pigeonhole band
  * join's exactness at Hamming ≤ 3 against brute force. */
class PhashSpec extends SparkSpecBase {

  import spark.implicits._

  private lazy val docs = graft.queries.Tables.documents(spark, sf)
  private lazy val base = Multimodal.syntheticPatternMedia(docs)

  test("dHash survives JPEG transcode; solid images are degenerate") {
    val slice = base.filter(col("media_id") < 16)
    val h0 = Multimodal.perceptualHash(spark, slice)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val twins = Multimodal.transcodeImages(spark, slice, "jpg")
    val h1 = Multimodal.perceptualHash(spark, twins)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h0.keySet === h1.keySet)
    h0.foreach { case (id, ph) =>
      val d = java.lang.Long.bitCount(ph ^ h1(id))
      assert(d <= 3, s"id=$id drifted $d bits under JPEG transcode")
    }
    // patterns must discriminate (why the sinusoid generator exists):
    // the 16 distinct patterns produce many distinct hashes...
    assert(h0.values.toSet.size >= 8, s"patterns not discriminating: $h0")
    // ...whereas every solid image hashes to the same degenerate value
    val solid = Multimodal.syntheticMedia(docs)
      .filter(col("kind") === "image" && col("media_id") < 30)
    val hs = Multimodal.perceptualHash(spark, solid)
      .collect().map(_.getLong(1)).toSet
    assert(hs.size === 1, s"solid images should be degenerate, got $hs")
  }

  test("band join returns EXACTLY the brute-force Hamming<=3 pair set") {
    val hashes = Multimodal.perceptualHash(spark, base)
    val hs = hashes.collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ia, pa) <- hs; (ib, pb) <- hs if ia < ib
      d = java.lang.Long.bitCount(pa ^ pb) if d <= 3
    } yield (ia, ib, d.toLong)).toSet
    val got = Multimodal.phashNearDup(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === brute)
    assert(brute.nonEmpty, "fixture should contain natural near-dups")
  }

  test("audio envelope hash is gain-invariant, discriminating, degenerate on flat waves") {
    val slice = docs.filter(col("doc_id") < 16)
    val h0 = Multimodal.audioEnvelopeHash(spark,
        Multimodal.syntheticModulatedAudio(slice))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val h1 = Multimodal.audioEnvelopeHash(spark,
        Multimodal.syntheticModulatedAudio(slice, ampScale = 1.02))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h0.keySet === h1.keySet && h0.nonEmpty)
    h0.foreach { case (id, ph) =>
      val d = java.lang.Long.bitCount(ph ^ h1(id))
      assert(d <= 3, s"id=$id drifted $d bits under 1.02x gain")
    }
    assert(h0.values.toSet.size >= 8, s"envelopes not discriminating: $h0")
    // constant-amplitude square waves have a flat envelope — every
    // hash collapses to the same value (why the modulated generator exists)
    val flat = Multimodal.syntheticMedia(docs)
      .filter(col("kind") === "audio" && col("media_id") < 45)
    val hf = Multimodal.audioEnvelopeHash(spark, flat)
      .collect().map(_.getLong(1)).toSet
    assert(hf.size === 1, s"flat waves should be degenerate, got $hf")
  }

  test("phashDedup partitions equal union-find over the full pair relation") {
    val hashes = Multimodal.perceptualHash(spark, base).localCheckpoint()
    val ids = hashes.collect().map(_.getLong(0))
    val pairs = Multimodal.phashNearDup(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // driver union-find ground truth (fixture-sized)
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
    val want = ids.groupBy(find).values.map(_.toSet).toSet
    val got = Multimodal.phashDedup(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val gotParts = got.groupBy(_._2).values.map(_.map(_._1).toSet).toSet
    assert(gotParts === want)
    // exactly one survivor per cluster, and it is the min id
    got.groupBy(_._2).foreach { case (_, members) =>
      val survivors = members.filter(_._3).map(_._1)
      assert(survivors.length === 1)
      assert(survivors.head === members.map(_._1).min)
    }
  }

  test("dup-density guard: raw pair path fails loudly on a dup-dense " +
      "corpus, cluster path and opt-out still work") {
    import spark.implicits._
    // 1000 copies of one hash + a handful of distinct rows: identical
    // hashes alone imply ~500k pairs over ~1k rows — the output-
    // quadratic trap the guard exists for (r16 ask #6)
    val dense = ((0L until 1000L).map(i => (i, 0L)) ++
      Seq((2000L, -1L), (2001L, 0x0F0F0F0F0F0F0F0FL)))
      .toDF("media_id", "phash")
    val e = intercept[IllegalArgumentException](
      Multimodal.phashNearDup(dense, maxHamming = 3))
    assert(e.getMessage.contains("dup-dense") &&
      e.getMessage.contains("phashDedup"))
    // explicit opt-out materializes anyway
    assert(Multimodal.phashNearDup(dense, maxHamming = 3,
      maxPairsPerDoc = 0).count() === 1000L * 999 / 2)
    // the cluster path handles the same corpus without pairs
    val cl = Multimodal.phashDedup(dense, maxHamming = 3)
    assert(cl.filter(col("is_survivor")).count() === 3)
    // sparse corpora pass the default guard untouched
    assert(Multimodal.phashNearDup(
      Multimodal.perceptualHash(spark, base)).count() >= 0)
  }

  test("guards: maxHamming beyond pigeonhole bound rejected; non-images skipped") {
    intercept[IllegalArgumentException] {
      Multimodal.phashNearDup(base.limit(1)
        .select(col("media_id"), lit(0L).as("phash")), maxHamming = 4)
    }
    val mixed = Multimodal.syntheticMedia(docs.limit(30))
    val n = Multimodal.perceptualHash(spark, mixed).count()
    val nImages = mixed.filter(col("kind") === "image").count()
    assert(n === nImages)
  }
}
