package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.queries.Tables

/** Tests for the multimodal layer: the REAL pure-JVM codecs (PNG /
  * WAV / animated GIF round trips with exactly-known ground truth),
  * plus the Spark plumbing — schema, batch shape, partitioning
  * invariance, and the expanding frame-sample iterator. */
class MultimodalSpec extends SparkSpecBase {

  private lazy val media =
    Multimodal.syntheticMedia(Tables.documents(spark, sf)).cache()

  test("codec round trip: PNG dims + mean, WAV rate/frames/RMS, GIF frames — exact") {
    val png = Multimodal.encodePng(20, 12, 137)
    val (w, h, mean, hist) = Multimodal.decodeImage(png)
    assert((w, h) === (20, 12))
    assert(mean === 137.0)                      // solid gray decodes exactly
    assert(hist(137 * Multimodal.FeatureDim / 256) === 20L * 12)

    val wav = Multimodal.encodeWav(1024, 1250, 8000)
    val (sr, n, rms, _) = Multimodal.decodeAudio(wav)
    assert((sr, n) === (8000, 1024L))
    assert(rms === 1250.0)                      // |sample| ≡ amp → RMS exact

    val gif = Multimodal.encodeGif(8, 8, Array(10, 50, 90, 130))
    val frames = Multimodal.decodeVideoFrames(gif)
    assert(frames.map(_._1) === Seq(0, 1, 2, 3))
    assert(frames.map(_._4) === Seq(10.0, 50.0, 90.0, 130.0))
    assert(frames.forall(f => f._2 == 8 && f._3 == 8))
  }

  // deterministic ScalaCheck driver (scalatestplus isn't resolvable
  // offline — same idiom as AlgebraPropertiesSpec); codec properties
  // are pure JVM so the sample count can be generous
  private def forAllSeeded[A](gen: org.scalacheck.Gen[A], n: Int = 24)(
      body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(org.scalacheck.Gen.Parameters.default,
        org.scalacheck.rng.Seed(i.toLong)).foreach(body)
    }

  test("property: PNG round-trips arbitrary dims + gray exactly (incl. 1×1)") {
    import org.scalacheck.Gen
    val cases = for {
      w <- Gen.choose(1, 64); h <- Gen.choose(1, 64); g <- Gen.choose(0, 255)
    } yield (w, h, g)
    val edges = Seq((1, 1, 0), (1, 1, 255), (1, 64, 128), (64, 1, 7))
    (edges ++ Nil).foreach { case (w, h, g) => checkPng(w, h, g) }
    forAllSeeded(cases) { case (w, h, g) => checkPng(w, h, g) }
  }

  private def checkPng(w: Int, h: Int, gray: Int): Unit = {
    val (dw, dh, mean, hist) = Multimodal.decodeImage(Multimodal.encodePng(w, h, gray))
    assert((dw, dh, mean) === (w, h, gray.toDouble), s"png $w×$h gray=$gray")
    assert(hist(gray * Multimodal.FeatureDim / 256) === w.toLong * h)
  }

  test("property: WAV round-trips arbitrary length/amp/rate (incl. 0 samples)") {
    import org.scalacheck.Gen
    val cases = for {
      n <- Gen.choose(0, 4096); amp <- Gen.choose(0, 32767)
      sr <- Gen.oneOf(8000, 16000, 44100)
    } yield (n, amp, sr)
    val edges = Seq((0, 1000, 8000), (1, 32767, 44100), (16, 0, 16000))
    edges.foreach { case (n, amp, sr) => checkWav(n, amp, sr) }
    forAllSeeded(cases) { case (n, amp, sr) => checkWav(n, amp, sr) }
  }

  private def checkWav(n: Int, amp: Int, sr: Int): Unit = {
    val (dsr, dn, rms, _) = Multimodal.decodeAudio(Multimodal.encodeWav(n, amp, sr))
    assert((dsr, dn) === (sr, n.toLong), s"wav n=$n amp=$amp sr=$sr")
    assert(rms === (if (n == 0) 0.0 else amp.toDouble),
      s"square-wave RMS must equal amp exactly: n=$n amp=$amp")
  }

  test("property: GIF round-trips arbitrary dims + per-frame grays exactly") {
    import org.scalacheck.Gen
    val cases = for {
      w <- Gen.choose(1, 16); h <- Gen.choose(1, 16)
      grays <- Gen.listOfN(6, Gen.choose(0, 255)).flatMap(l =>
        Gen.choose(1, 6).map(l.take))
    } yield (w, h, grays)
    forAllSeeded(cases, n = 16) { case (w, h, grays) =>
      val frames = Multimodal.decodeVideoFrames(
        Multimodal.encodeGif(w, h, grays.toArray))
      assert(frames.map(_._4) === grays.map(_.toDouble), s"gif $w×$h $grays")
      assert(frames.forall(f => f._2 == w && f._3 == h))
    }
  }

  test("property: PNG→JPEG transcode bounds solid-gray drift at any dims") {
    import org.scalacheck.Gen
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    val cases = for {
      w <- Gen.choose(1, 64); h <- Gen.choose(1, 64); g <- Gen.choose(0, 255)
    } yield (w, h, g)
    forAllSeeded(cases, n = 16) { case (w, h, g) =>
      // same decode→RGB-normalize→re-encode path as transcodeImages
      val src = ImageIO.read(new ByteArrayInputStream(Multimodal.encodePng(w, h, g)))
      val rgb = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g2 = rgb.createGraphics()
      try g2.drawImage(src, 0, 0, null) finally g2.dispose()
      val bos = new ByteArrayOutputStream()
      ImageIO.write(rgb, "jpg", bos)
      val (dw, dh, mean, _) = Multimodal.decodeImage(bos.toByteArray)
      assert((dw, dh) === (w, h))
      assert(math.abs(mean - g) <= 2.0,
        s"JPEG drift over tolerance at $w×$h gray=$g: mean=$mean")
    }
  }

  test("synthetic media has real encoded bytes + typed metadata per kind") {
    val kinds = media.groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kinds.keySet === Set("image", "audio", "video"))
    assert(media.filter(col("kind") === "audio" && col("sample_rate") =!= 8000)
      .count() === 0)
    assert(media.schema("bytes").dataType.typeName === "binary")
    // payloads are genuine container formats: PNG magic / RIFF / GIF8
    val heads = media.select(col("kind"), substring(col("bytes"), 1, 4).as("m"))
      .distinct().collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(heads("image") === Seq[Byte](0x89.toByte, 'P', 'N', 'G'))
    assert(heads("audio") === "RIFF".getBytes.toSeq)
    assert(heads("video") === "GIF8".getBytes.toSeq)
  }

  test("extractFeatures decodes every payload back to its synthesis parameters") {
    val f1 = Multimodal.extractFeatures(spark, media, partitions = 4).collect()
    assert(f1.length === media.count())
    f1.foreach { f =>
      assert(f.feature.length === Multimodal.FeatureDim)
      assert(math.abs(f.feature.sum - 1.0f) < 1e-3f)   // L1-normalized
      val id = f.media_id
      f.kind match {
        case "image" =>
          assert(f.width_px === Multimodal.imageW(id))
          assert(f.height_px === Multimodal.imageH(id))
          assert(f.n_frames === 1)
          assert(f.mean_px === Multimodal.imageGray(id).toDouble)
        case "audio" =>
          assert(f.sample_rate_hz === Multimodal.AudioRate)
          assert(f.n_samples === Multimodal.audioSamples(id).toLong)
          assert(f.rms === Multimodal.audioAmp(id).toDouble)
        case "video" =>
          assert(f.n_frames === Multimodal.videoFrames(id))
          val grays = (0 until f.n_frames).map(Multimodal.videoGray(id, _))
          assert(f.mean_px === grays.sum.toDouble / grays.length)
      }
    }
    val f2 = Multimodal.extractFeatures(spark, media, partitions = 2).collect()
    assert(f1.map(f => f.media_id -> f.mean_px).toMap ===
      f2.map(f => f.media_id -> f.mean_px).toMap,
      "features must not depend on partitioning")
  }

  test("resizeImages re-encodes: new dims decode back, solid color survives scaling") {
    val out = Multimodal.resizeImages(spark, media, 32, 32)
    assert(out.filter(col("kind") === "image" && col("width") =!= 32).count() === 0)
    // non-image rows pass through untouched
    assert(out.filter(col("kind") === "audio").select("width").distinct().count() > 0)
    val one = out.filter(col("kind") === "image").limit(1).collect().head
    val (w, h, mean, _) = Multimodal.decodeImage(one.getAs[Array[Byte]]("bytes"))
    assert((w, h) === (32, 32))
    assert(mean === Multimodal.imageGray(one.getAs[Long]("media_id")).toDouble,
      "bilinear resize of a solid image keeps its color")
  }

  test("transcodeImages: PNG→JPEG keeps dims, bounds pixel drift; PNG→PNG exact") {
    val jpg = Multimodal.transcodeImages(spark,
      media.filter(col("kind") === "image"), "jpg").collect()
    jpg.foreach { r =>
      val bytes = r.getAs[Array[Byte]]("bytes")
      assert((bytes(0) & 0xFF) === 0xFF && (bytes(1) & 0xFF) === 0xD8,
        "payload is not JPEG (SOI marker missing)")
      val id = r.getAs[Long]("media_id")
      val (w, h, mean, _) = Multimodal.decodeImage(bytes)
      assert((w, h) === (Multimodal.imageW(id), Multimodal.imageH(id)))
      assert(math.abs(mean - Multimodal.imageGray(id)) <= 2.0,
        s"JPEG drift over tolerance: id=$id mean=$mean")
    }
    // a lossless target round-trips the pixels exactly
    val png = Multimodal.transcodeImages(spark,
      media.filter(col("kind") === "image").limit(5), "png").collect()
    png.foreach { r =>
      val (_, _, mean, _) = Multimodal.decodeImage(r.getAs[Array[Byte]]("bytes"))
      assert(mean === Multimodal.imageGray(r.getAs[Long]("media_id")).toDouble)
    }
  }

  test("decodeVideoFrames composites delta frames honoring offsets + disposal") {
    // 8×8 screen; solid gray patches (lum of gray g is exactly g):
    //   f0 full 100 (doNotDispose)                     → mean 100
    //   f1 4×4 200 @(0,0) (doNotDispose)               → (16·200+48·100)/64 = 125
    //   f2 4×4  40 @(4,4) (restoreToBackgroundColor)   → (16·40+16·200+32·100)/64 = 110
    //      → then its rect clears to transparent (lum 0)
    //   f3 2×2 255 @(0,0) (restoreToPrevious)          → (4·255+12·200+32·100+16·0)/64 = 103.4375
    //      → then the canvas rolls back to the pre-f3 state
    //   f4 1×1  10 @(7,7) (none) lands in the cleared  → (16·200+32·100+10)/64 = 100.15625
    //      rect — visible only if f2's clear AND f3's rollback both happened
    val gif = encodeDeltaGif(Seq(
      (8, 8, 100, 0, 0, "doNotDispose"),
      (4, 4, 200, 0, 0, "doNotDispose"),
      (4, 4, 40, 4, 4, "restoreToBackgroundColor"),
      (2, 2, 255, 0, 0, "restoreToPrevious"),
      (1, 1, 10, 7, 7, "none")))
    val frames = Multimodal.decodeVideoFrames(gif)
    assert(frames.map(_._1) === Seq(0, 1, 2, 3, 4))
    assert(frames.forall(f => f._2 == 8 && f._3 == 8),
      "delta frames must report the logical screen dims, not the patch's")
    assert(frames.map(_._4) === Seq(100.0, 125.0, 110.0, 103.4375, 100.15625))
  }

  /** Test-side encoder for delta GIFs: each frame is a solid-gray
    * patch placed at (left, top) with an explicit GIF89a disposal
    * method — the shapes [[Multimodal.decodeVideoFrames]]'s canvas
    * compositing must handle. (w, h, gray, left, top, disposal). */
  private def encodeDeltaGif(
      frames: Seq[(Int, Int, Int, Int, Int, String)]): Array[Byte] = {
    import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier}
    import javax.imageio.metadata.IIOMetadataNode
    import java.awt.image.BufferedImage
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { case (w, h, gray, left, top, disposal) =>
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        val g2 = img.createGraphics()
        g2.setColor(new java.awt.Color(gray, gray, gray))
        g2.fillRect(0, 0, w, h)
        g2.dispose()
        val md = writer.getDefaultImageMetadata(
          ImageTypeSpecifier.createFromRenderedImage(img),
          writer.getDefaultWriteParam)
        val fmt = md.getNativeMetadataFormatName
        val tree = md.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
        def node(tag: String): IIOMetadataNode = {
          val nl = tree.getElementsByTagName(tag)
          if (nl.getLength > 0) nl.item(0).asInstanceOf[IIOMetadataNode]
          else { val n = new IIOMetadataNode(tag); tree.appendChild(n); n }
        }
        val desc = node("ImageDescriptor")
        desc.setAttribute("imageLeftPosition", left.toString)
        desc.setAttribute("imageTopPosition", top.toString)
        val gce = node("GraphicControlExtension")
        gce.setAttribute("disposalMethod", disposal)
        gce.setAttribute("userInputFlag", "FALSE")
        gce.setAttribute("transparentColorFlag", "FALSE")
        gce.setAttribute("delayTime", "10")
        gce.setAttribute("transparentColorIndex", "0")
        md.setFromTree(fmt, tree)
        writer.writeToSequence(new IIOImage(img, null, md),
          writer.getDefaultWriteParam)
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  test("hostile payloads: checked nulls out per row, strict names the row, skip drops") {
    import spark.implicits._
    import Multimodal.MediaFile
    val png = Multimodal.encodePng(20, 12, 137)
    val wav = Multimodal.encodeWav(1024, 1250, 8000)
    val gif = Multimodal.encodeGif(8, 8, Array(10, 200))
    val rows = Seq(
      MediaFile(0L, "image", png, 20, 12, 0, 0),
      MediaFile(1L, "audio", wav, 0, 0, 8000, 128),
      MediaFile(2L, "video", gif, 8, 8, 0, 2000),
      // dead 5-byte headers in every modality + garbage that sniffs
      // as nothing at all
      MediaFile(10L, "image", png.take(5), 0, 0, 0, 0),
      MediaFile(11L, "audio", wav.take(5), 0, 0, 0, 0),
      MediaFile(12L, "video", gif.take(5), 0, 0, 0, 0),
      MediaFile(13L, "image", Array.fill[Byte](64)(0x5A), 0, 0, 0, 0))
    val df = rows.toDF()
    // keep-everything: one output row per input row, bad rows carry
    // the error with zeroed features, clean rows decode for real
    val checked = Multimodal.extractFeaturesChecked(spark, df).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(checked.size === rows.size)
    val badIds = Set(10L, 11L, 12L, 13L)
    badIds.foreach { id =>
      val r = checked(id)
      assert(!r.isNullAt(r.fieldIndex("error")), s"row $id should carry an error")
      assert(r.getInt(r.fieldIndex("width_px")) === 0 &&
        r.getDouble(r.fieldIndex("mean_px")) === 0.0, s"row $id features not zeroed")
      // zeroed but SHAPE-uniform: per-element ops downstream must
      // never see a dimension mismatch on bad rows
      assert(r.getSeq[Float](r.fieldIndex("feature")).length === Multimodal.FeatureDim,
        s"row $id feature vector not FeatureDim-length")
    }
    (rows.map(_.media_id).toSet -- badIds).foreach { id =>
      assert(checked(id).isNullAt(checked(id).fieldIndex("error")),
        s"clean row $id flagged bad")
    }
    assert(checked(0L).getInt(checked(0L).fieldIndex("width_px")) === 20)
    // strict: the task aborts and the failure names the record
    val e = intercept[Throwable] {
      Multimodal.extractFeatures(spark, df).collect()
    }
    val causes = Iterator.iterate(e)(_.getCause).takeWhile(_ != null).toSeq
    val mde = causes.collectFirst { case m: Multimodal.MediaDecodeException => m }
    assert(mde.isDefined, s"expected MediaDecodeException in: $causes")
    assert(badIds.contains(mde.get.mediaId))
    // skip: exactly the clean rows survive
    val skipped = Multimodal.extractFeatures(spark, df, onError = "skip")
      .collect().map(_.media_id).toSet
    assert(skipped === Set(0L, 1L, 2L))
    // the policy arg itself is validated
    intercept[IllegalArgumentException] {
      Multimodal.extractFeatures(spark, df, onError = "drop")
    }
  }

  test("hostile payloads: resize/transcode/sampleFrames fail loud or skip clean") {
    import spark.implicits._
    import Multimodal.MediaFile
    val png = Multimodal.encodePng(20, 12, 137)
    val gif = Multimodal.encodeGif(8, 8, Array(10, 200))
    val df = Seq(
      MediaFile(0L, "image", png, 20, 12, 0, 0),
      MediaFile(1L, "image", png.take(5), 0, 0, 0, 0),
      MediaFile(2L, "video", gif, 8, 8, 0, 2000),
      MediaFile(3L, "video", gif.take(5), 0, 0, 0, 0)).toDF()
    // skip: the corrupt image drops, the clean one transforms, the
    // non-image rows pass through untouched
    val resized = Multimodal.resizeImages(spark, df, 4, 4, onError = "skip")
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(resized === Set(0L, 2L, 3L))
    val transcoded = Multimodal.transcodeImages(spark, df, "jpg", onError = "skip")
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(transcoded === Set(0L, 2L, 3L))
    val frames = Multimodal.sampleFrames(spark, df, stride = 1, onError = "skip")
    assert(frames.select("media_id").distinct()
      .collect().map(_.getLong(0)).toSet === Set(2L))
    // strict: each aborts, naming the corrupt record
    Seq(
      () => Multimodal.resizeImages(spark, df, 4, 4).collect(),
      () => Multimodal.transcodeImages(spark, df, "jpg").collect(),
      () => Multimodal.sampleFrames(spark, df, stride = 1).collect()
    ).foreach { run =>
      val e = intercept[Throwable](run())
      val named = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .exists(_.isInstanceOf[Multimodal.MediaDecodeException])
      assert(named, s"expected MediaDecodeException, got: $e")
    }
  }

  test("sampleFrames decodes real GIF frames; stride subsamples") {
    val frames = Multimodal.sampleFrames(spark, media, stride = 1)
    val perVideo = frames.groupBy("media_id").count()
    val expect = media.filter(col("kind") === "video")
      .select(col("media_id"), (lit(2) + pmod(col("media_id"), lit(5))).as("exp"))
    assert(perVideo.join(expect, "media_id")
      .filter(col("count") =!= col("exp")).count() === 0)
    val strided = Multimodal.sampleFrames(spark, media, stride = 2)
    assert(strided.filter(pmod(col("frame_idx"), lit(2)) =!= 0).count() === 0)
    assert(strided.count() < frames.count())
  }
}
