package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** A GIF89a byte stream authored directly from the specification —
  * raw logical-screen descriptor, graphic-control extensions, image
  * descriptors and LZW-compressed data written byte by byte, with NO
  * javax.imageio writer involved. The synthetic fixtures
  * ([[Multimodal.encodeGif]] and MultimodalSpec's delta writer) are
  * produced by the same ImageIO stack that later reads them, so
  * producer quirks cancel out; this foreign stream pins the
  * compositing pipeline against what the format itself says:
  * non-zero frame offsets, background-color disposal with a NON-zero
  * background palette index (our documented deviation: cleared pixels
  * read as transparent/luminance 0 — the browser convention — not the
  * palette background color), restore-to-previous rollback, and an
  * independent fixed-width LZW encoder. Per-frame expected means are
  * closed-form from the frame geometry (gray index g has luminance
  * exactly g under the ITU-R 601 integer approximation). */
class GifFixtureSpec extends SparkSpecBase {

  private def u16(v: Int): Seq[Byte] =
    Seq((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)

  /** GIF-LZW with min code size 8, the fixed-width variant: a CLEAR
    * every 250 literals keeps the decoder's table under 512 entries,
    * so every code stays 9 bits (LSB-first bit packing). */
  private def lzw(pixels: Array[Int]): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var cur = 0L
    var nbits = 0
    def put(code: Int): Unit = {
      cur |= (code.toLong << nbits)
      nbits += 9
      while (nbits >= 8) { out += (cur & 0xFF).toByte; cur >>= 8; nbits -= 8 }
    }
    val Clear = 256
    val End = 257
    put(Clear)
    var i = 0
    while (i < pixels.length) {
      if (i > 0 && i % 250 == 0) put(Clear)
      put(pixels(i))
      i += 1
    }
    put(End)
    if (nbits > 0) out += (cur & 0xFF).toByte
    out.toArray
  }

  private case class Frame(left: Int, top: Int, w: Int, h: Int,
      gray: Int, disposal: Int) // 1=keep, 2=restoreToBackground, 3=restoreToPrevious

  /** Assemble the full GIF89a stream: header, logical screen with a
    * 256-gray global palette and background index `bg`, one
    * GCE + image descriptor + LZW data block per frame, trailer. */
  private def rawGif(screenW: Int, screenH: Int, bg: Int,
      frames: Seq[Frame]): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    out ++= "GIF89a".getBytes("US-ASCII")
    out ++= u16(screenW)
    out ++= u16(screenH)
    // global color table present, color resolution 8, 256 entries
    out += 0xF7.toByte
    out += bg.toByte      // background color index (non-zero on purpose)
    out += 0x00           // aspect ratio
    (0 until 256).foreach(g => out ++= Seq(g.toByte, g.toByte, g.toByte))
    frames.foreach { f =>
      // graphic control extension: disposal in bits 2-4, no transparency
      out ++= Seq(0x21.toByte, 0xF9.toByte, 0x04.toByte,
        ((f.disposal & 0x7) << 2).toByte)
      out ++= u16(10) // delay, centiseconds
      out += 0x00     // transparent color index (unused)
      out += 0x00     // block terminator
      // image descriptor: the offsets are the point of this fixture
      out += 0x2C.toByte
      out ++= u16(f.left)
      out ++= u16(f.top)
      out ++= u16(f.w)
      out ++= u16(f.h)
      out += 0x00     // no local color table, not interlaced
      out += 8.toByte // LZW min code size
      val data = lzw(Array.fill(f.w * f.h)(f.gray))
      data.grouped(255).foreach { chunk =>
        out += chunk.length.toByte
        out ++= chunk
      }
      out += 0x00     // data sub-block terminator
    }
    out += 0x3B.toByte
    out.toArray
  }

  // 10×8 logical screen, background palette index 200 (deliberately
  // non-zero: our decoder must still clear to transparent/0)
  private val screenPx = 10 * 8
  private val fixture = rawGif(10, 8, bg = 200, frames = Seq(
    Frame(0, 0, 10, 8, gray = 100, disposal = 1), // full screen, keep
    Frame(6, 4, 4, 2, gray = 250, disposal = 2),  // patch; then clear its rect
    Frame(0, 0, 2, 2, gray = 50, disposal = 1),   // corner patch, keep
    Frame(2, 5, 3, 2, gray = 250, disposal = 3),  // patch; then roll back
    Frame(9, 7, 1, 1, gray = 250, disposal = 1))) // proves the rollback

  // closed-form composited means over the 80-pixel screen:
  private val expectedMeans = Seq(
    100.0,                                        // full 100
    (72 * 100 + 8 * 250) / 80.0,                  // 115: patch over 100
    (68 * 100 + 4 * 50) / 80.0,                   // 87.5: f1's rect cleared to 0
    (62 * 100 + 4 * 50 + 6 * 250) / 80.0,         // 98.75: 6 px painted 250
    (67 * 100 + 4 * 50 + 1 * 250) / 80.0)         // 89.375: f3 rolled back, 1 px 250

  test("foreign GIF89a stream: offsets, bg disposal, rollback decode to exact means") {
    val frames = Multimodal.decodeVideoFrames(fixture)
    assert(frames.map(_._1) === Seq(0, 1, 2, 3, 4))
    // logical screen dims reported, not the sub-rect patch dims
    assert(frames.forall(f => f._2 == 10 && f._3 == 8),
      s"expected 10x8 logical screen for every frame: $frames")
    frames.zip(expectedMeans).foreach { case ((i, _, _, got), want) =>
      assert(math.abs(got - want) < 1e-9,
        s"frame $i mean: got $got, want $want")
    }
  }

  test("foreign GIF89a stream flows through the sampleFrames operator") {
    import spark.implicits._
    val df = Seq(Multimodal.MediaFile(42L, "video", fixture, 10, 8, 0, 500)).toDF()
    val got = Multimodal.sampleFrames(spark, df, stride = 1)
      .orderBy("frame_idx")
      .collect().map(r => (r.getInt(1), r.getDouble(4)))
    assert(got.map(_._1).toSeq === Seq(0, 1, 2, 3, 4))
    got.zip(expectedMeans).foreach { case ((i, m), want) =>
      assert(math.abs(m - want) < 5e-5, s"frame $i mean via operator: $m vs $want")
    }
  }
}
