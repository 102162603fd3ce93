package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{ColUniverse, SparseRel}

/** Native TrailDB v1 (`.tdb`) reader — the last reference surface gap
  * (`/root/reference/sparsity/io.py:10-24` `traildb_to_coo`,
  * `sparse_frame.py` `read_traildb`): the reference shells into the
  * traildb C library; this is a from-scratch Spark-native decoder of
  * the same public v1 file format, reverse-engineered against the
  * reference's own golden files (`test/tiny.tdb`: 3 trails / 9 events
  * with a recorded expected COO; `test/pydata.tdb`: 11 743 trails /
  * 109 626 events — both decode to exactly the info-header counts).
  *
  * == v1 format (as validated against the goldens) ==
  *
  * A `.tdb` is a ustar TAR with members:
  *  - `version`: "1"
  *  - `info`: "num_trails num_events min_ts max_ts max_ts_delta\n"
  *  - `fields`: newline-separated field names; field 0 is implicit time
  *  - `lexicon.<name>`: uint32 count, uint32 file offsets
  *    (count+1, absolute), then the concatenated value strings
  *  - `uuids`: 16 bytes per trail
  *  - `trails.toc`: per-trail byte offsets into trails.data
  *    (numTrails+1 entries; uint32, or uint64 when sized so)
  *  - `trails.codebook`: 65536 packed 20-byte entries
  *    {uint64 symLo, uint64 symHi, uint32 bits} — a 128-bit Huffman
  *    "gram" symbol of one or two items; `bits`=0 marks a dead slot
  *  - `trails.data`: the bit-packed trails
  *
  * Trail encoding (bits are LSB-first within bytes): a 3-bit
  * trailing-pad count, then tokens until bitLen−pad. Token flag bit
  * 1 → Huffman: the next 16 bits (LSB-first) index the codebook,
  * consuming `bits` more; the symbol holds 1–2 items. Flag 0 →
  * literal: field id in bitsNeeded(numFields−1) bits, then the value
  * SHIFTED LEFT BY ONE in bitsNeeded(2·maxVal+1) bits (maxVal =
  * max_ts_delta for time, lexicon count otherwise).
  *
  * Items are the public tdb_item layout: 32-bit
  * `[field:7|ext:1|val:24]`, or with ext=1 the 64-bit
  * `[field_lo:7|1|field_hi:7|…|val: >>16]`. A field-0 item starts an
  * event (value = seconds delta from the previous event, or from
  * min_ts for the first); other items set that field's CURRENT value
  * — edge encoding, so values persist across the trail's later
  * events until changed. Value 0 is NULL; lexicon ids are 1-based.
  *
  * Scale shape: a `.tdb` is a single pre-Spark artifact, so this is
  * the MIGRATION path (decode once → parquet via [[TdbConvert]], then
  * query columnar), not a steady-state scan source. Decoding is still
  * distributed: metadata/lexicons/codebook parse on the driver
  * (bounded: ≤1.25 MB codebook + lexicons), the trail payload is
  * broadcast once, and trails decode in parallel partitions. */
object TrailDb {

  private def bitsNeeded(x: Long): Int =
    math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(x))

  // ---------------- tar + member parsing ----------------

  private[sources] def untar(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val out = Map.newBuilder[String, Array[Byte]]
    var off = 0
    while (off + 512 <= bytes.length) {
      val name = new String(bytes, off, 100, StandardCharsets.US_ASCII)
        .takeWhile(_ != '\u0000').trim
      if (name.isEmpty) { off = bytes.length }
      else {
        val sizeStr = new String(bytes, off + 124, 12, StandardCharsets.US_ASCII)
          .takeWhile(c => c != '\u0000' && c != ' ')
        val size = java.lang.Long.parseLong(sizeStr.trim, 8)
        val data = java.util.Arrays.copyOfRange(bytes, off + 512,
          off + 512 + size.toInt)
        out += name -> data
        off += 512 + ((size.toInt + 511) / 512) * 512
      }
    }
    out.result()
  }

  /** Driver-side parsed db. Arrays are immutable-by-convention. */
  private[graft] final case class Db(
      numTrails: Long, numEvents: Long, minTs: Long, maxTs: Long,
      maxDelta: Long, fields: IndexedSeq[String],
      lexicons: IndexedSeq[IndexedSeq[String]],
      uuids: Array[Byte], toc: Array[Long], data: Array[Byte],
      codebook: Array[Byte]) {
    def numFields: Int = fields.size + 1 // + implicit time field
    def uuidHex(t: Int): String =
      (0 until 16).map(i => f"${uuids(t * 16 + i) & 0xFF}%02x").mkString
  }

  private def parseLexicon(b: Array[Byte]): IndexedSeq[String] = {
    val buf = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    val count = buf.getInt(0)
    val offs = (0 to count).map(i => buf.getInt(4 + 4 * i))
    (0 until count).map { i =>
      new String(b, offs(i), offs(i + 1) - offs(i), StandardCharsets.UTF_8)
    }
  }

  private[graft] def open(path: String): Db = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val m = untar(bytes)
    def member(n: String): Array[Byte] =
      m.getOrElse(n, sys.error(s"tdb member $n missing in $path " +
        s"(have: ${m.keys.mkString(",")})"))
    val version = new String(member("version"), StandardCharsets.US_ASCII).trim
    require(version == "1", s"only TrailDB v1 supported, got version $version")
    val info = new String(member("info"), StandardCharsets.US_ASCII)
      .trim.split("\\s+").map(_.toLong)
    require(info.length >= 5, s"malformed info member")
    val fields = new String(member("fields"), StandardCharsets.UTF_8)
      .split("\n").map(_.trim).filter(_.nonEmpty).toIndexedSeq
    val lex = fields.map(f => parseLexicon(member(s"lexicon.$f")))
    val nTrails = info(0)
    val tocRaw = member("trails.toc")
    val n1 = (nTrails + 1).toInt
    val toc: Array[Long] =
      if (tocRaw.length == n1 * 8) {
        val buf = ByteBuffer.wrap(tocRaw).order(ByteOrder.LITTLE_ENDIAN)
        Array.tabulate(n1)(i => buf.getLong(i * 8))
      } else {
        require(tocRaw.length == n1 * 4,
          s"trails.toc size ${tocRaw.length} matches neither 4 nor 8 bytes x ${n1}")
        val buf = ByteBuffer.wrap(tocRaw).order(ByteOrder.LITTLE_ENDIAN)
        Array.tabulate(n1)(i => buf.getInt(i * 4).toLong & 0xFFFFFFFFL)
      }
    val codebook = member("trails.codebook")
    require(codebook.length == 65536 * 20,
      s"codebook size ${codebook.length} != 65536 x 20")
    Db(nTrails, info(1), info(2), info(3), info(4), fields, lex,
      member("uuids"), toc, member("trails.data"), codebook)
  }

  // ---------------- trail decoding ----------------

  /** One decoded event: timestamp + current value id per non-time
    * field (0 = NULL, else 1-based lexicon id). */
  private[graft] final case class Ev(ts: Long, vals: Array[Int])

  private def itemField(it: Long): Int =
    if ((it & 128L) != 0L) ((it & 127L) | (((it >> 8) & 127L) << 7)).toInt
    else (it & 127L).toInt

  private def itemVal(it: Long): Long =
    if ((it & 128L) != 0L) it >>> 16 else it >>> 8

  /** Decode the trail at index `t`. Pure function of the db blobs so
    * it can run inside executors against broadcast state. */
  private[graft] def decodeTrail(db: Db, t: Int): IndexedSeq[Ev] = {
    val start = db.toc(t)
    val end0 = db.toc(t + 1)
    if (start == end0) return IndexedSeq.empty
    val data = db.data
    def bit(absBit: Long): Int = {
      val idx = start + (absBit >> 3)
      if (idx >= data.length) 0
      else (data(idx.toInt) >> (absBit & 7).toInt) & 1
    }
    def rd(off: Long, n: Int): Long = {
      var v = 0L; var k = 0
      while (k < n) { v |= bit(off + k).toLong << k; k += 1 }
      v
    }
    val totalBits = (end0 - start) * 8
    val pad = rd(0, 3)
    val endBit = totalBits - pad
    val fidBits = bitsNeeded((db.numFields - 1).toLong)
    val litBits: Array[Int] = Array.tabulate(db.numFields) { f =>
      val mx = if (f == 0) db.maxDelta else db.lexicons(f - 1).size.toLong
      bitsNeeded(mx * 2 + 1)
    }
    val cb = ByteBuffer.wrap(db.codebook).order(ByteOrder.LITTLE_ENDIAN)
    val nv = db.numFields - 1
    val cur = new Array[Int](nv)
    var ts = db.minTs
    var started = false
    val out = IndexedSeq.newBuilder[Ev]
    def emit(): Unit = if (started) out += Ev(ts, cur.clone())
    def onItem(field: Int, value: Long): Unit =
      if (field == 0) {
        emit()
        ts = (if (started) ts else db.minTs) + value
        started = true
      } else {
        require(field < db.numFields, s"field $field out of range in trail $t")
        cur(field - 1) = value.toInt
      }
    var off = 3L
    while (off < endBit) {
      if (bit(off) == 1) {
        val idx = rd(off + 1, 16).toInt
        val base = idx * 20
        val lo = cb.getLong(base)
        val hi = cb.getLong(base + 8)
        val nb = cb.getInt(base + 16)
        require(nb > 0, s"dead codebook slot $idx at bit $off of trail $t")
        off += 1 + nb
        onItem(itemField(lo), itemVal(lo))
        if (hi != 0L) onItem(itemField(hi), itemVal(hi))
      } else {
        val f = rd(off + 1, fidBits).toInt
        require(f < db.numFields, s"literal field $f out of range in trail $t")
        val raw = rd(off + 1 + fidBits, litBits(f))
        off += 1 + fidBits + litBits(f)
        onItem(f, raw >> 1)
      }
    }
    require(off == endBit,
      s"trail $t decode overran: bit $off vs end $endBit (pad $pad)")
    emit()
    out.result()
  }

  // ---------------- public surface ----------------

  /** Full event relation: one row per event with the edge-decoded
    * CURRENT value of every field (NULL where the trail never set
    * it) — the `tdb_cursor` view of the data. Columns:
    * (trail_id long, event_idx long — the event's position within
    * its trail, uuid string, timestamp long, <field>... string).
    * Decoding is distributed: trails partition across the cluster,
    * the payload rides one broadcast. */
  def events(spark: SparkSession, path: String): DataFrame =
    eventsOf(spark, open(path))

  private def eventsOf(spark: SparkSession, db: Db): DataFrame = {
    val bc = spark.sparkContext.broadcast(db)
    val nv = db.fields.size
    val schema = StructType(
      StructField("trail_id", LongType, nullable = false) +:
      StructField("event_idx", LongType, nullable = false) +:
      StructField("uuid", StringType, nullable = false) +:
      StructField("timestamp", LongType, nullable = false) +:
      db.fields.map(f => StructField(f, StringType, nullable = true)))
    val rows = spark.range(0, db.numTrails)
      .repartition(math.min(spark.sparkContext.defaultParallelism * 2,
        math.max(1, db.numTrails.toInt)))
      .rdd.mapPartitions { it =>
        val d = bc.value
        it.flatMap { tid =>
          val t = tid.toInt
          val uuid = d.uuidHex(t)
          decodeTrail(d, t).zipWithIndex.map { case (ev, i) =>
            val vals = (0 until nv).map { j =>
              val v = ev.vals(j)
              if (v == 0) null else d.lexicons(j)(v - 1)
            }
            Row.fromSeq(tid +: i.toLong +: uuid +: ev.ts +: vals)
          }
        }
      }
    spark.createDataFrame(rows, schema)
  }

  /** The reference's `traildb_to_coo` (io.py:10-24): one COO row per
    * event, one-hot on `fieldName` — (row_idx = global event index in
    * (trail, event) order, uuid, timestamp, col = the field's value
    * string, value = 1.0). Events where the field is NULL carry a
    * null col (the reference maps them to the empty string; keeping
    * null preserves the distinction for dropna). */
  def toCoo(spark: SparkSession, path: String, fieldName: String): DataFrame =
    toCooOf(spark, open(path), fieldName)

  private def toCooOf(spark: SparkSession, db: Db,
      fieldName: String): DataFrame = {
    val fi = db.fields.indexOf(fieldName)
    require(fi >= 0,
      s"field $fieldName not in ${db.fields.mkString(",")}")
    // global row index = events of trails 0..t-1 + the decoder's own
    // per-trail event_idx. The offsets are a DISTRIBUTED relation, not
    // a driver array (a 100 TB event log has 1e8-1e9 trails): per-trail
    // counts from one grouped pass, then the classic two-pass prefix
    // sum — range-partition the counts by trail_id, cumsum only the
    // P per-partition totals on the driver, and emit each trail's
    // running offset within its partition. The driver never holds more
    // than P longs; the join back to the events applies the offset as
    // plain Column arithmetic (Catalyst broadcasts the offsets side
    // when it is small, shuffles on trail_id when it is not — both
    // correct at their scale). The event relation is checkpointed: the
    // counts pass and the returned frame would otherwise each re-run
    // the full decode.
    val ev = eventsOf(spark, db)
      .select(col("trail_id"), col("event_idx"), col("uuid"),
        col("timestamp"), col(fieldName).as("col"))
      .localCheckpoint()
    val counts = ev.groupBy(col("trail_id")).count()
    val nParts = math.max(1, math.min(
      spark.sparkContext.defaultParallelism,
      math.max(1L, db.numTrails / 4096L).toInt))
    val ranged = counts.repartitionByRange(nParts, col("trail_id"))
      .sortWithinPartitions(col("trail_id"))
      .select(col("trail_id"), col("count"))
      .persist()
    val partTotals = ranged.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        Iterator.single(pid -> it.map(_.getLong(1)).sum)
      }.collect().toMap
    val base = new Array[Long](nParts + 1)
    (0 until nParts).foreach(p =>
      base(p + 1) = base(p) + partTotals.getOrElse(p, 0L))
    val baseBc = spark.sparkContext.broadcast(base)
    val offsetRows = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = baseBc.value(pid)
      it.map { r => val o = acc; acc += r.getLong(1); Row(r.getLong(0), o) }
    }
    // checkpoint the offsets so `ranged` can release its cache now —
    // the returned frame is lazy and must not recompute the prefix scan
    val offsets = spark.createDataFrame(offsetRows, StructType(Seq(
      StructField("trail_id", LongType, nullable = false),
      StructField("__trail_off", LongType, nullable = false))))
      .localCheckpoint()
    ranged.unpersist()
    ev.join(offsets, Seq("trail_id"))
      .withColumn("row_idx", col("__trail_off") + col("event_idx"))
      .select(col("row_idx"), col("uuid"), col("timestamp"), col("col"),
        lit(1.0).as("value"))
  }



  /** The reference's `SparseFrame.read_traildb(path, field)`: the COO
    * one-hot as a [[SparseRel]] over the global event index, universe
    * = the field's full lexicon (all-zero columns survive, like
    * one-hot with a declared category list). */
  def readTraildb(spark: SparkSession, path: String,
      fieldName: String): SparseRel = {
    val db = open(path)
    val fi = db.fields.indexOf(fieldName)
    require(fi >= 0, s"field $fieldName not in ${db.fields.mkString(",")}")
    val coo = toCooOf(spark, db, fieldName)
      .filter(col("col").isNotNull)
      .select(col("row_idx"), col("col"), col("value"))
    SparseRel(coo, Seq("row_idx"),
      ColUniverse.Explicit(db.lexicons(fi)))
  }

}

/** One-off migration converter: `.tdb` → events parquet.
  * `runMain graft.sources.TdbConvert <in.tdb> <outDir> [field]` —
  * writes the full event relation (and, with a field argument, the
  * one-hot COO next to it), after which every graft operator runs on
  * the columnar copy. */
object TdbConvert {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TdbConvert <in.tdb> <outDir> [field]")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = TrailDb.events(spark, args(0))
    ev.write.mode("overwrite").parquet(s"${args(1)}/events")
    println(s"[tdb] wrote ${spark.read.parquet(s"${args(1)}/events").count()} " +
      s"events to ${args(1)}/events")
    if (args.length > 2) {
      TrailDb.toCoo(spark, args(0), args(2))
        .write.mode("overwrite").parquet(s"${args(1)}/coo_${args(2)}")
      println(s"[tdb] wrote one-hot COO for field ${args(2)}")
    }
    spark.stop()
  }
}
