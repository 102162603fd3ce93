package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.ZipFile

import org.apache.spark.sql.functions._

import graft.core.{ColUniverse, SparseRel}
import graft.sources.Npz

/** scipy-npz interchange (reference io.py:28-47): byte-level npy
  * member layout, CSR canonicalization, round-trip fidelity for
  * numeric and string indexes, unicode widths, all-zero-column
  * survival, and the single-index guard. */
class NpzSpec extends SparkSpecBase {

  import spark.implicits._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory("npzspec").toFile
    d.deleteOnExit()
    s"${d.getAbsolutePath}/$name"
  }

  private def rel(rows: Seq[(Long, String, Double)],
      universe: Seq[String]): SparseRel =
    SparseRel(rows.toDF("rid", "col", "value"), Seq("rid"),
      ColUniverse.Explicit(universe))

  test("npy members are spec-compliant and CSR is canonical") {
    val path = tmp("a.npz")
    // rows out of order, duplicate cell (summed), an explicit zero,
    // an all-zero universe column that must survive the round trip
    Npz.writeNpz(rel(Seq((7L, "b", 2.0), (3L, "a", 1.0), (7L, "a", 0.0),
      (7L, "b", 3.0)), Seq("a", "b", "zero")), path)
    val zf = new ZipFile(path)
    try {
      import scala.jdk.CollectionConverters._
      val names = zf.entries().asScala.map(_.getName).toSet
      assert(names === Set("data.npy", "indices.npy", "indptr.npy",
        "shape.npy", "frame_index.npy", "frame_columns.npy"))
      def bytes(n: String): Array[Byte] =
        zf.getInputStream(zf.getEntry(n)).readAllBytes()
      val d = bytes("data.npy")
      // v1.0 magic; header multiple of 64; dict advertises <f8
      assert(d(0) == 0x93.toByte && new String(d, 1, 5, "ASCII") == "NUMPY")
      val hlen = (d(8) & 0xFF) | ((d(9) & 0xFF) << 8)
      assert((10 + hlen) % 64 === 0)
      val header = new String(d, 10, hlen, "ASCII")
      assert(header.contains("'descr': '<f8'") &&
        header.contains("'fortran_order': False") &&
        header.contains("(3,)"))
      val payload = ByteBuffer.wrap(d, 10 + hlen, 24)
        .order(ByteOrder.LITTLE_ENDIAN)
      // row 3 first (sorted labels), then row 7 with indices sorted
      // and the duplicate (7,b) summed to 5.0, zero cell kept
      assert((1 to 3).map(_ => payload.getDouble) === Seq(1.0, 0.0, 5.0))
      val ip = bytes("indptr.npy")
      val iph = (ip(8) & 0xFF) | ((ip(9) & 0xFF) << 8)
      val ipb = ByteBuffer.wrap(ip, 10 + iph, 24).order(ByteOrder.LITTLE_ENDIAN)
      assert((1 to 3).map(_ => ipb.getLong) === Seq(0L, 1L, 3L))
      val sh = bytes("shape.npy")
      val shh = (sh(8) & 0xFF) | ((sh(9) & 0xFF) << 8)
      val shb = ByteBuffer.wrap(sh, 10 + shh, 16).order(ByteOrder.LITTLE_ENDIAN)
      assert((shb.getLong, shb.getLong) === ((2L, 3L)))
    } finally zf.close()
  }

  test("round trip: numeric index, zero column survives in universe") {
    val path = tmp("b.npz")
    val in = rel(Seq((7L, "b", 2.0), (3L, "a", 1.5), (5L, "b", -4.25)),
      Seq("a", "b", "zonly"))
    Npz.writeNpz(in, path)
    val out = Npz.readNpz(spark, path, indexCol = "rid")
    assert(out.columnUniverse === Seq("a", "b", "zonly"))
    assert(out.indexCols === Seq("rid"))
    val got = out.df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got === Set((7L, "b", 2.0), (3L, "a", 1.5), (5L, "b", -4.25)))
  }

  test("round trip: string index and unicode labels pad correctly") {
    val path = tmp("c.npz")
    val in = SparseRel(
      Seq(("rowé", "colü", 1.0), ("r", "c", 2.0), ("rowé", "c", 3.0))
        .toDF("rid", "col", "value"),
      Seq("rid"), ColUniverse.Explicit(Seq("c", "colü")))
    Npz.writeNpz(in, path)
    val out = Npz.readNpz(spark, path, indexCol = "rid")
    assert(out.columnUniverse === Seq("c", "colü"))
    val got = out.df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(got === Set(("rowé", "colü", 1.0), ("r", "c", 2.0),
      ("rowé", "c", 3.0)))
  }

  test("glob read unions partitions; sorted divisions validated") {
    val d = java.nio.file.Files.createTempDirectory("npzglob").toFile
    d.deleteOnExit()
    Npz.writeNpz(rel(Seq((1L, "a", 1.0), (2L, "b", 2.0)), Seq("a", "b")),
      s"$d/part0.npz")
    Npz.writeNpz(rel(Seq((5L, "a", 3.0), (9L, "b", 4.0)), Seq("a", "b")),
      s"$d/part1.npz")
    val got = Npz.readNpzGlob(spark, s"$d/part*.npz", indexCol = "rid",
        sorted = true)
    assert(got.columnUniverse === Seq("a", "b"))
    assert(got.df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2))).toSet ===
      Set((1L, "a", 1.0), (2L, "b", 2.0), (5L, "a", 3.0), (9L, "b", 4.0)))
    // overlapping ranges must fail the sorted contract like the dask
    // reference (divisions not strictly ascending across files)
    Npz.writeNpz(rel(Seq((3L, "a", 9.0)), Seq("a", "b")), s"$d/part2.npz")
    val e = intercept[IllegalArgumentException](
      Npz.readNpzGlob(spark, s"$d/part*.npz", indexCol = "rid", sorted = true))
    assert(e.getMessage.contains("Divisions are not sorted"))
    // unsorted read tolerates the overlap (no divisions claimed)
    assert(Npz.readNpzGlob(spark, s"$d/part*.npz", indexCol = "rid")
      .df.count() === 5)
    // LENIENT mode = the reference's starts-only validation
    // (_npz_read_divisions, dask/io.py:89-112): part starts are
    // 1, 5, 3 — 5 !< 3 fails even the starts-only check
    val e3 = intercept[IllegalArgumentException](
      Npz.readNpzGlob(spark, s"$d/part*.npz", indexCol = "rid",
        sorted = true, strictDivisions = false))
    assert(e3.getMessage.contains("Divisions are not sorted"))
    // part4 overlaps part1's range (starts inside it) but its START
    // ascends past part1's — the reference accepts this, strict rejects
    Npz.writeNpz(rel(Seq((6L, "a", 7.0), (11L, "b", 8.0)), Seq("a", "b")),
      s"$d/q0.npz")
    Npz.writeNpz(rel(Seq((8L, "a", 9.0), (20L, "b", 1.0)), Seq("a", "b")),
      s"$d/q1.npz")
    assert(Npz.readNpzGlob(spark, s"$d/q*.npz", indexCol = "rid",
      sorted = true, strictDivisions = false).df.count() === 4)
    val e4 = intercept[IllegalArgumentException](
      Npz.readNpzGlob(spark, s"$d/q*.npz", indexCol = "rid", sorted = true))
    assert(e4.getMessage.contains("Divisions are not sorted"))
    // universe mismatch is rejected regardless
    Npz.writeNpz(rel(Seq((99L, "z", 1.0)), Seq("z")), s"$d/part3.npz")
    val e2 = intercept[IllegalArgumentException](
      Npz.readNpzGlob(spark, s"$d/part*.npz", indexCol = "rid"))
    assert(e2.getMessage.contains("share one universe"))
  }

  test("npz stack write: disjoint ascending ranges, shared universe, " +
      "sorted glob round trip") {
    val d = java.nio.file.Files.createTempDirectory("npzstack").toFile
    d.deleteOnExit()
    val in = rel(Seq((1L, "a", 1.0), (4L, "b", 2.0), (9L, "a", 3.0),
      (12L, "b", 4.0), (20L, "a", 5.0)), Seq("a", "b", "zonly"))
    val paths = Npz.writeNpzStack(in, s"$d/stack", parts = 3)
    assert(paths.size === 3 && paths === paths.sorted)
    // the sorted glob read accepts the divisions and round-trips,
    // all-zero universe column included
    val out = Npz.readNpzGlob(spark, s"$d/stack/part-*.npz",
      indexCol = "rid", sorted = true)
    assert(out.columnUniverse === Seq("a", "b", "zonly"))
    assert(out.df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2))).toSet ===
      Set((1L, "a", 1.0), (4L, "b", 2.0), (9L, "a", 3.0),
        (12L, "b", 4.0), (20L, "a", 5.0)))
    // more parts than keys clamps to one archive per key
    val paths2 = Npz.writeNpzStack(in, s"$d/wide", parts = 99)
    assert(paths2.size === 5)
    assert(Npz.readNpzGlob(spark, s"$d/wide/part-*.npz", indexCol = "rid",
      sorted = true).df.count() === 5)
  }

  test("reference-written archives with PICKLED string index/columns " +
      "decode (|O members, pickle protocols 2/3/4/5)") {
    // golden fixtures generated by numpy 1.26 (`np.savez` of
    // dtype=object index/columns — the reference's io.py:28-30 path
    // for pandas string indexes), one per pickle protocol numpy has
    // shipped as default plus the current latest (5). CSR:
    // alice->(cat_a 1.5, cat_ü 2.0), bob->(cat_b -3.25),
    // carol->(cat_ü 4.0).
    Seq(2, 3, 4, 5).foreach { proto =>
      val out = Npz.readNpz(spark,
        s"src/test/resources/npz/str_obj_p$proto.npz", indexCol = "rid")
      assert(out.columnUniverse === Seq("cat_a", "cat_b", "cat_ü"),
        s"protocol $proto")
      val got = out.df.collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
      assert(got === Set(("alice", "cat_a", 1.5), ("alice", "cat_ü", 2.0),
        ("bob", "cat_b", -3.25), ("carol", "cat_ü", 4.0)),
        s"protocol $proto")
    }
  }

  test("reference-style archive decodes: float32 data, int32 CSR " +
      "indices, pickled string index/columns in one file") {
    // np.savez of the exact member dict the reference's to_npz builds
    // (io.py:28-32) from a FLOAT32 frame: scipy keeps the caller's
    // dtype (<f4 data) and uses int32 indices/indptr on small
    // matrices; the pandas string index pickles. Same CSR content as
    // the per-protocol fixtures above.
    val out = Npz.readNpz(spark,
      "src/test/resources/npz/reference_style.npz", indexCol = "rid")
    assert(out.columnUniverse === Seq("cat_a", "cat_b", "cat_ü"))
    val got = out.df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(got === Set(("alice", "cat_a", 1.5), ("alice", "cat_ü", 2.0),
      ("bob", "cat_b", -3.25), ("carol", "cat_ü", 4.0)))
  }

  test("guards: multi-index export rejected; missing member rejected") {
    val multi = SparseRel(Seq((1L, 2L, "a", 1.0)).toDF("i", "j", "col", "value"),
      Seq("i", "j"), ColUniverse.Explicit(Seq("a")))
    val e = intercept[IllegalArgumentException](
      Npz.writeNpz(multi, tmp("d.npz")))
    assert(e.getMessage.contains("single-index"))
    val bad = tmp("e.npz")
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(bad))
    zos.putNextEntry(new java.util.zip.ZipEntry("data.npy"))
    zos.write(Array[Byte](1, 2, 3))
    zos.closeEntry(); zos.close()
    val e2 = intercept[RuntimeException](Npz.readNpz(spark, bad))
    assert(e2.getMessage.contains("not an npy member") ||
      e2.getMessage.contains("missing"))
  }

  test("writeNpz cell cap fails loudly BEFORE the driver collect and " +
      "routes to the at-scale sinks") {
    // 3 summed cells against a cap of 2 — the guard must name the
    // count, the cap, and the partitioned-parquet/stack alternatives
    val in = rel(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0)),
      Seq("a", "b"))
    val e = intercept[IllegalArgumentException](
      Npz.writeNpz(in, tmp("cap.npz"), maxCells = 2L))
    assert(e.getMessage.contains("3 cells") &&
      e.getMessage.contains("cap 2") &&
      e.getMessage.contains("SparseIO.write") &&
      e.getMessage.contains("writeNpzStack"))
    // at the cap exactly, the write succeeds (cells are post-sum:
    // duplicate (row, col) entries collapse before the guard counts)
    val dup = rel(Seq((1L, "a", 1.0), (1L, "a", 4.0), (2L, "b", 2.0)),
      Seq("a", "b"))
    val p = tmp("atcap.npz")
    Npz.writeNpz(dup, p, maxCells = 2L)
    val back = Npz.readNpz(spark, p, indexCol = "rid").df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(back === Set((1L, "a", 5.0), (2L, "b", 2.0)))
  }

  test("writeNpzStack forwards its per-part cell cap (r19 advice: the " +
      "default cap's error routed users back to writeNpzStack itself)") {
    val d = java.nio.file.Files.createTempDirectory("npzcap").toFile
    d.deleteOnExit()
    val in = rel(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0),
      (4L, "b", 4.0)), Seq("a", "b"))
    // 2 parts x 2 cells against a per-part cap of 1 — must fail loudly
    val e = intercept[IllegalArgumentException](
      Npz.writeNpzStack(in, s"$d/tight", parts = 2, maxCellsPerPart = 1L))
    assert(e.getMessage.contains("cap 1"))
    // the escape hatches both work: a larger per-part cap, or more
    // parts shrinking each range under the same cap
    assert(Npz.writeNpzStack(in, s"$d/cap", parts = 2,
      maxCellsPerPart = 2L).size === 2)
    assert(Npz.writeNpzStack(in, s"$d/parts", parts = 4,
      maxCellsPerPart = 1L).size === 4)
  }

  test("npz stack boundaries survive supplementary-plane labels " +
      "(code-point order, where UTF-16 comparison disagrees)") {
    // U+10000 (surrogate pair D800 DC00) sorts BELOW U+E000/U+FFFD
    // under Scala's UTF-16 String.<, but ABOVE them in code-point
    // order — which is what Spark's min/max and range partitioning
    // use. A UTF-16-ordered writer would emit overlapping divisions
    // here; codePointOrdering exists so the stack's per-file ranges
    // agree with the Spark-side boundaries.
    val d = java.nio.file.Files.createTempDirectory("npzsupp").toFile
    d.deleteOnExit()
    val labels = Seq("a", "\uE000b", "\uFFFDc",
      "\uD800\uDC00d", "\uD800\uDC01e")
    val in = SparseRel(
      labels.zipWithIndex.map { case (l, i) => (l, "c", i + 1.0) }
        .toDF("rid", "col", "value"),
      Seq("rid"), ColUniverse.Explicit(Seq("c")))
    val paths = Npz.writeNpzStack(in, s"$d/stack", parts = 3)
    assert(paths.size >= 2, s"expected a multi-file stack, got $paths")
    // strict sorted divisions must validate, and the round trip is
    // lossless including the surrogate-pair labels
    val out = Npz.readNpzGlob(spark, s"$d/stack/part-*.npz",
      indexCol = "rid", sorted = true)
    val got = out.df.collect()
      .map(r => (r.getString(0), r.getDouble(2))).toSet
    assert(got === labels.zipWithIndex
      .map { case (l, i) => (l, i + 1.0) }.toSet)
  }
}
