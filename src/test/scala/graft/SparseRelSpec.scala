package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{AlignHow, ColUniverse, SparseRel}

/** Dense-oracle tests for the core algebra, ported from the
  * reference's pytest suite (sparsity/test/test_sparse_frame.py):
  * every sparse result is densified and compared against a plain
  * Scala-collections computation of the same thing. */
class SparseRelSpec extends SparkSpecBase {

  import SparseRel.{COL, VALUE}

  /** Build a SparseRel from (key, col, value) triples. */
  private def rel(cells: Seq[(Int, String, Double)], universe: Seq[String]): SparseRel = {
    import spark.implicits._
    SparseRel(cells.toDF("k", COL, VALUE), Seq("k"), ColUniverse.Explicit(universe))
  }

  /** Densify to Map(key -> Map(col -> value)) with explicit zeros. */
  private def dense(r: SparseRel): Map[Int, Map[String, Double]] =
    r.toDense.collect().map { row =>
      row.getInt(0) -> r.columnUniverse.map(c =>
        c -> row.getDouble(row.fieldIndex(c))).toMap
    }.toMap

  private def identity5(offset: Int = 0, prefix: String = "c"): Seq[(Int, String, Double)] =
    (0 until 5).map(i => (i + offset, s"$prefix$i", 1.0))

  // --- groupby_sum (test_sparse_frame.py:50-66) ---

  test("groupbySum sums cells per (key, col) and is permutation invariant") {
    val cells = Seq((0, "a", 1.0), (1, "a", 2.0), (0, "a", 3.0), (0, "b", 1.0))
    val out = rel(cells, Seq("a", "b")).groupbySum()
    val shuffled = rel(scala.util.Random.shuffle(cells), Seq("a", "b")).groupbySum()
    val expect = Map(0 -> Map("a" -> 4.0, "b" -> 1.0), 1 -> Map("a" -> 2.0, "b" -> 0.0))
    assert(dense(out) === expect)
    assert(dense(shuffled) === expect)
  }

  test("groupbySumBy groups through an external key expression") {
    val r = rel((0 until 6).map(i => (i, "x", 1.0)), Seq("x"))
      .groupbySumBy(pmod(col("k"), lit(2)), "k")
    assert(dense(r) === Map(0 -> Map("x" -> 3.0), 1 -> Map("x" -> 3.0)))
  }

  // --- add alignment (test_sparse_frame.py:293-342) ---

  test("add outer: total, partial, and no index overlap all zero-fill") {
    val a = rel(identity5(), Seq("c0", "c1", "c2", "c3", "c4"))
    // partial overlap: keys 2..5, value 10 in c0
    val b = rel((2 to 5).map(i => (i, "c0", 10.0)), Seq("c0", "c1", "c2", "c3", "c4"))
    val out = dense(a.add(b, AlignHow.Outer))
    assert(out(0)("c0") === 1.0)        // only in a
    assert(out(2)("c0") === 10.0)       // both rows, different cols for a
    assert(out(2)("c2") === 1.0)
    assert(out(5)("c0") === 10.0)       // only in b
    assert(out.size === 6)
    // no overlap
    val c = rel(Seq((100, "c0", 7.0)), Seq("c0", "c1", "c2", "c3", "c4"))
    val out2 = dense(a.add(c, AlignHow.Outer))
    assert(out2.size === 6 && out2(100)("c0") === 7.0)
    // total overlap = cellwise sum
    val out3 = dense(a.add(a, AlignHow.Outer))
    assert(out3(3)("c3") === 2.0)
  }

  test("add inner/left/right restrict the key set") {
    val a = rel(identity5(), (0 until 5).map("c" + _))
    val b = rel((2 to 6).map(i => (i, "c1", 10.0)), (0 until 5).map("c" + _))
    assert(dense(a.add(b, AlignHow.Inner)).keySet === Set(2, 3, 4))
    assert(dense(a.add(b, AlignHow.Left)).keySet === Set(0, 1, 2, 3, 4))
    assert(dense(a.add(b, AlignHow.Right)).keySet === Set(2, 3, 4, 5, 6))
  }

  // --- join axis=1 (test_sparse_frame.py:81-100: pandas .join().fillna(0)) ---

  test("joinAxis1 aligns rows and zero-fills the missing side") {
    val a = rel(identity5(0, "a"), (0 until 5).map("a" + _))
    val b = rel(identity5(3, "b"), (0 until 5).map("b" + _))
    val outer = dense(a.joinAxis1(b, AlignHow.Outer))
    assert(outer.keySet === (0 to 7).toSet)
    assert(outer(0)("a0") === 1.0 && outer(0)("b0") === 0.0)
    assert(outer(7)("b4") === 1.0 && outer(7)("a0") === 0.0)
    assert(outer(3)("a3") === 1.0 && outer(3)("b0") === 1.0)
    val inner = dense(a.joinAxis1(b, AlignHow.Inner))
    assert(inner.keySet === Set(3, 4))
    assert(dense(a.joinAxis1(b, AlignHow.Left)).keySet === (0 to 4).toSet)
    assert(dense(a.joinAxis1(b, AlignHow.Right)).keySet === (3 to 7).toSet)
  }

  test("joinAxis1 refuses overlapping column universes") {
    val a = rel(identity5(), (0 until 5).map("c" + _))
    intercept[IllegalArgumentException](a.joinAxis1(a, AlignHow.Outer))
  }

  // --- vstack (test_sparse_frame.py:405-435) ---

  test("vstack concatenates rows, allows duplicate labels, checks universe") {
    val a = rel(Seq((0, "c0", 1.0)), Seq("c0"))
    val b = rel(Seq((0, "c0", 2.0)), Seq("c0"))
    // duplicate key 0 survives as two COO cells
    assert(a.vstack(b).df.count() === 2)
    val c = rel(Seq((0, "zz", 1.0)), Seq("zz"))
    intercept[IllegalArgumentException](a.vstack(c))
  }

  // --- one_hot (test_sparse_frame.py:345-370) ---

  test("oneHot: unseen category is an error; declared-unseen survives as zero column") {
    import spark.implicits._
    val df = Seq((1, "x"), (2, "y")).toDF("k", "cat")
    intercept[IllegalArgumentException](
      SparseRel.oneHot(df, "cat", Seq("x"), Seq("k")))
    val ok = SparseRel.oneHot(df, "cat", Seq("x", "y", "zz"), Seq("k"))
    assert(ok.columnUniverse === Seq("x", "y", "zz"))
    val out = dense(ok)
    assert(out(1)("x") === 1.0 && out(1)("zz") === 0.0)
  }

  test("oneHot: NULL category is rejected (three-valued-logic hole)") {
    import spark.implicits._
    val df = Seq((1, Some("x")), (2, None)).toDF("k", "cat")
    intercept[IllegalArgumentException](
      SparseRel.oneHot(df, "cat", Seq("x"), Seq("k")))
  }

  // --- projections / maintenance ---

  test("projectCols keeps requested columns in order, errors on unknown") {
    val a = rel(identity5(), (0 until 5).map("c" + _))
    val p = a.projectCols(Seq("c3", "c1"))
    assert(p.columnUniverse === Seq("c3", "c1"))
    assert(p.df.select(COL).distinct().collect().map(_.getString(0)).toSet === Set("c1", "c3"))
    intercept[IllegalArgumentException](a.projectCols(Seq("nope")))
  }

  test("takeColsAt selects universe positions in request order, " +
      "bounds-checks, collapses duplicates") {
    val a = rel(identity5(), (0 until 5).map("c" + _))
    val t = a.takeColsAt(Seq(3, 1))
    assert(t.columnUniverse === Seq("c3", "c1"))
    assert(t.df.select(COL).distinct().collect()
      .map(_.getString(0)).toSet === Set("c1", "c3"))
    // duplicate position collapses (documented deviation from the
    // reference's same-name scipy column duplication)
    assert(a.takeColsAt(Seq(2, 2)).columnUniverse === Seq("c2"))
    intercept[IllegalArgumentException](a.takeColsAt(Seq(5)))
    intercept[IllegalArgumentException](a.takeColsAt(Seq(-1)))
    intercept[IllegalArgumentException](a.takeColsAt(Seq.empty))
  }

  test("reprString shows a dense head plus the shape/nnz trailer " +
      "(reference __repr__ contract)") {
    val a = rel(identity5(), (0 until 5).map("c" + _))
    val r = a.reprString()
    assert(r.contains("5x5 SparseFrame"))
    assert(r.contains("with 5 stored elements"))
    assert(r.linesIterator.next().contains("c0"))
    // >50 columns: first/last 25 shown, like the reference
    val wide = rel(Seq((0, "c00", 1.0)),
      (0 until 60).map(i => f"c$i%02d"))
    val rw = wide.reprString()
    assert(rw.contains("1x60 SparseFrame") && rw.contains("c24") &&
      rw.contains("c35") && !rw.contains("c30 "))
  }

  test("renameCols maps stored labels and universe through a broadcast join") {
    val a = rel(identity5(), (0 until 5).map("c" + _)).renameCols("x_" + _)
    assert(a.columnUniverse === (0 until 5).map("x_c" + _))
    assert(a.df.filter(col(COL).startsWith("x_")).count() === 5)
  }

  test("assignScalar broadcasts one value per distinct key; refuses existing column") {
    val a = rel(Seq((0, "c0", 1.0), (0, "c1", 2.0), (1, "c0", 3.0)), Seq("c0", "c1"))
    val out = dense(a.assignScalar("bias", 9.0))
    assert(out(0)("bias") === 9.0 && out(1)("bias") === 9.0)
    intercept[IllegalArgumentException](a.assignScalar("c0", 1.0))
  }

  test("takeRows takes the first n keys of the sorted index") {
    val a = rel(Seq(7, 3, 9, 1, 5).map(i => (i, "c0", i.toDouble)), Seq("c0"))
    assert(dense(a.takeRows(2)).keySet === Set(1, 3))
  }

  test("dropDupIdx keeps the first row per dedup key by the order columns") {
    import spark.implicits._
    val cells = Seq((0, 10, "c0", 1.0), (0, 11, "c0", 2.0), (1, 12, "c0", 3.0))
    val r = SparseRel(cells.toDF("k", "ord", COL, VALUE), Seq("k", "ord"),
      ColUniverse.Explicit(Seq("c0")))
    val kept = r.dropDupIdx(Seq("k"), Seq("ord")).df
      .select("k", "ord").collect().map(x => (x.getInt(0), x.getInt(1))).toSet
    assert(kept === Set((0, 10), (1, 12)))
  }

  test("dropnaIndex removes NULL index labels") {
    import spark.implicits._
    val df = Seq((Some(1), "c0", 1.0), (None, "c0", 2.0))
      .toDF("k", COL, VALUE)
    val r = SparseRel(df, Seq("k"), ColUniverse.Explicit(Seq("c0")))
    assert(r.dropnaIndex().df.count() === 1)
  }

  // --- stats (reference sparse_frame.py:143-156, logical-zero semantics) ---

  test("statsAxis0 computes mean/std over logical rows including zeros") {
    // 3 logical rows; col "a" has cells (1, 2) on two rows, zero on the third
    val r = rel(Seq((0, "a", 1.0), (1, "a", 2.0), (2, "b", 5.0)), Seq("a", "b"))
    val s = r.statsAxis0.collect().map(x => x.getString(0) -> x).toMap
    val a = s("a")
    assert(a.getDouble(1) === 3.0)                    // sum
    assert(a.getDouble(2) === 1.0)                    // mean over 3 rows
    val expectStd = math.sqrt((1.0 + 4.0) / 3.0 - 1.0)
    assert(math.abs(a.getDouble(3) - expectStd) < 1e-12)
    assert(a.getDouble(4) === 2.0)                    // max
    assert(a.getDouble(5) === 0.0)                    // min includes implicit zero
    val b = s("b")
    assert(b.getDouble(5) === 0.0 && b.getDouble(4) === 5.0)
  }

  test("statsAxis0 reports declared-but-unseen columns as all-zero") {
    val r = rel(Seq((0, "a", 1.0)), Seq("a", "zz"))
    val s = r.statsAxis0.collect().map(x => x.getString(0) -> x).toMap
    assert(s.keySet === Set("a", "zz"))
    val zz = s("zz")
    (1 to 5).foreach(i => assert(zz.getDouble(i) === 0.0, s"stat $i"))
  }

  test("meanAxis0 divides by logical rows, not nnz") {
    val r = rel(Seq((0, "a", 3.0), (1, "b", 1.0)), Seq("a", "b"))
    val m = r.meanAxis0.collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(m("a") === 1.5)
  }

  test("statsAxis1 computes per-row stats over the universe width including zeros") {
    // universe has 3 columns; row 0 stores two cells, row 1 stores one
    val r = rel(Seq((0, "a", 1.0), (0, "b", 2.0), (1, "a", -3.0)), Seq("a", "b", "c"))
    val s = r.statsAxis1.collect().map(x => x.getInt(0) -> x).toMap
    val r0 = s(0)
    assert(r0.getDouble(1) === 3.0)                   // sum
    assert(r0.getDouble(2) === 1.0)                   // mean over 3 cols
    val expectStd = math.sqrt((1.0 + 4.0) / 3.0 - 1.0)
    assert(math.abs(r0.getDouble(3) - expectStd) < 1e-12)
    assert(r0.getDouble(4) === 2.0)                   // max
    assert(r0.getDouble(5) === 0.0)                   // min includes implicit zero
    val r1 = s(1)
    assert(r1.getDouble(4) === 0.0)                   // max includes implicit zero
    assert(r1.getDouble(5) === -3.0)
  }

  test("meanAxis1 divides by universe width, not nnz") {
    val r = rel(Seq((0, "a", 3.0)), Seq("a", "b"))
    val m = r.meanAxis1.collect().map(x => x.getInt(0) -> x.getDouble(1)).toMap
    assert(m(0) === 1.5)
  }

  test("takeRowsAt selects arbitrary positions of the sorted index; slice is half-open") {
    val a = rel(Seq(7, 3, 9, 1, 5).map(i => (i, "c0", i.toDouble)), Seq("c0"))
    // sorted index: 1,3,5,7,9 — positions 0,2,4 → keys 1,5,9
    assert(dense(a.takeRowsAt(Seq(0L, 2L, 4L))).keySet === Set(1, 5, 9))
    // out-of-range positions select nothing (like iloc beyond length)
    assert(dense(a.takeRowsAt(Seq(99L))).keySet === Set.empty[Int])
    assert(dense(a.takeRowsSlice(1L, 4L)).keySet === Set(3, 5, 7))
  }

  // --- empty frames (sparse_frame.py:57,93-97) ---

  test("empty frames survive add/join/vstack with schema intact") {
    val a = rel(identity5(), (0 until 5).map("c" + _))
    val empty = a.filterRows(lit(false))
    assert(dense(a.add(empty, AlignHow.Outer)) === dense(a))
    assert(a.vstack(empty).df.count() === 5)
    assert(empty.df.columns.toSeq === Seq("k", COL, VALUE))
    assert(a.add(empty, AlignHow.Inner).df.count() === 0)
  }

  // --- fromDense melt ---

  test("fromDense melts wide numeric columns and drops exact zeros") {
    import spark.implicits._
    val wide = Seq((1, 2.0, 0.0), (2, 0.0, 3.0)).toDF("k", "x", "y")
    val r = SparseRel.fromDense(wide, Seq("k"), Seq("x", "y"))
    val cells = r.df.collect().map(x => (x.getInt(0), x.getString(1), x.getDouble(2))).toSet
    assert(cells === Set((1, "x", 2.0), (2, "y", 3.0)))
    assert(dense(r)(1)("y") === 0.0)
  }

  test("fromDense rejects non-numeric value columns like the reference") {
    import spark.implicits._
    val wide = Seq((1, "oops")).toDF("k", "s")
    intercept[IllegalArgumentException](
      SparseRel.fromDense(wide, Seq("k"), Seq("s")))
  }

  test("shape and nnz report logical dimensions") {
    val a = rel(Seq((0, "c0", 1.0), (0, "c1", 0.0), (3, "c0", 2.0)),
      Seq("c0", "c1", "c2"))
    assert(a.shape === (2L, 3))
    assert(a.nnz === 2L)
  }

  // --- universe plumbing for deferred lexicons ---

  test("transformCells applies user transforms, guards the COO schema") {
    val a = rel(identity5(), (0 until 5).map("c" + _))
    val doubled = a.transformCells(_.withColumn(VALUE, col(VALUE) * 2))
    assert(dense(doubled)(3)("c3") === 2.0)
    intercept[IllegalArgumentException](
      a.transformCells(_.drop(VALUE)))
  }

  test("locKey selects one label; filterRows applies arbitrary predicates") {
    val a = rel(identity5(), (0 until 5).map("c" + _))
    assert(a.locKey("k", lit(3)).df.count() === 1)
    assert(a.filterRows(col("k") % 2 === 0).df.count() === 3)
  }

  test("assignFrom appends a column from a relation") {
    import spark.implicits._
    val a = rel(Seq((0, "c0", 1.0), (1, "c0", 2.0)), Seq("c0"))
    val vals = Seq((0, 10.0), (1, 20.0)).toDF("k", VALUE)
    val out = dense(a.assignFrom("extra", vals))
    assert(out(0)("extra") === 10.0 && out(1)("extra") === 20.0)
    assert(a.assignFrom("extra", vals).columnUniverse === Seq("c0", "extra"))
  }

  test("concat folds joinAxis1 on axis 1 and vstack on axis 0") {
    val a = rel(identity5(0, "a"), (0 until 5).map("a" + _))
    val b = rel(identity5(0, "b"), (0 until 5).map("b" + _))
    val c = rel(identity5(0, "c"), (0 until 5).map("c" + _))
    val wide = SparseRel.concat(Seq(a, b, c), axis = 1)
    assert(wide.columnUniverse.size === 15)
    val aa = rel(identity5(), (0 until 5).map("c" + _))
    val tall = SparseRel.concat(Seq(aa, aa), axis = 0)
    assert(tall.df.count() === 10)
  }

  test("renameColsExpr preserves Explicit universe order (no lexicographic resort)") {
    // pre-rename order (b, a) must survive: a Deferred conversion would
    // materialize sorted and flip toDense column order
    val r = rel(Seq((0, "b", 1.0), (0, "a", 2.0)), Seq("b", "a"))
    val renamed = r.renameColsExpr(c => concat(lit("x_"), c))
    assert(renamed.universe.isInstanceOf[ColUniverse.Explicit])
    assert(renamed.columnUniverse === Seq("x_b", "x_a"))
  }

  test("renameColsExpr renames distributed (deferred universe stays deferred)") {
    val r = SparseRel.scanEvents(
        graft.queries.Tables.events(spark, sf), "event_type", Seq("user_id"), None)
      .renameColsExpr(c => concat(lit("x_"), c))
    assert(r.universe.isInstanceOf[graft.core.ColUniverse.Deferred])
    assert(r.df.filter(!col(COL).startsWith("x_")).count() === 0)
    assert(r.columnUniverse ===
      Seq("x_click", "x_error", "x_purchase", "x_signup", "x_view"))
  }

  test("renameColsExpr keeps Deferred assign-appended labels LAST") {
    // an appended label must survive rename in the appended slot:
    // folding it into the scanned dims relation would re-sort it into
    // the middle of the lexicon on materialization (silent toDense
    // column reorder — the hazard the appended slot exists to prevent)
    val r = SparseRel.scanEvents(
        graft.queries.Tables.events(spark, sf), "event_type", Seq("user_id"), None)
      .assignScalar("bias", 1.0)
      .renameColsExpr(c => concat(lit("x_"), c))
    assert(r.universe.isInstanceOf[ColUniverse.Deferred])
    assert(r.columnUniverse ===
      Seq("x_click", "x_error", "x_purchase", "x_signup", "x_view", "x_bias"))
    // the stored cells renamed too, and the dims relation carries both
    assert(r.df.filter(!col(COL).startsWith("x_")).count() === 0)
    assert(r.universe.dims(spark).count() === 6)
  }

  test("renameColsExpr dedups a renamed appended label that collides with base") {
    // a Deferred dims relation is a SET: when a rename maps an
    // appended label onto an existing base label, the label must
    // appear once (in its sorted base position), not twice
    val r = SparseRel.scanEvents(
        graft.queries.Tables.events(spark, sf), "event_type", Seq("user_id"), None)
      .assignScalar("bias", 1.0)
      .renameColsExpr(c => when(c === "bias", lit("click")).otherwise(c))
    assert(r.universe.isInstanceOf[ColUniverse.Deferred])
    assert(r.columnUniverse ===
      Seq("click", "error", "purchase", "signup", "view"))
    assert(r.universe.dims(spark).count() === 5)
  }

  test("joinAxis1 with deferred universes combines dims distributed") {
    val ev = graft.queries.Tables.events(spark, sf)
    val a = SparseRel.scanEvents(ev, "event_type", Seq("user_id"), None)
      .renameColsExpr(c => concat(lit("a_"), c))
    val b = SparseRel.scanEvents(ev, "event_type", Seq("user_id"), None)
      .renameColsExpr(c => concat(lit("b_"), c))
    val j = a.joinAxis1(b, AlignHow.Outer)
    assert(j.columnUniverse.size === 10)
    assert(j.df.count() === a.df.count() + b.df.count())
  }

  test("csrSizeBytes reproduces the reference __sizeof__ accounting; " +
      "estimatedCooBytes is the zero-job planner estimate") {
    // 3 stored cells, 2 rows (int index), universe width 2 over 3
    // labels: data 8*3 + indices 8*3 + indptr 8*(2+1) = 72, index
    // 8*2 = 16, columns 4*2*3 = 24 → 112 (sparse_frame.py:339-344's
    // members, numpy dtypes <f8/<i8/<U2)
    val r = rel(Seq((1, "aa", 1.0), (1, "b", 2.0), (2, "aa", 3.0)),
      Seq("aa", "b", "zz"))
    assert(r.csrSizeBytes === 112L)
    assert(r.estimatedCooBytes > 0)
    // Deferred universe: the column stats come from one dims
    // aggregation — the lexicon itself must NOT land on the driver
    val d = SparseRel.scanEvents(
      graft.queries.Tables.events(spark, sf), "event_type", Seq("user_id"), None)
    assert(d.csrSizeBytes > 0L)
    assert(!d.universe.asInstanceOf[ColUniverse.Deferred].materializedOnDriver,
      "csrSizeBytes must not materialize a Deferred lexicon")
  }

  test("scanEvents with no category list keeps a deferred universe (no collect)") {
    val r = SparseRel.scanEvents(
      graft.queries.Tables.events(spark, sf), "event_type", Seq("user_id"), None)
    // query path works without materializing the lexicon
    assert(r.groupbySum().df.count() > 0)
    // forcing the universe materializes sorted distinct labels
    assert(r.columnUniverse === Seq("click", "error", "purchase", "signup", "view"))
  }

  test("projectCols/assignScalar/assignFrom never collect a deferred universe") {
    val r = SparseRel.scanEvents(
      graft.queries.Tables.events(spark, sf), "event_type", Seq("user_id"), None)
    val d = r.universe.asInstanceOf[ColUniverse.Deferred]
    // projection: anti-join validation, Explicit result from the
    // (already driver-side) requested list
    val p = r.projectCols(Seq("click", "view"))
    assert(p.columnUniverse === Seq("click", "view"))
    intercept[IllegalArgumentException](r.projectCols(Seq("click", "nope")))
    // assignment: limit(1) membership probe, representation preserved
    val a = r.assignScalar("bias", 1.0)
    assert(a.universe.isInstanceOf[ColUniverse.Deferred])
    assert(a.df.filter(col(COL) === "bias").count() > 0)
    intercept[IllegalArgumentException](r.assignScalar("click", 1.0))
    val vals = r.df.select(col("user_id")).distinct().limit(5)
      .withColumn(VALUE, lit(2.0))
    val f = r.assignFrom("score", vals)
    assert(f.universe.isInstanceOf[ColUniverse.Deferred])
    assert(f.df.filter(col(COL) === "score").count() === 5)
    intercept[IllegalArgumentException](r.assignFrom("view", vals))
    // the proof: none of the above forced the lexicon onto the driver
    assert(!d.materializedOnDriver, "deferred universe was collected")
    // appended labels materialize LAST (pandas assign semantics, same
    // as the Explicit path) — not lexicographically resorted into the
    // middle, which would silently reorder toDense columns
    assert(a.columnUniverse ===
      Seq("click", "error", "purchase", "signup", "view", "bias"))
    assert(f.columnUniverse ===
      Seq("click", "error", "purchase", "signup", "view", "score"))
    // a second append stays ordered and the dims relation carries both
    val a2 = a.assignScalar("bias2", 2.0)
    assert(a2.columnUniverse.takeRight(2) === Seq("bias", "bias2"))
    assert(a2.universe.dims(spark).count() === 7)
  }

  // --- reference constructor edge paths (sparse_frame.py:48-97) ---

  test("empty input constructs an empty frame with the declared " +
      "universe intact (sparse_frame.py:93-97, test_repr's empty case)") {
    import spark.implicits._
    // SparseFrame(np.array([]), index=[], columns=['A','B']): zero
    // rows, the declared columns survive, shape/nnz/repr all work
    val wide = Seq.empty[(Int, Double, Double)].toDF("k", "A", "B")
    val r = SparseRel.fromDense(wide, Seq("k"), Seq("A", "B"))
    assert(r.shape === (0L, 2))
    assert(r.nnz === 0L)
    assert(r.columnUniverse === Seq("A", "B"))
    val repr = r.reprString()
    assert(repr.contains("0x2") && repr.contains("0 stored"))
    // and an all-zero (but non-empty-index) input also stores nothing:
    // exact zeros are representationally absent, like csr of zeros
    val zeros = Seq((1, 0.0, 0.0), (2, 0.0, 0.0)).toDF("k", "A", "B")
    val z = SparseRel.fromDense(zeros, Seq("k"), Seq("A", "B"))
    assert(z.nnz === 0L && z.columnUniverse === Seq("A", "B"))
  }

  test("1-D input becomes a single-column frame " +
      "(sparse_frame.py:51-55; test_init_with_pandas's Series case)") {
    import spark.implicits._
    // pd.Series(np.ones(10)) -> shape (10, 1), dense == ones column
    val series = (0 until 10).map(i => (i, 1.0)).toDF("k", "0")
    val r = SparseRel.fromDense(series, Seq("k"), Seq("0"))
    assert(r.shape === (10L, 1))
    assert(dense(r).values.toSeq === Seq.fill(10)(Map("0" -> 1.0)))
  }

  test(">2-D input is rejected (sparse_frame.py:48-49 'Only two " +
      "dimensional data supported')") {
    import spark.implicits._
    // the relational analog of a 3-D ndarray: a nested array column —
    // fromDense refuses it as non-numeric rather than silently
    // flattening or nulling it out
    val nested = Seq((1, Seq(1.0, 2.0)), (2, Seq(3.0, 4.0))).toDF("k", "m")
    val e = intercept[IllegalArgumentException](
      SparseRel.fromDense(nested, Seq("k"), Seq("m")))
    assert(e.getMessage.contains("non-numeric"))
  }

  test("groupbySumLevel groups on a MultiIndex subset; an unknown " +
      "level fails loud (sparse_frame.py:220-224's ValueError)") {
    import spark.implicits._
    val cells = Seq((1, 10, "a", 1.0), (1, 20, "a", 2.0), (2, 10, "b", 4.0))
      .toDF("k1", "k2", COL, VALUE)
    val r = SparseRel(cells, Seq("k1", "k2"),
      ColUniverse.Explicit(Seq("a", "b")))
    val g = r.groupbySumLevel(Seq("k1"))
    assert(g.indexCols === Seq("k1"))
    assert(g.df.collect().map(x =>
      (x.getInt(0), x.getString(1), x.getDouble(2))).toSet ===
      Set((1, "a", 3.0), (2, "b", 4.0)))
    // the reference raises "Cannot use level in a non MultiIndex
    // Frame" when the requested level does not exist; here any level
    // not among the index columns hits the same loud guard
    val e = intercept[IllegalArgumentException](
      g.groupbySumLevel(Seq("k2")))
    assert(e.getMessage.contains("unknown index level"))
  }

  test("csrSizeBytes counts CODE POINTS for label widths and keeps " +
      "NULL-level index rows (r19 advice)") {
    import spark.implicits._
    // supplementary-plane label: 2 code points, 4 UTF-16 units —
    // numpy <U2, so columns cost 4*2 bytes, not 4*4
    val gothic = "𐍈𐍈" // 𐍈𐍈
    val s = rel(Seq((1, gothic, 1.0)), Seq(gothic))
    // data 8 + indices 8 + indptr 8*2 = 32, index 8*1, columns 4*2*1
    assert(s.csrSizeBytes === 48L)
    // a NULL index level still counts as a CSR row (bare countDistinct
    // would drop it): 2 cells, 2 rows
    val withNull: DataFrame = Seq((Option("x"), "aa", 1.0), (None, "aa", 2.0))
      .toDF("k", COL, VALUE)
    val n = SparseRel(withNull, Seq("k"), ColUniverse.Explicit(Seq("aa")))
    // data 16 + indices 16 + indptr 8*3 = 56, index 4*1*2 = 8
    // (width ignores the NULL label), columns 4*2*1 = 8 -> 72
    assert(n.csrSizeBytes === 72L)
  }
}
