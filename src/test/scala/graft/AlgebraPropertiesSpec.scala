package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.core.{AlignHow, ColUniverse, SparseRel}

/** ScalaCheck property tests for the algebra laws the reference
  * encodes as randomized pytest cases (SURVEY §5): permutation
  * invariance, add commutativity, join fast-path equivalence, one-hot
  * row sums. Small generator sizes — every case runs Spark jobs. */
class AlgebraPropertiesSpec extends AnyFunSuite {

  /** Deterministic forAll: draws `n` samples from the generator with
    * fixed seeds (scalatestplus isn't resolvable offline; raw
    * ScalaCheck generators drive the cases). */
  private def forAllSeeded[A](gen: Gen[A], n: Int = 8)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  private lazy val spark = SparkSpecBase.session

  private val cols = Seq("a", "b", "c")
  private val genCell: Gen[(Int, String, Double)] = for {
    k <- Gen.choose(0, 5)
    c <- Gen.oneOf(cols)
    v <- Gen.choose(-5, 5).map(_.toDouble)
  } yield (k, c, v)
  private val genCells = Gen.listOfN(8, genCell)

  private def rel(cells: Seq[(Int, String, Double)]): SparseRel = {
    import spark.implicits._
    SparseRel(cells.toDF("k", SparseRel.COL, SparseRel.VALUE),
      Seq("k"), ColUniverse.Explicit(cols))
  }

  private def densify(r: SparseRel): Map[(Int, String), Double] =
    r.df.groupBy("k", SparseRel.COL).agg(sum(SparseRel.VALUE).as("v"))
      .collect().map(x => (x.getInt(0), x.getString(1)) -> x.getDouble(2))
      .toMap.withDefaultValue(0.0)

  test("property: groupbySum is invariant under cell permutation") {
    forAllSeeded(genCells) { cells =>
      val base = densify(rel(cells).groupbySum())
      val perm = densify(rel(scala.util.Random.shuffle(cells)).groupbySum())
      assert(base === perm)
    }
  }

  test("property: add(outer) is commutative") {
    forAllSeeded(Gen.zip(genCells, genCells)) { case (ca, cb) =>
      val ab = densify(rel(ca).add(rel(cb), AlignHow.Outer))
      val ba = densify(rel(cb).add(rel(ca), AlignHow.Outer))
      assert(ab === ba)
    }
  }

  test("property: add(outer) equals cellwise sum of grouped frames") {
    forAllSeeded(Gen.zip(genCells, genCells)) { case (ca, cb) =>
      val got = densify(rel(ca).add(rel(cb), AlignHow.Outer))
      val a = densify(rel(ca).groupbySum())
      val b = densify(rel(cb).groupbySum())
      (a.keySet ++ b.keySet).foreach { k =>
        assert(got(k) === a(k) + b(k), s"at $k")
      }
    }
  }

  test("property: inner alignment on identical key sets equals outer") {
    forAllSeeded(genCells) { cells =>
      if (cells.nonEmpty) {
        val a = rel(cells)
        val b = rel(cells.map { case (k, c, v) => (k, c, v * 2) })
        val inner = densify(a.add(b, AlignHow.Inner))
        val outer = densify(a.add(b, AlignHow.Outer))
        assert(inner === outer)
      }
    }
  }

  test("property: renameCols through an injective map is a relabeling " +
      "(dense content preserved; identity is a no-op)") {
    forAllSeeded(genCells) { cells =>
      val a = rel(cells)
      val f = (c: String) => c + "_x" // injective on any label set
      val renamed = densify(a.renameCols(f))
      val base = densify(a)
      assert(renamed === base.map { case ((k, c), v) => (k, f(c)) -> v }
        .withDefaultValue(0.0))
      assert(densify(a.renameCols(identity)) === base)
    }
  }

  test("property: vstack content is the disjoint union — cellwise sums " +
      "add like add(outer)") {
    forAllSeeded(Gen.zip(genCells, genCells)) { case (ca, cb) =>
      // vstack keeps duplicate labels; summing per (key, col) after the
      // stack must therefore equal the aligned add of the two frames
      val stacked = densify(rel(ca).vstack(rel(cb)))
      val added = densify(rel(ca).add(rel(cb), AlignHow.Outer))
      assert(stacked === added)
    }
  }

  test("property: add key-set laws — Inner intersects, Left keeps a's " +
      "keys, Right keeps b's") {
    forAllSeeded(Gen.zip(genCells, genCells)) { case (ca, cb) =>
      val a = rel(ca); val b = rel(cb)
      def keys(r: SparseRel): Set[Int] =
        r.df.select("k").distinct().collect().map(_.getInt(0)).toSet
      val (ka, kb) = (keys(a), keys(b))
      assert(keys(a.add(b, AlignHow.Inner)) === (ka & kb))
      assert(keys(a.add(b, AlignHow.Left)) === ka)
      assert(keys(a.add(b, AlignHow.Right)) === kb)
      assert(keys(a.add(b, AlignHow.Outer)) === (ka ++ kb))
    }
  }

  test("property: csrSizeBytes matches the reference accounting model " +
      "recomputed driver-side") {
    forAllSeeded(genCells) { cells =>
      if (cells.nonEmpty) {
        val a = rel(cells)
        // sparse_frame.py:339-344 members over the COO content: data
        // <f8 + indices/indptr <i8 + index <i8 (int keys) + columns
        // <U{maxCodePoints} — the model the r20 code-point/NULL fixes
        // pinned
        val nCells = cells.size.toLong
        val nRows = cells.map(_._1).distinct.size.toLong
        val colW = cols.map(c => c.codePointCount(0, c.length)).max.toLong
        val expected = 8L * nCells * 2 + 8L * (nRows + 1) +
          8L * nRows + 4L * colW * cols.size
        assert(a.csrSizeBytes === expected)
      }
    }
  }

  test("property: sampleFraction is monotone — a larger fraction keeps a superset") {
    import spark.implicits._
    import graft.operators.Sampling
    forAllSeeded(Gen.zip(Gen.choose(0.1, 0.5), Gen.choose(0.5, 0.9))) {
      case (fLo, fHi) =>
        val ids = (1L to 300L).toDF("id")
        def kept(f: Double) = Sampling.sampleFraction(ids, "id", f)
          .collect().map(_.getLong(0)).toSet
        val lo = kept(fLo)
        val hi = kept(fHi)
        // same draw, higher threshold: membership can only grow
        assert(lo.subsetOf(hi), s"f=$fLo kept ${lo.size}, f=$fHi kept ${hi.size}")
        assert(hi.size >= lo.size)
    }
  }

  test("property: one-hot rows each sum to exactly 1") {
    import spark.implicits._
    forAllSeeded(Gen.listOfN(8, Gen.zip(Gen.choose(0L, 100L), Gen.oneOf(cols)))) { rows =>
      if (rows.nonEmpty) {
        val df = rows.zipWithIndex
          .map { case ((u, c), i) => (i.toLong, u, c) }
          .toDF("rid", "u", "cat")
        val oh = SparseRel.oneHot(df, "cat", cols, Seq("rid"))
        val sums = oh.sumAxis1.collect().map(_.getDouble(1))
        assert(sums.length === rows.length && sums.forall(_ === 1.0))
      }
    }
  }

  // ---- fingerprint kernel properties (no Spark jobs: direct compute) ----

  private def rollOf(s: String, w: Int): Long =
    graft.functions.RollingMinHash64(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), w)
      .compute(org.apache.spark.unsafe.types.UTF8String.fromString(s))

  private def winnowOf(s: String, w: Int, g: Int): Array[Long] = {
    val arr = graft.functions.WinnowHashes(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), w, g)
      .compute(org.apache.spark.unsafe.types.UTF8String.fromString(s))
    arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
  }

  test("property: winnow minima are sorted-distinct, contain the rolling min, deterministic") {
    val genCase = Gen.zip(
      Gen.choose(0, 120).flatMap(n => Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString)),
      Gen.choose(2, 24), Gen.choose(1, 12))
    forAllSeeded(genCase, n = 40) { case (s, w, g) =>
      val sel = winnowOf(s, w, g)
      assert(sel.nonEmpty)
      assert(sel.toSeq === sel.toSeq.sorted.distinct, "sorted distinct")
      assert(sel.min === rollOf(s, w), "winnow min must equal the global min-sample")
      assert(winnowOf(s, w, g).toSeq === sel.toSeq, "deterministic")
      // selection bound: at most one selected hash per winnow window
      val nWindows = math.max(1, s.getBytes("UTF-8").length - w + 1)
      assert(sel.length <= math.max(1, nWindows - g + 1))
    }
  }

  test("property: sorted_jaccard is value- and null-identical to the generic expression") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{round => sqlRound, _}
    val genSet = Gen.choose(0, 20).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-50L, 50L)).map(_.distinct.sorted))
    def opt(r: org.apache.spark.sql.Row): Option[Double] =
      if (r.isNullAt(0)) None else Some(r.getDouble(0))
    forAllSeeded(Gen.zip(genSet, genSet), n = 20) { case (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
      val generic = opt(df.select(sqlRound(
          size(array_intersect(col("a"), col("b"))).cast("double") /
            size(array_union(col("a"), col("b"))).cast("double"), 6)).head())
      val native = opt(df.select(
          graft.functions.HashExprs.sortedJaccard(col("a"), col("b"))).head())
      assert(native === generic, s"a=$a b=$b")
    }
  }

  test("sorted_jaccard null-guards elements instead of reading undefined slots") {
    // the nullable-element TYPE must be accepted (file sources force
    // containsNull=true on parquet read — the persisted dedup index
    // path), but an ACTUAL null element must yield NULL, never an
    // undefined primitive read
    import org.apache.spark.sql.functions._
    val df = spark.range(1)
      .select(array(lit(1L), lit(null).cast("long")).as("a"),
        array(lit(1L), lit(2L)).as("b"), array(lit(2L)).as("c"),
        array(lit(1L)).as("d"))
    assert(df.schema("a").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].containsNull)
    val r = df.select(
      graft.functions.HashExprs.sortedJaccard(col("a"), col("b")).as("withNull"),
      graft.functions.HashExprs.sortedJaccard(col("b"), col("c")).as("noNull"),
      // the null sits in the UNVISITED tail here (the merge exhausts d
      // at the shared 1L) — which is where array_sort actually places
      // nulls, so the tail scan must catch it too
      graft.functions.HashExprs.sortedJaccard(col("a"), col("d")).as("tailNull"))
      .head()
    assert(r.isNullAt(0), "a null element read during the merge must poison the result")
    assert(r.getDouble(1) === 0.5, "nullable TYPE without null values computes normally")
    assert(r.isNullAt(2), "a null element in the unvisited tail must poison the result")
  }

  test("property: documents sharing a >= w+g-1-byte substring share a winnow hash") {
    val w = 16
    val g = 7
    val genCase = Gen.zip(
      Gen.listOfN(w + g + 10, Gen.alphaNumChar).map(_.mkString), // shared core
      Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, Gen.alphaChar).map(_.mkString)),
      Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, Gen.alphaChar).map(_.mkString)))
    forAllSeeded(genCase, n = 25) { case (core, pre, suf) =>
      val a = winnowOf(pre + core, w, g).toSet
      val b = winnowOf(core + suf, w, g).toSet
      assert((a & b).nonEmpty,
        s"no shared hash for core of ${core.length} bytes (pre=${pre.length}, suf=${suf.length})")
    }
  }
}
