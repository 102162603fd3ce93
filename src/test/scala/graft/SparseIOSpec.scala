package graft

import org.apache.spark.sql.functions._

import graft.core.{ColUniverse, SparseRel}
import graft.sources.SparseIO

/** Round-trip persistence tests, including the metadata edge cases the
  * hand-rolled JSON parser used to corrupt (labels with commas,
  * quotes, brackets, control chars). */
class SparseIOSpec extends SparkSpecBase {

  private def roundtrip(universe: Seq[String]): SparseRel = {
    import spark.implicits._
    val df = universe.zipWithIndex.map { case (c, i) => (i, c, 1.0) }
      .toDF("k", SparseRel.COL, SparseRel.VALUE)
    val rel = SparseRel(df, Seq("k"), ColUniverse.Explicit(universe))
    val path = s"target/test_io/${universe.hashCode.toHexString}"
    SparseIO.write(rel, path, rangePartitions = 2)
    SparseIO.read(spark, path)
  }

  test("roundtrip preserves index cols, universe order, and cells") {
    val r = roundtrip(Seq("b", "a", "c"))
    assert(r.indexCols === Seq("k"))
    assert(r.columnUniverse === Seq("b", "a", "c"))
    assert(r.df.count() === 3)
  }

  test("roundtrip survives hostile labels: commas, quotes, brackets, unicode") {
    val hostile = Seq("""a,b""", """x"y""", "[c]", "back\\slash", "tab\there", "ünïcødé")
    assert(roundtrip(hostile).columnUniverse === hostile)
  }

  test("round-trip holds across parquet/orc/json/csv formats") {
    import spark.implicits._
    val df = Seq((1, "a", 1.5), (2, "b", -2.0), (3, "a", 0.25))
      .toDF("k", SparseRel.COL, SparseRel.VALUE)
    val rel = SparseRel(df, Seq("k"), ColUniverse.Explicit(Seq("a", "b")))
    Seq("parquet", "orc", "json", "csv").foreach { fmt =>
      val path = s"target/test_io/fmt_$fmt"
      SparseIO.write(rel, path, format = fmt)
      val back = SparseIO.read(spark, path)
      assert(back.columnUniverse === Seq("a", "b"), fmt)
      val cells = back.df.collect()
        .map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSet
      assert(cells === Set((1, "a", 1.5), (2, "b", -2.0), (3, "a", 0.25)), fmt)
    }
  }

  test("range-partitioned write prunes on locRange read") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (i, "c", i.toDouble))
      .toDF("k", SparseRel.COL, SparseRel.VALUE)
    val rel = SparseRel(df, Seq("k"), ColUniverse.Explicit(Seq("c")))
    SparseIO.write(rel, "target/test_io/range", rangePartitions = 8)
    val back = SparseIO.read(spark, "target/test_io/range")
    assert(back.locRange("k", lit(100), lit(199)).df.count() === 100)
  }
}
