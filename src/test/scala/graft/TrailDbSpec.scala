package graft

import org.apache.spark.sql.functions._

import graft.sources.TrailDb

/** TrailDB v1 reader vs the reference's own golden files (the same
  * fixtures sparsity's test_coo.py asserts against). Skips cleanly
  * when the reference checkout isn't present. */
class TrailDbSpec extends SparkSpecBase {

  private val tiny = "/root/reference/sparsity/test/tiny.tdb"
  private val pydata = "/root/reference/sparsity/test/pydata.tdb"

  private def available(p: String): Boolean =
    java.nio.file.Files.isReadable(java.nio.file.Paths.get(p))

  test("tiny.tdb: events decode to the recorded corpus") {
    assume(available(tiny), s"$tiny not present")
    val ev = TrailDb.events(spark, tiny).collect()
      .sortBy(r => (r.getLong(0), r.getLong(1)))
    assert(ev.length === 9)
    // 3 trails x 3 events; username constant per trail, distinct
    // across trails; actions open -> save -> close per trail
    val byTrail = ev.groupBy(_.getLong(0))
    assert(byTrail.size === 3)
    val users = byTrail.map { case (_, rows) =>
      val us = rows.map(_.getAs[String]("username")).toSet
      assert(us.size === 1, s"username not constant: $us")
      assert(rows.sortBy(_.getLong(1)).map(_.getAs[String]("action")).toSeq
        === Seq("open", "save", "close"))
      us.head
    }.toSet
    assert(users === Set("user0", "user1", "user2"))
    // timestamps: recorded info bounds hit exactly (min 1451602800,
    // max 1456959600) — the decode's delta accumulation is pinned by
    // the file's own header
    val ts = ev.map(_.getAs[Long]("timestamp"))
    assert(ts.min === 1451602800L && ts.max === 1456959600L)
  }

  test("tiny.tdb: COO matches the reference's expected test_coo output") {
    assume(available(tiny), s"$tiny not present")
    // test_coo.py: r_idx == arange(9); c_idx groups 0,0,0/1,1,1/2,2,2
    // under first-seen column numbering — equivalently: row_idx dense
    // 0..8 in trail order, username constant within each 3-row block
    val coo = TrailDb.toCoo(spark, tiny, "username").collect()
      .sortBy(_.getAs[Long]("row_idx"))
    assert(coo.map(_.getAs[Long]("row_idx")).toSeq === (0L until 9L))
    val cols = coo.map(_.getAs[String]("col"))
    assert(cols.grouped(3).map(_.toSet.size).toSeq === Seq(1, 1, 1))
    assert(cols.toSet.size === 3)
    assert(coo.map(_.getAs[Double]("value")).forall(_ === 1.0))
    // uuids: 16-byte ids, one per trail
    assert(coo.map(_.getAs[String]("uuid")).toSet.size === 3)
    // read_traildb: SparseRel over the same COO with the full lexicon
    val rel = TrailDb.readTraildb(spark, tiny, "action")
    assert(rel.columnUniverse.toSet === Set("open", "save", "close"))
    assert(rel.df.count() === 9)
  }

  test("pydata.tdb: full-corpus decode matches the info header exactly") {
    assume(available(pydata), s"$pydata not present")
    val ev = TrailDb.events(spark, pydata).localCheckpoint()
    val st = ev.agg(count(lit(1)).as("n"),
      countDistinct(col("trail_id")).as("t"),
      min(col("timestamp")).as("mn"), max(col("timestamp")).as("mx")).head()
    // info: 11743 trails, 109626 events, ts in [1009669825, 1462131230]
    assert(st.getLong(0) === 109626L)
    assert(st.getLong(1) === 11743L)
    assert(st.getLong(2) >= 1009669825L)
    assert(st.getLong(3) <= 1462131230L)
    // field values resolve through the lexicons (no id out of range
    // survives decode — the decoder requires it), spot-check non-null
    val nn = ev.agg(
      sum(when(col("title").isNotNull, 1L).otherwise(0L)),
      sum(when(col("user").isNotNull, 1L).otherwise(0L))).head()
    // (user is NULL on anonymous edits — only ~82k of 109626 carry one)
    assert(nn.getLong(0) > 100000L && nn.getLong(1) > 50000L)
  }
}
