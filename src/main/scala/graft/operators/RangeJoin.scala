package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: match left rows whose timestamp falls inside
  * right-side [start, end) intervals — the second operator family
  * Spark lacks a dedicated physical plan for (builder guide list).
  *
  * Naive theta joins (`ts >= start AND ts < end` with no equi key)
  * plan as a broadcast nested loop / cartesian — quadratic. The scale
  * shape here is interval bucketing (the 1-D analogue of the LSH band
  * join): both sides map to coarse time buckets — intervals explode
  * into every bucket they overlap, points into exactly one — the join
  * becomes a bucket-equi hash join, and the residual range predicate
  * filters within buckets. Cost is |intervals|·(span/bucket) extra
  * rows, so pick `bucketMs` near the typical interval length.
  */
object RangeJoin {

  /** Left rows (with `tsCol`) joined to every right interval
    * ([startCol, endCol), half-open) that contains them; inner join
    * semantics — unmatched left rows drop. Right columns are carried
    * alongside left ones. */
  def bucketed(left: DataFrame, right: DataFrame,
      tsCol: String, startCol: String, endCol: String,
      bucketMs: Long): DataFrame = {
    require(bucketMs > 0, "bucket width must be positive")
    // duplicate names would make the post-join range filter ambiguous
    // (and the output unusable by name) — callers rename first
    val shared = left.columns.intersect(right.columns)
    require(shared.isEmpty,
      s"left/right column names must be disjoint; shared: ${shared.mkString(",")}")
    // epochMicros, not unix_micros: the fixture's parquet annotation
    // (UTC-adjusted vs naive) must not decide whether this analyzes
    val b = lit(bucketMs * 1000L) // micros
    val pts = left.withColumn("__bucket",
      (graft.functions.Ts.epochMicros(col(tsCol)) / b).cast("long"))
    val ivs = right
      // empty/inverted intervals match nothing — and would otherwise
      // make sequence() count DOWN, exploding one dirty row into a
      // huge descending bucket array
      .filter(col(endCol) > col(startCol))
      .withColumn("__bucket",
        explode(sequence(
          (graft.functions.Ts.epochMicros(col(startCol)) / b).cast("long"),
          // end is exclusive: a bucket-aligned end does not claim the
          // next bucket
          ((graft.functions.Ts.epochMicros(col(endCol)) - 1) / b).cast("long"))))
    pts.join(ivs, Seq("__bucket"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bucket")
  }
}
