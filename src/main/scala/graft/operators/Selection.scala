package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Budget-constrained corpus selection: keep the best rows (by a score
  * column, ties broken by id) until a cost budget fills — "take the
  * highest-quality documents up to N tokens", the curation step between
  * scoring and shard export in a training pipeline.
  *
  * The defined result is the PREFIX of the (score DESC, id ASC) ranking
  * whose running cost stays ≤ budget — exactly a cumulative-sum window
  * in SQL, which is what the oracle runs. The implementation refuses
  * the global window (one total sort of the corpus through a single
  * ordering — the anti-pattern `Sampling.shuffleOrder` also avoids)
  * and computes the same prefix in two passes:
  *
  *   1. bucket the score range uniformly (`width_bucket`, a map stage)
  *      and aggregate cost per bucket — one shuffle of `buckets` rows;
  *      walking that histogram on the driver locates the BOUNDARY
  *      bucket where the budget crosses (driver data: `buckets` longs).
  *   2. buckets above the boundary are kept wholesale (no sort at
  *      all); only the boundary bucket — expected corpus/`buckets`
  *      rows — pays an exact cumulative window for the residual
  *      budget.
  *
  * Equal scores always share a bucket (bucketing is by value), so the
  * boundary cut can never split a tie group across the keep/sort
  * line. At 100 TB the sorted fraction is ~1/buckets of the corpus;
  * raise `buckets` (or recurse on the boundary bucket) to shrink it —
  * the histogram pass is corpus-sized but sort-free either way.
  */
object Selection {

  /** Driver-side diagnostic of the last [[selectByBudget]] call:
    * (buckets, rows in the boundary bucket — the only rows that paid
    * the exact cumulative window — and total input rows). The scale
    * rehearsal reads it to pin the claim that the sorted fraction
    * stays ~1/buckets of the corpus at 10×; not part of any query
    * result. */
  private[graft] val lastDiag =
    new java.util.concurrent.atomic.AtomicReference[(Int, Long, Long)]((0, 0L, 0L))

  /** Rows of `scored` whose running `costCol` total — accumulated in
    * (`scoreCol` DESC, `idCol` ASC) order — stays within `budget`.
    * Output columns = input columns; null scores/costs are excluded
    * (they have no place in the ranking). Costs are integral (token
    * counts — a fractional cost column is truncated by the explicit
    * long cast, never a runtime ClassCastException) and must be
    * non-negative: a negative cost breaks the monotone running-cost
    * prefix the operator is defined by, so it is rejected up front. */
  def selectByBudget(scored: DataFrame, idCol: String, scoreCol: String,
      costCol: String, budget: Long, buckets: Int = 256): DataFrame = {
    require(budget >= 0L, "budget must be non-negative")
    require(buckets >= 1, "need at least one bucket")
    val in = scored.filter(col(scoreCol).isNotNull && col(costCol).isNotNull)
    val mm = in.agg(min(col(scoreCol)).cast("double").as("lo"),
      max(col(scoreCol)).cast("double").as("hi"),
      min(col(costCol).cast("long")).as("minCost")).head()
    if (mm.isNullAt(0)) return in // empty input
    require(mm.getLong(2) >= 0L,
      s"negative $costCol (${mm.getLong(2)}) breaks the running-cost prefix")
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    // width_bucket yields buckets+1 for v == hi; fold it into the top
    // bucket. A constant score column degenerates to one bucket — the
    // "boundary" sort then covers everything, which is just the exact
    // algorithm on a corpus that gave us no histogram to prune with.
    def bucketOf = if (hi == lo) lit(1)
      else least(lit(buckets),
        width_bucket(col(scoreCol).cast("double"), lit(lo), lit(hi), lit(buckets)))
    val hist = in.groupBy(bucketOf.cast("long").as("__b"))
      .agg(sum(col(costCol).cast("long")).as("__t"),
        count(lit(1)).as("__c"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // walk top-down: find the bucket where the running cost crosses
    var cum = 0L
    var boundary = -1L
    var aboveSum = 0L
    (buckets.toLong to 1L by -1L).foreach { b =>
      val t = hist.get(b).map(_._1).getOrElse(0L)
      if (boundary < 0 && cum + t > budget) { boundary = b; aboveSum = cum }
      cum += t
    }
    val totalRows = hist.valuesIterator.map(_._2).sum
    lastDiag.set((buckets,
      if (boundary < 0) 0L else hist.get(boundary).map(_._2).getOrElse(0L),
      totalRows))
    if (boundary < 0) return in // everything fits
    val above = in.filter(bucketOf > boundary)
    // exact residual prefix INSIDE the boundary bucket only: the
    // single-ordering window runs over ~1/buckets of the corpus
    val w = Window.orderBy(col(scoreCol).desc, col(idCol))
    val sel = in.filter(bucketOf === boundary)
      .withColumn("__cum", sum(col(costCol).cast("long")).over(w))
      .filter(col("__cum") <= budget - aboveSum)
      .drop("__cum")
    above.unionByName(sel)
  }
}
