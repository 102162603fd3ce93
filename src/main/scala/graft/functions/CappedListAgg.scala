package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded per-group collect of long ids, capped at `cap` elements —
  * the SPILL-SAFE building block for "collect a group, but only if the
  * group is small enough to keep" plans (the winnow overlap bucket
  * fold): a plain `collect_list` buffers an unbounded group in ONE
  * aggregation row that cannot spill, so a ubiquitous key would OOM a
  * task at scale. This buffer never exceeds `cap` entries — once a
  * group reaches the cap it stops growing (and merges of full buffers
  * stay full), so a caller that drops groups of size > cap−1 gets the
  * EXACT member multiset for every kept group (truncation can only
  * happen to groups past the cap, which the caller discards) while hot
  * keys cost O(cap) memory instead of O(group).
  *
  * Like [[TopKAgg]], partial (map-side) aggregation bounds each task's
  * contribution BEFORE the exchange: the shuffle carries at most `cap`
  * entries per (group, map partition) however dense the postings are.
  * Element order in the result is unspecified (consumers must be
  * order-independent — pair generation and counting are). */
object CappedListAgg {

  // (count, members) — count tracked so reduce/merge are O(1)/O(merge)
  // without List.length walks; a buffer at the cap never grows again.
  type Buf = (Int, List[Long])

  def cappedList(cap: Int): Aggregator[Long, Buf, Seq[Long]] =
    new Aggregator[Long, Buf, Seq[Long]] {
      def zero: Buf = (0, Nil)
      def reduce(b: Buf, e: Long): Buf =
        if (b._1 >= cap) b else (b._1 + 1, e :: b._2)
      def merge(a: Buf, b: Buf): Buf =
        if (a._1 >= cap) a
        else if (b._1 >= cap) b
        else {
          val room = cap - a._1
          if (b._1 <= room) (a._1 + b._1, b._2 ::: a._2)
          else (cap, b._2.take(room) ::: a._2)
        }
      def finish(b: Buf): Seq[Long] = b._2
      def bufferEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
      def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
    }

  /** Column API: `capped_list(cap)(id)` → array of the group's ids,
    * complete iff the group has at most `cap` members, truncated AT
    * the cap otherwise (callers filter `size(...) <= cap - 1` — or
    * any bound < cap — to keep only provably-complete groups). */
  def capped_list(cap: Int): Column => Column = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val fn = udaf(cappedList(cap), ExpressionEncoder[Long]())
    id => fn(id)
  }
}
