package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time window aggregation and cardinality sketches over the
  * event log — training-data-pipeline layer (builder brief). The
  * reference's TrailDB role is batch-scanning an event log (SURVEY
  * §2.10); these are the windowed/approximate aggregations a pipeline
  * runs on that same log at scale. One hash-aggregate shuffle each;
  * `window()` is a plain projection before the groupBy. The same
  * expressions run unchanged under Structured Streaming (see
  * graft.streaming.EventStream).
  */
object Windows {

  /** Tumbling event-time windows: per (window, event_type) row count
    * and value sum. */
  def tumbling(events: DataFrame, width: String): DataFrame =
    events.groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("val_sum"))
      .select(col("w.start").as("ws"), col("event_type"),
        col("cnt"), col("val_sum"))

  /** Sliding event-time windows (width, slide): each event lands in
    * width/slide windows. */
  def sliding(events: DataFrame, width: String, slide: String): DataFrame =
    events.groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("ws"), col("event_type"), col("cnt"))

  /** Exact distinct users per event type (the oracle-checkable
    * cardinality query). */
  def distinctUsersExact(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("users"))

  /** HyperLogLog++ distinct-user sketch per event type — the 100 TB
    * path: constant memory per group versus a full distinct shuffle;
    * relative error `rsd`. Approximate, so verified by unit-test
    * error bound rather than a hash oracle. */
  def distinctUsersApprox(events: DataFrame, rsd: Double = 0.02): DataFrame =
    events.groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("users_approx"))

  /** Per-user session counts via tumbling day windows — the
    * groupby-over-window composition (window key + entity key). */
  def dailyUserActivity(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 day").as("w"), col("user_id"))
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("value")), 4).as("val_sum"))
      .select(col("w.start").as("day"), col("user_id"),
        col("cnt"), col("val_sum"))
}
