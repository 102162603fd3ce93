package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

import graft.functions.Ts
import graft.operators.RangeJoin
import graft.queries.Tables

/** Pins the engine's timestamp-annotation contract (naive == UTC,
  * session zone pinned to UTC): every timestamp-arithmetic path must
  * return IDENTICAL results whether the input column is `TIMESTAMP`
  * (parquet isAdjustedToUTC=true) or `TIMESTAMP_NTZ` (=false).
  *
  * Round-13 regression this guards: the driver regenerated the events
  * fixture with the naive annotation and every `unix_micros` call site
  * failed analysis — the crash is fixed by [[graft.functions.Ts]], and
  * this spec additionally asserts the SEMANTICS match, not just that
  * both types analyze.
  */
class NtzInvarianceSpec extends SparkSpecBase {

  /** The same rows under both annotations. `Tables.events` normalizes
    * to an instant at the boundary; casting back to NTZ under the UTC
    * session zone reproduces exactly what Spark would have read had
    * the fixture carried isAdjustedToUTC=false. */
  private def bothVariants(): (DataFrame, DataFrame) = {
    val ltz = Tables.events(spark, sf).select(col("event_id"),
      col("user_id"), col("ts"), col("event_type"))
    assert(ltz.schema("ts").dataType === TimestampType,
      "Tables.events must normalize ts to TimestampType at the boundary")
    val ntz = ltz.withColumn("ts", col("ts").cast(TimestampNTZType))
    assert(ntz.schema("ts").dataType === TimestampNTZType)
    (ltz, ntz)
  }

  test("epochMicros is annotation-invariant (and analyzes on both types)") {
    val (ltz, ntz) = bothVariants()
    val a = ltz.select(col("event_id"), Ts.epochMicros(col("ts")).as("us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = ntz.select(col("event_id"), Ts.epochMicros(col("ts")).as("us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("range join results are annotation-invariant") {
    val (ltz, ntz) = bothVariants()
    def run(ev: DataFrame): Set[(Long, Long)] = {
      val windows = ev
        .select(date_trunc("week", col("ts")).as("w_start"))
        .distinct()
        .select(col("w_start"),
          (col("w_start") + expr("INTERVAL 2 DAYS")).as("w_end"))
      RangeJoin.bucketed(ev.select(col("event_id"), col("ts")), windows,
          "ts", "w_start", "w_end", bucketMs = 24L * 3600 * 1000)
        .select(col("event_id"), Ts.epochMicros(col("w_start")).as("w"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val a = run(ltz)
    assert(a === run(ntz))
    assert(a.nonEmpty)
  }

  test("gap sessionization is annotation-invariant") {
    val (ltz, ntz) = bothVariants()
    def run(ev: DataFrame): Map[Long, (Long, Long)] = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"))
      ev.withColumn("prev", lag(col("ts"), 1).over(w))
        .withColumn("new_s",
          when(col("prev").isNull ||
            Ts.epochMicros(col("ts")) - Ts.epochMicros(col("prev")) >
              1800000000L, 1L)
            .otherwise(0L))
        .groupBy(col("user_id"))
        .agg(sum(col("new_s")).as("sessions"), count(lit(1)).as("events"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
    }
    val a = run(ltz)
    assert(a === run(ntz))
    assert(a.nonEmpty)
  }

  test("tumbling window aggregation is annotation-invariant") {
    val (ltz, ntz) = bothVariants()
    def run(ev: DataFrame): Set[(Long, String, Long)] = {
      ev.groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(Ts.epochMicros(col("window.start")).as("ws"),
          col("event_type"), col("cnt"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSet
    }
    val a = run(ltz)
    assert(a === run(ntz))
    assert(a.nonEmpty)
  }
}
