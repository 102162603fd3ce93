package graft

import org.apache.spark.sql.functions._

import graft.core.SparseRel
import graft.operators.Scale
import graft.queries.Tables

/** Scale-tooling behavior + plan assertions: bucketed joins must skip
  * the shuffle entirely; salted paths must equal their plain twins. */
class ScaleSpec extends SparkSpecBase {

  private def grouped = SparseRel.scanEvents(Tables.events(spark, sf),
    "event_type", Seq("user_id"), Some(Tables.EventTypes)).groupbySum()

  test("co-bucketed frames join with zero Exchange in the plan") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Scale.writeBucketed(grouped, "bucketed_a", buckets = 4)
      Scale.writeBucketed(grouped, "bucketed_b", buckets = 4)
      val a = Scale.readBucketed(spark, "bucketed_a", Seq("user_id"), Tables.EventTypes)
      val b = Scale.readBucketed(spark, "bucketed_b", Seq("user_id"), Tables.EventTypes)
      val joined = a.df.join(b.df.withColumnRenamed("col", "col2")
        .withColumnRenamed("value", "value2"), Seq("user_id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bucketed_a")
      spark.sql("DROP TABLE IF EXISTS bucketed_b")
    }
  }

  test("saltedJoin equals the plain join") {
    val ev = Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type")
    val dim = Tables.events(spark, sf)
      .select(col("user_id")).distinct()
      .withColumn("user_flag", pmod(col("user_id"), lit(2)))
    val plain = ev.join(dim, Seq("user_id"))
      .groupBy("user_flag").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Scale.saltedJoin(ev, dim, Seq("user_id"),
        leftDistinct = Seq("event_id"), factor = 4)
      .groupBy("user_flag").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("saltedJoin rejects join types that would duplicate unmatched right rows") {
    val ev = Tables.events(spark, sf).select("event_id", "user_id")
    val dim = ev.select("user_id").distinct()
    intercept[IllegalArgumentException](
      Scale.saltedJoin(ev, dim, Seq("user_id"), Seq("event_id"), 4, "right"))
    intercept[IllegalArgumentException](
      Scale.saltedJoin(ev, dim, Seq("user_id"), Seq("event_id"), 4, "full_outer"))
  }

  test("groupbySumSalted equals plain groupbySum") {
    val coo = SparseRel.scanEvents(Tables.events(spark, sf),
      "event_type", Seq("user_id"), Some(Tables.EventTypes))
    val plain = coo.groupbySum().df.collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    val salted = Scale.groupbySumSalted(coo, factor = 4).df.collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(salted === plain)
  }
}
