package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated test tables (TESTDATA.md).
  *
  * Always read through these: `spark.read.parquet` + the caller's
  * immediate `.select(...)` lets Catalyst prune columns and push filters
  * into the scan — at 100 TB the difference between reading 2 columns
  * and reading 11 is the whole game.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events log is written by pandas with nanosecond timestamps,
    * which Spark's parquet reader rejects outright
    * (PARQUET_TYPE_ILLEGAL). Read `ts` as raw nanos via the legacy
    * conf, then floor-divide to microseconds — exactly what DuckDB's
    * reader does, so oracle comparisons agree to the microsecond.
    *
    * Deliberate side effect: `nanosAsLong` stays set for the session
    * (it cannot be restored after this call — executors consult it
    * again at scan time), so later reads of OTHER nano-timestamp
    * parquet in the same session yield LongType nanos instead of an
    * error. Every nano source must convert the way this reader does. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      // naive micros (isAdjustedToUTC=false → TIMESTAMP_NTZ): normalize
      // to an instant under the engine's naive==UTC contract
      // ([[graft.functions.Ts]]) so downstream timestamp math never
      // depends on which annotation the fixture writer happened to emit
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          graft.functions.Ts.toUtcInstant(
            org.apache.spark.sql.functions.col("ts")))
      case _ => raw
    }
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** The event_type lexicon used by the declared one-hot queries.
    * `zz_declared_zero` is a category deliberately absent from the data:
    * the reference keeps declared-but-unseen categories as all-zero
    * columns (test_sparse_frame.py:353-363) and so do we. */
  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")
  val EventTypesPlusZero: Seq[String] = EventTypes :+ "zz_declared_zero"
}
