package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Sequence packing — filling fixed token budgets (training context
  * windows) with variable-length items so padding waste stays low
  * (builder brief; no reference counterpart). Deterministic and
  * distributed:
  *
  *  1. items are spread over `buckets` hash buckets by the same
  *     md5-prefix draw [[Sampling]] uses (pure function of the key —
  *     re-runs and repartitions agree);
  *  2. within a bucket, greedy NEXT-FIT in draw order: a bin closes
  *     when the next item would overflow `maxTokens`. Next-fit is
  *     one running sum — O(1) state per bucket, streamed via
  *     `flatMapSortedGroups` (sorted iterators, no group
  *     materialization), and provably uses < 2× the optimal bin count.
  *
  * Buckets bound parallelism, not memory. An item longer than
  * `maxTokens` gets a bin of its own (callers truncate downstream).
  * Bin ids are `bucket << 32 | localBin` — globally unique without
  * coordination.
  */
object Packing {

  // not private: Catalyst's generated (de)serializer code constructs
  // these reflectively and cannot reach private members
  case class Item(bucket: Int, draw: String, id: String, tokens: Long)
  case class Assigned(id: String, bin: Long, tokens: Long)

  /** Pack `(idCol, tokenCol)` items into bins of at most `maxTokens`
    * tokens. Returns (id, bin, tokens); `id` is the item key rendered
    * as a string — lossless for every key type (a numeric cast would
    * null out string ids and silently collide fractional ones). */
  def packSequences(items: DataFrame, idCol: String, tokenCol: String,
      maxTokens: Long, buckets: Int = 256): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    require(buckets > 0, "buckets must be positive")
    val spark = items.sparkSession
    import spark.implicits._
    val prepared = items.select(
        Sampling.hashDraw(col(idCol)).as("draw"),
        col(idCol).cast("string").as("id"),
        col(tokenCol).cast("long").as("tokens"))
      .withColumn("bucket",
        pmod(conv(col("draw"), 16, 10).cast("long"), lit(buckets)).cast("int"))
      .as[Item]
    prepared
      .groupByKey(_.bucket)
      .flatMapSortedGroups($"draw", $"id") { (bucket, it) =>
        var bin = 0L
        var used = 0L
        var first = true
        it.map { item =>
          if (!first && used + item.tokens > maxTokens) { bin += 1; used = 0L }
          first = false
          used += item.tokens
          Assigned(item.id, (bucket.toLong << 32) | bin, item.tokens)
        }
      }
      .toDF("id", "bin", "tokens")
  }

  /** Driver-visible validity certificate for [[packSequences]] (the
    * assignment itself is algorithmic — greedy order — so the oracle
    * checks invariants, like `embed_ann_recall` does for ANN): every
    * item packed exactly once, no bin exceeds `maxTokens` unless it
    * holds a single oversize item, and the bin count is under the
    * next-fit 2×-optimal bound. One row of booleans + the item count. */
  def packValidity(items: DataFrame, idCol: String, tokenCol: String,
      maxTokens: Long, buckets: Int = 256): DataFrame = {
    val packed = packSequences(items, idCol, tokenCol, maxTokens, buckets)
    val bins = packed.groupBy(col("bin"))
      .agg(sum(col("tokens")).as("t"), count(lit(1)).as("c"))
    val binStats = bins.agg(
      count(lit(1)).as("n_bins"),
      sum(when(col("t") > maxTokens && col("c") > 1L, 1L).otherwise(0L))
        .as("overflows"),
      sum(col("t")).as("total_tokens"))
    val itemStats = packed.agg(
      count(lit(1)).as("n_items"),
      countDistinct(col("id")).as("n_distinct"))
    itemStats.crossJoin(binStats).select(
      col("n_items"),
      (col("n_items") === col("n_distinct")).as("all_packed_once"),
      (col("overflows") === 0L).as("no_overflow"),
      // next-fit guarantee: n_bins < 2·⌈total/max⌉ + buckets (each
      // bucket may waste one partial tail bin)
      (col("n_bins") < ceil(col("total_tokens") / lit(maxTokens.toDouble)) * 2
        + lit(buckets.toLong)).as("bins_bounded"))
  }
}
