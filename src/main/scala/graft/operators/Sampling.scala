package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting — the training-data-
  * pipeline layer (builder brief; the reference has no sampling
  * surface). Every operator here is REPRODUCIBLE: membership is a pure
  * function of a key column, so re-runs, retried tasks, and different
  * cluster layouts all select the same rows — `df.sample()`'s
  * per-partition RNG guarantees none of that once partitioning shifts.
  *
  * Mechanism: a row's "uniform draw" is the first 8 hex chars of
  * `md5(key)` compared lexicographically against a driver-computed
  * threshold string. Lowercase-hex string order equals numeric order,
  * the hash is engine-portable (DuckDB's md5 produces the identical
  * hex), and the whole thing is one narrow map stage — no shuffle, no
  * RNG state, trivially codegen'd.
  */
object Sampling {

  /** First 8 hex chars of md5(key) — a uniform draw over 16^8 values,
    * deterministic in the key alone. */
  def hashDraw(key: Column): Column =
    substring(md5(key.cast("string")), 1, 8)

  /** The seeded draw as its numeric value: `md5(seed ‖ key)`'s first
    * 8 hex chars read base-16. Fixed-width lowercase hex orders
    * identically to its numeric value, so ordering by this long ≡
    * ordering by the [[hashDraw]]-style string — THE single
    * definition of the seeded numeric draw (consumers:
    * [[clusterBalancedSample]]'s per-cell rank,
    * [[graft.operators.ImportanceSampling.gumbel]]'s uniform);
    * every oracle rebuilds it as `('0x' ‖ hex)::UBIGINT`, DuckDB's
    * spelling of Spark's `conv(hex, 16, 10)`. */
  def seededDrawLong(key: Column, seed: String): Column =
    conv(substring(md5(concat(lit(seed), key.cast("string"))), 1, 8), 16, 10)
      .cast("long")

  /** The threshold hex string t such that P[draw < t] = fraction. */
  def hexThreshold(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction not in [0,1]")
    f"${math.round(fraction * 4294967296.0).min(4294967295L)}%08x"
  }

  /** Keep a deterministic `fraction` of rows, keyed by `keyCol`:
    * membership survives re-runs and repartitioning, and the same key
    * always lands on the same side (so a doc and its derived chunks
    * sample consistently when keyed alike). */
  def sampleFraction(df: DataFrame, keyCol: String, fraction: Double): DataFrame =
    if (fraction >= 1.0) df
    else df.filter(hashDraw(col(keyCol)) < lit(hexThreshold(fraction)))

  /** Assign every row to a named split with the given weights
    * (train/val/test and friends): one `split` column appended,
    * assignment a pure function of the key. Weights must sum to 1. */
  def assignSplits(df: DataFrame, keyCol: String,
      splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got ${splits.map(_._2).sum}")
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val draw = hashDraw(col(keyCol))
    // last split is the otherwise-branch: no boundary epsilon issues
    val labeled = splits.init.zip(cum.init).foldRight(
      lit(splits.last._1)) { case (((name, _), c), elseCol) =>
      when(draw < lit(hexThreshold(c)), lit(name)).otherwise(elseCol)
    }
    df.withColumn("split", labeled)
  }

  /** Stratified sampling: a different keep-fraction per stratum value
    * (e.g. downsample dominant languages, keep all of rare ones).
    * Unknown strata are dropped — pass a default entry explicitly if
    * passthrough is wanted. Pure map stage, like the rest. */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
      fractions: Map[String, Double]): DataFrame = {
    require(fractions.nonEmpty, "need at least one stratum fraction")
    val draw = hashDraw(col(keyCol))
    val keep = fractions.foldLeft(lit(false)) { case (acc, (stratum, f)) =>
      // a full-keep stratum must not filter at all: the 'ffffffff' draw
      // is below no 8-hex-char threshold, yet belongs in a 100% sample
      val cond = if (f >= 1.0) col(stratumCol) === lit(stratum)
        else col(stratumCol) === lit(stratum) && draw < lit(hexThreshold(f))
      acc || cond
    }
    df.filter(keep)
  }

  /** Exactly-k uniform sample: the k smallest hash draws. Plans as
    * TakeOrderedAndProject — parallel per-partition partial top-k and
    * an O(k) merge, never a global sort (same shape as
    * `SparseRel.takeRows`). Deterministic for distinct keys. */
  def sampleExactK(df: DataFrame, keyCol: String, k: Int): DataFrame =
    df.withColumn("__draw", hashDraw(col(keyCol)))
      .orderBy(col("__draw"), col(keyCol))
      .limit(k)
      .drop("__draw")

  /** Deterministic global training-order shuffle: every row gets a
    * `shuffle_pos` — its rank under `md5(seed ‖ key)` order — the
    * data-order randomization a pretraining pipeline runs before
    * sharding, reproducible across re-runs/retries/layouts (change
    * `seed` per epoch for a fresh order). Distributed shape: the sort
    * is Spark's range-partitioned exchange + per-partition sort (the
    * layout you'd write shards from at 100 TB), and positions come
    * from RDD `zipWithIndex` — a per-partition count job plus offset
    * arithmetic, NOT a `row_number` window funneling every row
    * through one partition (same shape as `SparseRel.takeRowsAt`).
    * Duplicate keys draw identical ranks' neighbourhoods (their
    * relative order is immaterial — the rows are interchangeable);
    * the result SET of (row, pos) is deterministic for distinct
    * keys. */
  def shuffleOrder(df: DataFrame, keyCol: String, seed: String = ""): DataFrame = {
    // project the 32-char draw away BEFORE enumeration (the projection
    // cannot be pushed below the sort — the sort needs the column — so
    // row order is preserved into the RDD, and the per-row payload
    // through the Row conversion stays the caller's columns only)
    // localCheckpoint: zipWithIndex runs a count job before the map
    // job, and without staging here both jobs would re-run the full
    // sort+shuffle; checkpointing the sorted frame pays the sort once
    val keyed = df
      .withColumn("__draw", md5(concat(lit(seed), col(keyCol).cast("string"))))
      .orderBy(col("__draw"), col(keyCol))
      .drop("__draw")
      .localCheckpoint()
    val schema = keyed.schema.add("shuffle_pos", org.apache.spark.sql.types.LongType)
    df.sparkSession.createDataFrame(
      keyed.rdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i) },
      schema)
  }

  /** Deterministic weighted mixture of sources: rows tagged by
    * `sourceCol` are down-sampled so the EXPECTED output composition
    * matches `targetWeights` while keeping as much data as possible —
    * the standard recipe for rebalancing a training mix. Given per-
    * source row counts n_s and targets w_s, the binding source is the
    * one with the largest w_s-normalized deficit; every source keeps
    * rate r_s = (w_s / n_s) · min_s(n_s / w_s), i.e. the binding source
    * keeps everything. Counts are ONE aggregate over the tag column;
    * everything after is a map stage. */
  def rebalanceMix(df: DataFrame, keyCol: String, sourceCol: String,
      targetWeights: Map[String, Double]): DataFrame = {
    require(targetWeights.nonEmpty, "need at least one target weight")
    val wsum = targetWeights.values.sum
    val w = targetWeights.map { case (k2, v) => k2 -> v / wsum }
    val counts = df.filter(col(sourceCol).isin(w.keys.toSeq: _*))
      .groupBy(col(sourceCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // collect() here is metadata (one row per source name) — the number
    // of SOURCES is small by definition, never the number of rows
    val scale = w.collect {
      case (s, ws) if counts.getOrElse(s, 0L) > 0L => counts(s) / ws
    }.minOption.getOrElse(0.0)
    val rates = w.map { case (s, ws) =>
      val raw = if (counts.getOrElse(s, 0L) == 0L) 0.0
        else ws * scale / counts(s)
      // the binding source's rate is 1.0 up to fp round-trip error
      // (w·(n/w)/n); snap it so "keeps everything" really means
      // everything — a 0.999…9 rate would clamp to the 'ffffffff'
      // threshold and drop keys whose draw is exactly that
      s -> (if (raw >= 1.0 - 1e-12) 1.0 else math.min(1.0, raw))
    }
    stratifiedSample(df, keyCol, sourceCol, rates)
  }

  /** Deterministic Rademacher sketch planes: `nPlanes` hyperplanes of
    * ±1 components, each bit drawn from chained md5 blocks of
    * (seed, plane, block) — a pure function of the seed, so the SAME
    * literal arrays can ride both the Spark plan and a SQL oracle.
    * Random-±1 projections preserve angular structure the same way
    * Gaussian planes do (Achlioptas 2003, database-friendly random
    * projections; the sign-sketch is Charikar 2002's SimHash), which
    * is all bucketing needs. */
  def sketchPlanes(nPlanes: Int, dim: Int, seed: String): Seq[Seq[Double]] = {
    require(nPlanes >= 1 && nPlanes <= 20, s"nPlanes $nPlanes not in [1,20]")
    require(dim >= 1, s"dim must be positive, got $dim")
    (0 until nPlanes).map { p =>
      val bits = Iterator.from(0).flatMap { blk =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"$seed:$p:$blk".getBytes("UTF-8"))
          .iterator.flatMap(b => (0 until 8).map(i => (b >> i) & 1))
      }
      bits.take(dim).map(b => if (b == 1) 1.0 else -1.0).toSeq
    }
  }

  /** Cluster-balanced sampling: partition the corpus into 2^planes
    * sketch cells (sign pattern of the vector against the Rademacher
    * planes — deterministic topic-ish buckets) and keep at most `k`
    * rows per cell, chosen by the md5 draw — the diversity-preserving
    * downsampling of curation pipelines (a uniform sample mirrors the
    * corpus's cluster skew; a balanced sample caps every cluster, so
    * dominant topics can't crowd out the tail). Production swaps the
    * sketch cells for trained IVF cells ([[Similarity]]'s k-means
    * machinery) — the balancing machinery is identical; the sketch
    * variant keeps the whole operator a closed form an oracle can
    * rebuild.
    *
    * Scale shape: cluster id + draw are one codegen map stage (the
    * native dot-product expression per plane); the per-cell cap is
    * [[graft.functions.TopKAgg]] — partial aggregation bounds every
    * task's state to ≤k rows per cell BEFORE the exchange, so the
    * shuffle is O(cells·k) per partition regardless of cluster skew —
    * never a `row_number` window funneling whole cells through single
    * partitions. Returns (cluster, key, rank), rank 1..k in draw
    * order. `keyCol` must be integral (it rides the primitive-long
    * aggregate buffer). */
  def clusterBalancedSample(df: DataFrame, keyCol: String, vecCol: String,
      planes: Seq[Seq[Double]], k: Int, seed: String): DataFrame = {
    require(planes.nonEmpty && planes.size <= 20,
      s"need 1..20 sketch planes (cluster bits), got ${planes.size}")
    val v = Similarity.asDouble(col(vecCol))
    // sign test on the ROUNDED dot: the oracle's SUM accumulates in
    // an unpinned order, and an ulp-level disagreement on a
    // near-zero dot would flip a cluster bit — rounding first shrinks
    // the divergence window to the same rounding-boundary class as
    // every other ROUND comparison in the oracle suite
    val cluster = planes.zipWithIndex.map { case (p, i) =>
      when(round(Similarity.dot(v, typedLit(p)), 6) >= 0, lit(1L << i))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    capPerCluster(df.select(cluster.as("cluster"), col(keyCol)), keyCol, k, seed)
  }

  /** The production-cluster variant of [[clusterBalancedSample]]:
    * the cells are TRAINED IVF centroids
    * ([[Similarity.trainIvfCentroids]] — the same frozen quantizer
    * the ANN family probes), so the cap balances across data-derived
    * topic cells instead of data-independent sketch cells. Assignment
    * is one native `IvfCells` pass per row (argmax dot, deterministic
    * ties); the cap machinery is identical. The output cannot have a
    * SQL oracle (cells depend on the trained model), so the
    * registered query emits the per-cell cap INVARIANT alongside the
    * counts — the spec pins semantics against the window definition. */
  def clusterBalancedSampleCells(df: DataFrame, keyCol: String,
      vecCol: String, centroids: Array[Array[Double]], k: Int,
      seed: String): DataFrame = {
    require(centroids.nonEmpty, "need at least one centroid")
    val cell = element_at(graft.functions.IvfCells.cells(
      Similarity.asDouble(col(vecCol)), centroids, 1), 1)
    capPerCluster(df.select(cell.cast("long").as("cluster"), col(keyCol)),
      keyCol, k, seed)
  }

  /** Shared per-cluster cap: keep the k smallest seeded draws in each
    * cluster via the bounded [[graft.functions.TopKAgg]] — map-side
    * partials hold ≤k rows per cluster BEFORE the exchange, so the
    * shuffle is O(clusters·k) per partition regardless of cluster
    * skew. Returns (cluster, key, rank 1..k in draw order).
    *
    * k is CAPPED at 65536: TopKAgg's buffer is a per-group sorted
    * list bounded by k, so the bounded-state (and O(cells·k) shuffle)
    * rationale only holds for small k — a huge k degrades insertion
    * to O(cell²) traversal and holds whole cells in the aggregation
    * buffer. A caller who wants "keep everything" should skip the cap
    * rather than pass k = ∞ (same reason [[sketchPlanes]] caps
    * nPlanes). */
  private def capPerCluster(assigned: DataFrame, keyCol: String, k: Int,
      seed: String): DataFrame = {
    require(k >= 1 && k <= 65536, s"k must be in [1, 65536], got $k")
    // negate the numeric draw so TopKAgg's weight-DESC keeps the
    // SMALLEST draws, its partner-ASC tie-break matching the
    // (draw, key) oracle order
    assigned
      .select(col("cluster"), col(keyCol),
        (-seededDrawLong(col(keyCol), seed)).as("__nd"))
      .groupBy(col("cluster"))
      .agg(graft.functions.TopKAgg.top_partners(k)(
        col(keyCol).cast("long"), col("__nd")).as("top"))
      .select(col("cluster"), posexplode(col("top")).as(Seq("r0", "p")))
      .select(col("cluster"), col("p._1").as(keyCol),
        (col("r0") + 1).cast("long").as("rank"))
  }
}
