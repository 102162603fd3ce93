package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming over the event log — the streaming face of the
  * same operators the batch layer runs (the reference itself is
  * batch-only, SURVEY §2.10; this is the pipeline-layer extension).
  * The aggregation expressions are IDENTICAL to graft.operators.Windows
  * — one definition, two execution modes — which is the point of
  * building on Spark: the 100 TB batch plan and the live stream share
  * code.
  */
object EventStream {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionState(count: Long, valueSum: Double, lastTs: Long)

  final case class UserSession(user_id: Long, events: Long,
      value_sum: Double, closed: Boolean)

  /** File-source stream over event parquet written with nanosecond
    * timestamps (the fixture layout — pandas default): streaming
    * sources cannot infer schemas and Spark rejects TIMESTAMP(NANOS)
    * outright, so `ts` is declared LONG via the nanosAsLong legacy
    * conf and floored to microseconds, exactly like the batch reader
    * (graft.queries.Tables.events). */
  def readEvents(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema("event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE")
      .parquet(path)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Tumbling window counts with a watermark: late events beyond
    * `lateness` are dropped and state for closed windows is evicted —
    * the unbounded-state guard a real pipeline needs. */
  def tumblingCounts(events: DataFrame, width: String = "1 hour",
      lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("val_sum"))
      .select(col("w.start").as("ws"), col("event_type"),
        col("cnt"), col("val_sum"))

  /** Custom per-user session state via mapGroupsWithState: counts and
    * sums events per user — the arbitrary-stateful-operator escape
    * hatch for logic windows can't express. Pass `timeoutMs > 0` to arm
    * a processing-time timeout that closes idle sessions (note the
    * engine then triggers empty maintenance batches on a timer; leave
    * it off for deterministic drain-and-stop runs like tests). */
  def userSessions(spark: SparkSession, events: DataFrame,
      timeoutMs: Long = 0L): Dataset[UserSession] = {
    import spark.implicits._
    val timeout =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.as[Event]
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, UserSession](timeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            UserSession(userId, s.count, s.valueSum, closed = true)
          } else {
            val prev = state.getOption.getOrElse(SessionState(0L, 0.0, 0L))
            var count = prev.count
            var sum = prev.valueSum
            var last = prev.lastTs
            batch.foreach { e =>
              count += 1
              sum += e.value
              last = math.max(last, e.ts.getTime)
            }
            state.update(SessionState(count, sum, last))
            if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
            UserSession(userId, count, sum, closed = false)
          }
      }
  }

  /** Streaming deduplication WITHIN the watermark horizon: keeps the
    * first document per 256-bit text digest among documents whose
    * event times fall inside the same `lateness` window. Uses
    * dropDuplicatesWithinWatermark so the state store evicts entries
    * past the watermark (plain dropDuplicates on a non-event-time key
    * keeps state forever despite the watermark) — the fundamental
    * streaming tradeoff: bounded state means a text recurring AFTER
    * the horizon is emitted again. For global exactness run the batch
    * Dedup.exactDuplicates over the accumulated output periodically.
    * Input needs (doc_id, text, ts). */
  def streamingExactDedup(docs: DataFrame, lateness: String = "1 hour"): DataFrame =
    docs
      .withColumn("text_sha", sha2(col("text"), 256))
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("text_sha")

  /** Streaming near-duplicate ingestion — the steady-state corpus
    * loop (probe → keep → admit) as one `foreachBatch`: every
    * micro-batch probes the PERSISTED signature index
    * (graft.operators.Dedup), hands the found (doc_new, doc_indexed,
    * jaccard) pairs to `onPairs` (route them to a sink/table), and
    * admits the batch's non-duplicate survivors into the index so
    * later batches deduplicate against them. Within one micro-batch,
    * documents are probed against the index as it stood BEFORE the
    * batch — compose `Dedup.exactDuplicates` upstream if intra-batch
    * duplicates matter. The index grows by plain parquet appends; a
    * failed batch retried by the engine re-probes before re-admitting,
    * so duplicate admission needs idempotent ids upstream. */
  def nearDupIngest(docs: DataFrame, idCol: String, textCol: String,
      indexPath: String, threshold: Double = 0.8,
      admitMatched: Boolean = false)(
      onPairs: (DataFrame, Long) => Unit) = {
    import graft.operators.Dedup
    // admitMatched = audit mode: matched documents are indexed anyway
    // (the dedup decision is deferred downstream), so the index holds
    // the full corpus and the emitted pairs are exactly the
    // cross-batch true pairs — a deterministic set for a deterministic
    // batch split, whatever order the engine processes batches in
    docs.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val b = batch.toDF().localCheckpoint()
        val pairs = Dedup.incrementalNearDuplicates(b, idCol, textCol,
          indexPath, threshold).localCheckpoint()
        val admit = if (admitMatched) b else {
          val dups = pairs.select(col("doc_new").as(idCol)).distinct()
          b.join(dups, Seq(idCol), "left_anti")
        }
        Dedup.appendToNearDupIndex(admit, idCol, textCol, indexPath)
        onPairs(pairs, batchId)
      }
      .start()
  }

  /** Driver-visible face of [[nearDupIngest]] (the `stream_near_dup`
    * query): run documents through the REAL probe-then-admit streaming
    * loop and return the found pairs as a batch DataFrame. Documents
    * are staged as one parquet file per `doc_id % files` class and
    * streamed with `maxFilesPerTrigger=1`, so the drain executes
    * `files` genuine micro-batches against a growing persisted index.
    * Audit mode (admit-all) + direction-normalized output make the
    * result independent of the engine's file-processing order: a true
    * pair is emitted iff its documents land in DIFFERENT batches
    * (whichever arrives second reports the first), so the set is
    * exactly {(lo, hi, j): j ≥ threshold, lo % files ≠ hi % files} —
    * which the exact-Jaccard SQL oracle expresses directly. */
  def nearDupIngestDrained(spark: SparkSession, docs: DataFrame,
      threshold: Double = 0.8, files: Int = 4): DataFrame = {
    import graft.operators.Dedup
    val id = ProcessHandle.current().pid() + "_" + drainCounter.incrementAndGet()
    val tmp = System.getProperty("java.io.tmpdir")
    val stage = new java.io.File(tmp, s"graft_neardup_stage_$id").getAbsolutePath
    val idx = new java.io.File(tmp, s"graft_neardup_index_$id").getAbsolutePath
    // staged once: the residue-class loop below and the index seeding
    // would otherwise re-evaluate whatever plan produced `docs` once
    // per file (the paragraphDuplicates staging contract)
    val src = docs.select(col("doc_id"), col("text")).localCheckpoint()
    // one file per residue class: batch membership is doc_id % files,
    // deterministic whatever order the source picks the files up in
    (0 until files).foreach { i =>
      src.filter(pmod(col("doc_id"), lit(files)) === i).coalesce(1)
        .write.mode(if (i == 0) "overwrite" else "append").parquet(stage)
    }
    Dedup.writeNearDupIndex(src.limit(0), "doc_id", "text", idx,
      shingleN = 3, k = 128, bands = 32)
    val batches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var primary: Throwable = null
    try {
      val q = nearDupIngest(
        spark.readStream.schema("doc_id LONG, text STRING")
          .option("maxFilesPerTrigger", "1").parquet(stage),
        "doc_id", "text", idx, threshold, admitMatched = true) { (pairs, _) =>
        batches.synchronized { batches += pairs }   // already checkpointed
      }
      try q.processAllAvailable() finally q.stop()
      val all = batches.synchronized { batches.toSeq }
      all.reduceOption(_ unionByName _)
        .map(_.select(
          least(col("doc_new"), col("doc_indexed")).as("doc_lo"),
          greatest(col("doc_new"), col("doc_indexed")).as("doc_hi"),
          col("jaccard")))
        .getOrElse(spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](),
          org.apache.spark.sql.types.StructType.fromDDL(
            "doc_lo LONG, doc_hi LONG, jaccard DOUBLE")))
    } catch {
      case t: Throwable => primary = t; throw t
    } finally {
      try {
        val fs = new org.apache.hadoop.fs.Path(stage)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(stage), true)
        fs.delete(new org.apache.hadoop.fs.Path(idx), true)
      } catch {
        case c: Throwable =>
          if (primary != null) primary.addSuppressed(c) else throw c
      }
    }
  }

  /** Streaming SEMANTIC (embedding-space) near-dup ingestion — the
    * [[nearDupIngest]] loop for vectors: every micro-batch probes a
    * PERSISTED vector index within shared IVF cells (asymmetric, the
    * [[graft.operators.Similarity.nearestDupLsh]] discipline: the
    * index stores ONE base cell per vector, the probe side explodes
    * `probes` cells — cheap index, recall bought on the probe leg),
    * exact-verifies candidate cosines, hands (vec_new, vec_indexed,
    * cos) pairs to `onPairs`, and admits the batch into the index
    * (survivors only, or everything in `admitMatched` audit mode).
    * `centroids` are FROZEN, trained offline ([[graft.operators.Similarity.trainIvfCentroids]])
    * — the FAISS steady-state contract: a quantizer retrain is a
    * batch re-index, never a streaming side effect. Input batches
    * need (idCol, vecCol: array<double>). */
  def embeddingIngest(vecs: DataFrame, idCol: String, vecCol: String,
      indexPath: String, centroids: Array[Array[Double]],
      threshold: Double, probes: Int = 2,
      admitMatched: Boolean = false)(
      onPairs: (DataFrame, Long) => Unit) = {
    import graft.operators.Similarity
    vecs.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val b = batch.toDF()
          .select(col(idCol), Similarity.asDouble(col(vecCol)).as("__v"))
          .localCheckpoint()
        val spark = b.sparkSession
        val idx = spark.read.parquet(indexPath)
        val probeRel = b.select(col(idCol).as("vec_new"), col("__v").as("vn"),
          explode(graft.functions.IvfCells.cells(col("__v"), centroids, probes))
            .as("cell"))
        // the index side stores exactly one cell per vector, so a
        // candidate pair meets in at most one (probe-cell = base-cell)
        // key — no post-join dedup needed, cosine computed once
        val pairs = probeRel.join(idx, Seq("cell"))
          .filter(col("vec_new") =!= col("vec_id"))
          .select(col("vec_new"), col("vec_id").as("vec_indexed"),
            Similarity.cosine(col("vn"), col("v")).as("__c"))
          .filter(col("__c") >= threshold)
          .select(col("vec_new"), col("vec_indexed"),
            round(col("__c"), 6).as("cos"))
          .localCheckpoint()
        val admit = if (admitMatched) b else {
          val dups = pairs.select(col("vec_new").as(idCol)).distinct()
          b.join(dups, Seq(idCol), "left_anti")
        }
        admit.select(col(idCol).as("vec_id"), col("__v").as("v"),
            element_at(
              graft.functions.IvfCells.cells(col("__v"), centroids, 1), 1)
              .as("cell"))
          .write.mode("append").parquet(indexPath)
        onPairs(pairs, batchId)
      }
      .start()
  }

  /** Driver-visible face of [[embeddingIngest]] (the
    * `stream_semantic_dup` query): same residue-class staging and
    * audit-mode/direction-normalization contract as
    * [[nearDupIngestDrained]] — the emitted set is exactly the true
    * cosine-≥-threshold pairs whose vectors land in DIFFERENT
    * `vec_id % files` batches, independent of processing order, which
    * the exact-cosine SQL oracle expresses directly. Input needs
    * (vec_id, v: array<double>). */
  def embeddingIngestDrained(spark: SparkSession, vecs: DataFrame,
      threshold: Double, files: Int = 4, nlist: Int = 16,
      probes: Int = 2): DataFrame = {
    import graft.operators.Similarity
    val id = ProcessHandle.current().pid() + "_" + drainCounter.incrementAndGet()
    val tmp = System.getProperty("java.io.tmpdir")
    val stage = new java.io.File(tmp, s"graft_semdup_stage_$id").getAbsolutePath
    val idx = new java.io.File(tmp, s"graft_semdup_index_$id").getAbsolutePath
    val src = vecs.select(col("vec_id"), col("v")).localCheckpoint()
    (0 until files).foreach { i =>
      src.filter(pmod(col("vec_id"), lit(files)) === i).coalesce(1)
        .write.mode(if (i == 0) "overwrite" else "append").parquet(stage)
    }
    // quantizer trained once on the full corpus (deterministic sample),
    // frozen for every batch — the offline-training contract
    val cents = Similarity.trainIvfCentroids(src, "vec_id", "v", nlist)
    // seed an empty index with the right schema
    src.limit(0).select(col("vec_id"), col("v"), lit(0).as("cell"))
      .write.mode("overwrite").parquet(idx)
    val batches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var primary: Throwable = null
    try {
      val q = embeddingIngest(
        spark.readStream.schema("vec_id LONG, v ARRAY<DOUBLE>")
          .option("maxFilesPerTrigger", "1").parquet(stage),
        "vec_id", "v", idx, cents, threshold, probes,
        admitMatched = true) { (pairs, _) =>
        batches.synchronized { batches += pairs }   // already checkpointed
      }
      try q.processAllAvailable() finally q.stop()
      val all = batches.synchronized { batches.toSeq }
      all.reduceOption(_ unionByName _)
        .map(_.select(
          least(col("vec_new"), col("vec_indexed")).as("vec_lo"),
          greatest(col("vec_new"), col("vec_indexed")).as("vec_hi"),
          col("cos")))
        .getOrElse(spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](),
          org.apache.spark.sql.types.StructType.fromDDL(
            "vec_lo LONG, vec_hi LONG, cos DOUBLE")))
    } catch {
      case t: Throwable => primary = t; throw t
    } finally {
      try {
        val fs = new org.apache.hadoop.fs.Path(stage)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(stage), true)
        fs.delete(new org.apache.hadoop.fs.Path(idx), true)
      } catch {
        case c: Throwable =>
          if (primary != null) primary.addSuppressed(c) else throw c
      }
    }
  }

  private val drainCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** The driver-visible face of the streaming layer: run the SAME
    * tumbling aggregation as batch `Windows.tumbling` THROUGH the
    * Structured Streaming engine and return the drained result as a
    * batch DataFrame — so the stream's own output can be
    * hash-compared against the batch SQL oracle (the
    * `stream_window_tumbling` query).
    *
    * The input frame is staged as a multi-file parquet directory and
    * streamed with `maxFilesPerTrigger=1`, so the drain executes
    * `files` real micro-batches with incremental state-store updates —
    * not one batch in disguise. Complete output mode + memory sink
    * hold the final aggregate; a watermarked append-mode variant (the
    * production shape, [[tumblingCounts]]) would never emit the
    * trailing windows on a finite drain, which is why this entry
    * point exists separately. Staging/sink names are unique per
    * (process, call) so concurrent verifies cannot collide. */
  def tumblingDrained(spark: SparkSession, events: DataFrame,
      width: String = "1 hour", files: Int = 4): DataFrame = {
    val id = ProcessHandle.current().pid() + "_" + drainCounter.incrementAndGet()
    val stage = new java.io.File(
      System.getProperty("java.io.tmpdir"), s"graft_stream_stage_$id").getAbsolutePath
    events.select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .repartition(files)
      .write.mode("overwrite").parquet(stage)
    // both cleanups in a finally: a failed or interrupted stream must
    // not leak the staged parquet copy NOR the catalog-registered
    // memory table (repeated verify runs would accumulate both); the
    // view drop is a no-op when the failure preceded sink creation,
    // and on success it runs after the result is checkpoint-detached.
    // A cleanup failure must never REPLACE a streaming failure: it is
    // attached as suppressed so the root cause propagates.
    val sinkName = s"graft_stream_drain_$id"
    var primary: Throwable = null
    try {
      val stream = spark.readStream
        .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
        .option("maxFilesPerTrigger", "1")
        .parquet(stage)
      val agg = stream
        .groupBy(window(col("ts"), width).as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("val_sum"))
        .select(col("w.start").as("ws"), col("event_type"),
          col("cnt"), col("val_sum"))
      val q = agg.writeStream.format("memory").queryName(sinkName)
        .outputMode(OutputMode.Complete).start()
      try q.processAllAvailable() finally q.stop()
      // the checkpointed result detaches from the sink and is a few
      // thousand aggregate rows — bounded
      spark.table(sinkName).localCheckpoint()
    } catch {
      case t: Throwable => primary = t; throw t
    } finally {
      try {
        spark.catalog.dropTempView(sinkName)
        val fs = new org.apache.hadoop.fs.Path(stage)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(stage), true)
      } catch {
        case c: Throwable =>
          if (primary != null) primary.addSuppressed(c) else throw c
      }
    }
  }

  /** Wire a streaming frame to an in-memory sink (testing/debugging). */
  def toMemorySink(df: DataFrame, name: String, complete: Boolean = true) =
    df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(if (complete) OutputMode.Complete else OutputMode.Update)
      .start()
}
