package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.SparseRel
import graft.queries.Tables

/** The sf10 (100×) ON-DISK flagship rehearsal (r16 ask #8): scale
  * evidence for the core COO algebra beyond the ~sf3 the in-memory
  * rehearsals reach. Unlike [[ScaleRehearsal]] (which checkpoints
  * replicated docs/embeddings in memory to stress the self-join
  * operators), this writes a `reps`×-replicated EVENT LOG to parquet
  * and reads it back cold, so the measured pipeline is the real
  * at-scale shape: parquet scan → one-hot COO → grouped algebra, with
  * column pruning and predicate pushdown observable in the executed
  * plan (both are ASSERTED, not eyeballed).
  *
  * Replication: user_id/event_id shift by r·10000001 per replica, so
  * every COO invariant has a closed form against the base fixture —
  * cell count, group count, and dense row count scale exactly ×reps,
  * and per-column sums scale ×reps up to double summation-order
  * rounding (checked at 1e-6 relative). Every check failing raises;
  * timings print in the `[rehearsal]` format the evidence log uses.
  *
  * Usage: `runMain graft.FlagshipRehearsal [sfDir] [reps] [outDir]`
  * (defaults /root/testdata/sf0.1, 100, target/flagship_sf10 —
  * 100 × sf0.1 = the "sf10" event log: 10M rows, ~200 MB parquet). */
object FlagshipRehearsal {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 100
    val outDir = if (args.length > 2) args(2) else "target/flagship_sf10"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val out = f
      println(f"[rehearsal] $name%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      out
    }
    val OFFSET = 10000001L

    val base = Tables.events(spark, sfDir)
    val baseN = base.count()
    locally {
      val maxUser = base.agg(max("user_id")).head.getLong(0)
      require(maxUser < OFFSET,
        s"replica offset $OFFSET would collide: max user_id=$maxUser")
    }

    // ---- 1. write the replicated log to disk (the one-time cost a
    // real sf10 fixture would amortize; timed for the record) ----
    timed(s"flagship write ${reps}x events parquet") {
      (0 until reps).map(r =>
          base.select(
            (col("event_id") + lit(r * OFFSET)).as("event_id"),
            col("ts"),
            (col("user_id") + lit(r * OFFSET)).as("user_id"),
            col("event_type"), col("value"), col("props")))
        .reduce(_ unionByName _)
        .repartition(cpus.toInt * 2)
        .write.mode("overwrite").parquet(outDir)
    }
    val sized = new java.io.File(outDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    println(s"[rehearsal] flagship on-disk log: ${baseN * reps} rows, " +
      f"${sized / 1e6}%.0f MB parquet")

    // ---- 2. cold COLD read → flagship COO pipeline ----
    val events = spark.read.parquet(outDir)

    // column pruning: the one-hot scan must read only the 3 columns it
    // uses, not the 6-column log (ReadSchema in the executed plan)
    val coo = SparseRel.scanEvents(events, "event_type",
      Seq("user_id"), Some(Tables.EventTypes))
    locally {
      val plan = coo.df.queryExecution.executedPlan.toString
      val readSchema = "ReadSchema: [^\\n]*".r.findFirstIn(plan).getOrElse("")
      require(readSchema.contains("user_id") &&
          readSchema.contains("event_type") &&
          !readSchema.contains("props") && !readSchema.contains("ts"),
        s"one-hot scan does not prune columns: $readSchema")
      println(s"[rehearsal] flagship scan pruned: $readSchema")
    }
    val cooN = timed(s"flagship scan+onehot (${reps}x)")(Force.count(coo.df))
    val baseCooN = Force.count(SparseRel.scanEvents(base, "event_type",
      Seq("user_id"), Some(Tables.EventTypes)).df)
    require(cooN == baseCooN * reps,
      s"onehot cells $cooN != $reps x $baseCooN")

    val grouped = coo.groupbySum()
    val groupedN = timed(s"flagship groupby_sum (${reps}x)")(
      Force.count(grouped.df))
    val baseGroupedN = Force.count(
      SparseRel.scanEvents(base, "event_type", Seq("user_id"),
        Some(Tables.EventTypes)).groupbySum().df)
    require(groupedN == baseGroupedN * reps,
      s"groups $groupedN != $reps x $baseGroupedN")

    // self-add (inner): the COO alignment join at 10M-row scale;
    // cells align 1:1 so the row count equals the grouped count
    val addN = timed(s"flagship add_inner self (${reps}x)")(
      Force.count(grouped.add(grouped, graft.core.AlignHow.Inner).df))
    require(addN == groupedN, s"add_inner rows $addN != $groupedN")

    // per-column sums: values must equal reps x the base sums (1e-6
    // relative — double summation order differs across partitions)
    timed(s"flagship sum_axis0 + ${reps}x value check") {
      val bigSums = grouped.sumAxis0
        .select(col(SparseRel.COL), col(SparseRel.VALUE).as("big"))
      val baseSums = SparseRel.scanEvents(base, "event_type",
          Seq("user_id"), Some(Tables.EventTypes)).groupbySum().sumAxis0
        .select(col(SparseRel.COL), col(SparseRel.VALUE).as("small"))
      val bad = bigSums.join(baseSums, SparseRel.COL)
        .filter(abs(col("big") - col("small") * reps) >
          abs(col("small")) * reps * 1e-6 + 1e-6)
        .count()
      require(bad == 0, s"$bad column sums off the ${reps}x closed form")
      bad
    }

    // label-range pruning: loc[lo:hi] must reach the parquet scan as
    // a pushed filter, not a post-scan Filter only
    locally {
      val sliced = coo.locRange("user_id", lit(OFFSET * 3),
        lit(OFFSET * 5 - 1))
      val plan = sliced.df.queryExecution.executedPlan.toString
      require("PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(user_id"
          .r.findFirstIn(plan).isDefined,
        "loc range filter did not push into the parquet scan")
      val n = timed(s"flagship loc_range 2-replica slice")(
        Force.count(sliced.df))
      // [3·OFFSET, 5·OFFSET) covers replicas 3 and 4 exactly (replica
      // ids span [r·OFFSET, r·OFFSET + maxUser], maxUser < OFFSET)
      require(n == baseCooN * 2, s"loc slice cells $n != 2 x $baseCooN")
      println("[rehearsal] flagship loc_range pushed into scan " +
        s"(cells=$n = 2 replicas)")
    }

    // dense pivot: 20 one-hot columns x reps·users rows
    val denseN = timed(s"flagship todense (${reps}x)")(
      Force.count(grouped.toDense))
    val baseDenseN = Force.count(SparseRel.scanEvents(base, "event_type",
      Seq("user_id"), Some(Tables.EventTypes)).groupbySum().toDense)
    require(denseN == baseDenseN * reps,
      s"dense rows $denseN != $reps x $baseDenseN")

    println(s"[rehearsal] flagship sf-equivalent " +
      f"${0.1 * reps}%.0f: ALL closed-form checks passed " +
      s"(cells=$cooN groups=$groupedN dense=$denseN)")
    spark.stop()
  }
}
