package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.SparseRel
import graft.queries.{CoreQueries, PipelineQueries, QueryDef, Tables}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's README flagship flow (SURVEY §7.1): scan the event
    * log → one-hot the categorical field → groupby-sum per user. */
  def entry(spark: SparkSession): DataFrame =
    SparseRel.scanEvents(Tables.events(spark, "/root/testdata/sf0.001"),
        "event_type", Seq("user_id"), Some(Tables.EventTypes))
      .groupbySum().df

  private def defs: Seq[QueryDef] = CoreQueries.all ++ PipelineQueries.all

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(sql => d.name -> sql)).toMap
}
