package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time ("as-of") join — the canonical operator Spark lacks
  * natively (builder guide's own example). For every left row, attach
  * the LATEST right row with `right.ts <= left.ts` per key.
  *
  * Implementation is preference-order (a): composed from built-ins —
  * tag both sides, union, and carry the last right value forward with
  * one `last(..., ignoreNulls)` window per key ordered by (ts, side).
  * ONE shuffle + sort, regardless of how many left rows match each
  * right row — versus the naive range-join + aggregation, which
  * explodes to |left|×|matching right| intermediates. This is the
  * shape that survives 100 TB: it is exactly a sort-merge pass.
  *
  * Right keys must be unique per (key, ts) — pre-aggregate if not
  * (ties at identical timestamps would otherwise be arbitrary). At
  * equal timestamps the right row is visible to the left row
  * (`<=` semantics, side ordering pins it deterministically). A right
  * row whose value is NULL still "wins" as the latest row (the carried
  * payload rides in a non-null struct, so `ignoreNulls` only skips
  * rows, never NULL payloads — matching ASOF JOIN semantics).
  */
object AsOf {

  /** `left` gains `valueCol` from the latest `right` row at-or-before
    * its timestamp (NULL when no prior right row exists).
    *
    * @param keys   equi-join key columns (both sides)
    * @param tsCol  event-time column name (both sides)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, valueCol: String, outCol: String): DataFrame = {
    val leftCols = left.columns
    require(!leftCols.contains("__rv") && !leftCols.contains("__side"),
      "left must not contain reserved columns __rv/__side")
    require(!leftCols.contains(outCol), s"outCol '$outCol' already exists in left")
    val rvType = right.schema(valueCol).dataType
    // side 0 = right, sorts before side 1 = left at equal ts, so a
    // same-timestamp right row is visible (<= semantics). The payload
    // is wrapped so a NULL right value is still a present row.
    val taggedLeft = left
      .withColumn("__rv",
        lit(null).cast(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("v", rvType)))))
      .withColumn("__side", lit(1))
    val taggedRight = {
      val base = right.select(
        (keys.map(col) :+ col(tsCol) :+ struct(col(valueCol).as("v")).as("__rv")): _*)
      // null out every left-only column, union-compatible by name
      leftCols.filterNot(c => keys.contains(c) || c == tsCol)
        .foldLeft(base)((d, c) =>
          d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
        .withColumn("__side", lit(0))
    }
    val unioned = taggedLeft.unionByName(taggedRight.select(taggedLeft.columns.toIndexedSeq.map(col): _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(outCol,
        last(col("__rv"), ignoreNulls = true).over(w).getField("v"))
      .filter(col("__side") === 1)
      .select((leftCols.toIndexedSeq.map(col) :+ col(outCol)): _*)
  }
}
