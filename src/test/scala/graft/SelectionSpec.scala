package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Selection

/** Budget-constrained selection: the bucket-pruned two-pass result
  * must equal the single-window prefix definition exactly. */
class SelectionSpec extends SparkSpecBase {

  /** Reference: the definitional global-window prefix. */
  private def prefix(df: DataFrame, budget: Long): Set[Long] = {
    val w = Window.orderBy(col("score").desc, col("id"))
    df.withColumn("__cum", sum(col("cost")).over(w))
      .filter(col("__cum") <= budget)
      .collect().map(_.getAs[Long]("id")).toSet
  }

  private def got(df: DataFrame, budget: Long, buckets: Int = 8): Set[Long] =
    Selection.selectByBudget(df, "id", "score", "cost", budget, buckets)
      .collect().map(_.getAs[Long]("id")).toSet

  test("equals the window-prefix definition on the fixture corpus") {
    import graft.operators.TextAnalysis
    val docs = graft.queries.Tables.documents(spark, sf)
    val scored = TextAnalysis.qualityScore(docs, "doc_id", "text")
      .join(TextAnalysis.tokenCount(docs, "doc_id", "text")
        .select(col("doc_id"), col("ws_tokens")), Seq("doc_id"))
      .select(col("doc_id").as("id"), col("quality").as("score"),
        col("ws_tokens").as("cost"))
    Seq(0L, 500L, 2000L, 1000000L).foreach { b =>
      assert(got(scored, b, buckets = 16) === prefix(scored, b),
        s"budget $b diverged")
    }
  }

  test("tie groups never split across the bucket boundary") {
    import spark.implicits._
    // many ids share score 0.5; cut the budget mid-tie-group so the
    // prefix ends INSIDE the equal-score run — bucketing by value must
    // hand the whole run to the exact boundary sort
    val df = ((1L to 20L).map(i => (i, 0.5, 10L)) ++
        Seq((21L, 0.9, 10L), (22L, 0.1, 10L)))
      .toDF("id", "score", "cost")
    Seq(10L, 45L, 100L, 220L).foreach { b =>
      assert(got(df, b, buckets = 4) === prefix(df, b), s"budget $b diverged")
    }
  }

  test("degenerate shapes: constant score, everything fits, zero-cost rows") {
    import spark.implicits._
    val const = (1L to 9L).map(i => (i, 1.0, 5L)).toDF("id", "score", "cost")
    assert(got(const, 20L) === prefix(const, 20L)) // one bucket total
    assert(got(const, 1000L) === (1L to 9L).toSet) // everything-fits path
    // zero-cost rows ride along inside the prefix for free
    val zeros = Seq((1L, 0.9, 0L), (2L, 0.8, 5L), (3L, 0.7, 0L), (4L, 0.6, 5L))
      .toDF("id", "score", "cost")
    assert(got(zeros, 5L) === prefix(zeros, 5L))
    assert(got(zeros, 0L) === prefix(zeros, 0L))
  }
}
