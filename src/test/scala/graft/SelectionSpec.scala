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

  /** Reference for the mixture variant: the definitional per-label
    * window prefix over (md5(id), id) order. */
  private def mixPrefix(df: DataFrame, budgets: Map[String, Long]): Set[Long] = {
    val w = Window.partitionBy(col("label"))
      .orderBy(md5(col("id").cast("string")), col("id"))
    val b = spark.createDataFrame(budgets.toSeq).toDF("label", "__budget")
    df.join(b, Seq("label"))
      .withColumn("__cum", sum(col("cost")).over(w))
      .filter(col("__cum") <= col("__budget"))
      .collect().map(_.getAs[Long]("id")).toSet
  }

  test("mixTokenBudget equals the per-label window-prefix definition") {
    import spark.implicits._
    val df = (1L to 300L).map(i =>
        (i, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c", 10L))
      .toDF("id", "label", "cost")
    val cases = Seq(
      Map("a" -> 200L, "b" -> 555L, "c" -> 1000000L), // binding, mid-row, all
      Map("a" -> 0L, "b" -> 10L),                     // empty / one row / dropped label
      Map("a" -> 1000000L, "b" -> 1000000L, "c" -> 1000000L))
    cases.foreach { budgets =>
      val got = Selection.mixTokenBudget(df, "id", "label", "cost", budgets)
        .collect().map(_.getAs[Long]("id")).toSet
      assert(got === mixPrefix(df, budgets), s"budgets $budgets diverged")
      // labels outside the budget map must not leak through
      assert(Selection.mixTokenBudget(df, "id", "label", "cost", budgets)
        .select(col("label")).distinct().collect().map(_.getString(0)).toSet
        .subsetOf(budgets.keySet))
    }
  }

  test("mixTokenBudget rejects negative costs and preserves input columns") {
    import spark.implicits._
    val bad = Seq((1L, "a", -5L)).toDF("id", "label", "cost")
    assertThrows[IllegalArgumentException] {
      Selection.mixTokenBudget(bad, "id", "label", "cost", Map("a" -> 10L))
    }
    val ok = Seq((1L, "a", 5L, "extra")).toDF("id", "label", "cost", "payload")
    val out = Selection.mixTokenBudget(ok, "id", "label", "cost", Map("a" -> 10L))
    assert(out.columns.toSeq === Seq("id", "label", "cost", "payload"))
    assert(out.count() === 1L)
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
