package graft

import org.apache.spark.sql.functions._

import graft.operators.{QualityModel, Sampling, TextAnalysis}
import graft.queries.Tables

class QualityModelSpec extends SparkSpecBase {
  import spark.implicits._

  private def toy(n: Int) = {
    // two linearly separable clusters in 2-D: label = (x0 + x1 > 1)
    val rows = (0 until n).map { i =>
      val x0 = (i % 10) / 10.0
      val x1 = ((i * 7) % 10) / 10.0
      (i.toLong, x0, x1, x0 + x1 > 1.0)
    }
    rows.toDF("id", "x0", "x1", "label")
  }

  test("toy separable clusters: trained model classifies them") {
    val df = toy(400)
    val w = QualityModel.train(df, "id", Seq("x0", "x1"), "label",
      iters = 2000, lr = 2.0)
    val scored = df.withColumn("z",
      QualityModel.linearColumn(w, Seq(col("x0"), col("x1"))))
    val acc = scored
      .agg(avg(when((col("z") >= 0) === col("label"), 1.0).otherwise(0.0)))
      .head.getDouble(0)
    assert(acc >= 0.97, s"toy accuracy $acc")
  }

  test("training is layout-independent and deterministic") {
    val df = toy(300)
    val w1 = QualityModel.train(df, "id", Seq("x0", "x1"), "label")
    val w2 = QualityModel.train(df.repartition(7, col("x1")), "id",
      Seq("x0", "x1"), "label")
    val w3 = QualityModel.train(df.orderBy(col("x0").desc), "id",
      Seq("x0", "x1"), "label")
    assert(w1.bias == w2.bias && w1.w.sameElements(w2.w))
    assert(w1.bias == w3.bias && w1.w.sameElements(w3.w))
  }

  test("constant feature survives (sd=0 path, no NaN)") {
    val df = toy(100).withColumn("c", lit(5.0))
    val w = QualityModel.train(df, "id", Seq("x0", "c", "x1"), "label")
    assert(!w.bias.isNaN && w.w.forall(v => !v.isNaN))
    assert(w.w(1) == 0.0, "constant feature must carry zero weight")
  }

  test("score is sigmoid of the linear term; decision is its sign") {
    val docs = Seq((1L, "alpha beta gamma delta"),
      (2L, "the the the the the the")).toDF("doc_id", "text")
    val w = QualityModel.Weights(-1.0, Array(2.0, -3.0, 4.0, 0.25))
    val feats = QualityModel.features(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val scored = QualityModel.score(docs, "doc_id", "text", w)
      .orderBy("doc_id").collect()
    for ((f, s) <- feats.zip(scored)) {
      val z = w.bias + (0 until 4).map(j => w.w(j) * f.getDouble(1 + j)).sum
      assert(math.abs(s.getDouble(1) - 1.0 / (1.0 + math.exp(-z))) < 1e-12)
      assert(s.getBoolean(2) == (z >= 0))
    }
  }

  test("regex stopword count == higher-order filter count (fixture-wide)") {
    val docs = Tables.documents(spark, sf)
    val t = split(col("text"), " ")
    val hof = size(filter(t,
      x => x.isin(Seq("a", "the", "and", "of", "to"): _*))).cast("double")
    val regex = regexp_count(col("text"),
      lit("(?:^| )(?:a|the|and|of|to)(?= |$)")).cast("double")
    val mismatches = docs
      .agg(sum(when(hof =!= regex, 1L).otherwise(0L))).head.getLong(0)
    assert(mismatches == 0)
  }

  test("scoring stays inside whole-stage codegen (no fallback exprs)") {
    val docs = Tables.documents(spark, sf)
    val w = QualityModel.Weights(-1.0, Array(2.0, -3.0, 4.0, 0.25))
    val plan = QualityModel.score(docs, "doc_id", "text", w)
      .queryExecution.executedPlan.toString
    // the scoring Project must carry the codegen star — a fallback
    // expression (e.g. a higher-order ArrayFilter) would drop it
    assert(plan.contains("*(1) Project"), s"scoring Project not codegen'd:\n$plan")
  }

  test("fixture: heldout accuracy of the trained gate >= 0.9") {
    val docs = Tables.documents(spark, sf)
    val labeled = docs
      .join(TextAnalysis.qualityScore(docs, "doc_id", "text"), Seq("doc_id"))
      .withColumn("good", col("quality") >= 0.451117)
      .withColumn("is_train",
        Sampling.hashDraw(col("doc_id")) < lit(Sampling.hexThreshold(0.5)))
    val feats = QualityModel.features(docs, "doc_id", "text")
    val w = QualityModel.train(
      labeled.filter(col("is_train")).select(col("doc_id"), col("good"))
        .join(feats, Seq("doc_id")),
      "doc_id", QualityModel.featureColumns(col("text")).map(_._1), "good")
    val acc = labeled.filter(!col("is_train"))
      .join(QualityModel.score(docs, "doc_id", "text", w), Seq("doc_id"))
      .agg(avg(when(col("predicted_good") === col("good"), 1.0).otherwise(0.0)))
      .head.getDouble(0)
    assert(acc >= 0.9, s"heldout accuracy $acc") // observed 0.972
  }
}
