package graft

import org.apache.spark.sql.functions._

import graft.operators.ImportanceSampling

/** DSIR importance resampling: the frozen ratio model, the per-doc
  * log-weight fold, the deterministic Gumbel draw, and the
  * distribution-shift property the certificate row gates. */
class ImportanceSamplingSpec extends SparkSpecBase {

  import spark.implicits._

  // tiny corpus where the model math is hand-checkable: target docs
  // (is_t) are all-"x", raw background is all-"y"
  private lazy val tiny = Seq(
    (1L, "x x x", true), (2L, "x x", true),
    (3L, "y y y", false), (4L, "y y y y", false),
    (5L, "x y", false)
  ).toDF("id", "text", "is_t")

  private lazy val model =
    ImportanceSampling.train(tiny, col("is_t"), "text", vocabSize = 8)

  test("log_weight equals the closed-form model recomputed by hand") {
    // counts: raw x=6 y=8 (N=14); target x=5 (N=5); S = |{x,y}|+1 = 3
    val s = 3
    def ln(ct: Long, nt: Long, cr: Long, nr: Long): Double =
      math.log((ct + 0.5) / (nt + 0.5 * s)) - math.log((cr + 0.5) / (nr + 0.5 * s))
    val rx = ln(5, 5, 6, 14)
    val ry = ln(0, 5, 8, 14)
    assert(model.alphabetSize === s)
    assert(math.abs(model.ratio("x") - rx) < 1e-12)
    assert(math.abs(model.ratio("y") - ry) < 1e-12)
    val got = ImportanceSampling.logWeights(tiny, "id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(math.abs(got(1L) - 3 * rx) < 1e-12)
    assert(math.abs(got(4L) - 4 * ry) < 1e-12)
    assert(math.abs(got(5L) - (rx + ry)) < 1e-12)
  }

  test("gumbel draw is the md5 closed form, stable under repartition") {
    val scored = ImportanceSampling.resampleTopK(
      ImportanceSampling.logWeights(tiny, "id", "text", model),
      "id", k = 5, seed = "t")
    val got = scored.collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("gumbel_score")).toMap
    val lw = ImportanceSampling.logWeights(tiny, "id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    got.foreach { case (id, score) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"t$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 4294967296.0
      val expect = lw(id) - math.log(-math.log(u))
      assert(math.abs(score - expect) < 1e-9, s"id=$id")
    }
    val re = ImportanceSampling.resampleTopK(
      ImportanceSampling.logWeights(tiny.repartition(7), "id", "text", model),
      "id", k = 5, seed = "t")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("gumbel_score"))
      .toMap
    assert(re === got)
  }

  test("selection prefers heavy log-weights; a boosted doc always enters") {
    // weight gap >> max Gumbel spread at n=40: +50 in log space makes
    // every target-like doc beat every background doc deterministically
    val docs = ((1L to 20L).map(i => (i, ("x " * 50).trim, true)) ++
      (21L to 40L).map(i => (i, ("y " * 50).trim, false)))
      .toDF("id", "text", "is_t")
    val m = ImportanceSampling.train(docs, col("is_t"), "text", vocabSize = 8)
    val sel = ImportanceSampling.resampleTopK(
        ImportanceSampling.logWeights(docs, "id", "text", m), "id",
        k = 10, seed = "boost")
      .collect().map(_.getAs[Long]("id")).toSet
    assert(sel.forall(_ <= 20L), s"background doc resampled: $sel")
  }

  test("fixture corpus: resampled subset shifts toward the en target") {
    val docs = graft.queries.Tables.documents(spark, sf)
    val m = ImportanceSampling.train(docs, col("lang") === "en", "text")
    val lw = ImportanceSampling.logWeights(docs, "doc_id", "text", m)
      .join(docs.select(col("doc_id"),
        (col("lang") === "en").cast("double").as("is_t")), Seq("doc_id"))
    val sel = ImportanceSampling.resampleTopK(lw, "doc_id", k = 20, seed = "dsir")
    val rawFrac = lw.agg(avg(col("is_t"))).head().getDouble(0)
    val selFrac = sel.agg(avg(col("is_t"))).head().getDouble(0)
    val rawMean = lw.agg(avg(col("log_weight"))).head().getDouble(0)
    val selMean = sel.agg(avg(col("log_weight"))).head().getDouble(0)
    assert(selMean > rawMean, s"no lift: sel=$selMean raw=$rawMean")
    assert(selFrac >= rawFrac, s"no shift: sel=$selFrac raw=$rawFrac")
  }

  test("native RatioSum equals the Column-composed reference fold on random corpora") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // the Column-composed formulation the native kernel replaced —
    // kept as the executable reference (the BigramNll discipline)
    def referenceLw(docs: org.apache.spark.sql.DataFrame,
        m: ImportanceSampling.RatioModel): Map[Long, Option[Double]] = {
      val r = typedLit(m.ratio)
      val v = typedLit(m.vocab)
      val t = transform(split(col("text"), " "),
        w => when(array_contains(v, w), w).otherwise(lit("<unk>")))
      docs.select(col("id"),
          aggregate(t, lit(0.0), (acc, w) => acc + element_at(r, w)).as("lw"))
        .collect().map(row => row.getLong(0) ->
          (if (row.isNullAt(1)) None else Some(row.getDouble(1)))).toMap
    }
    val word = Gen.oneOf("a", "b", "cc", "ddd", "é")
    val genDoc = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    val genCorpus = Gen.choose(3, 10)
      .flatMap(n => Gen.listOfN(n, genDoc))
      .map(_ ++ Seq("", " ", "a  b", " a", "b "))
    (0 until 4).foreach { i =>
      genCorpus.apply(Gen.Parameters.default, Seed(i.toLong)).foreach { texts =>
        val docs = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }
          .toDF("id", "text")
        val m = ImportanceSampling.train(docs, col("id") % 2 === 0, "text",
          vocabSize = 3)
        val native = ImportanceSampling.logWeights(docs, "id", "text", m)
          .collect().map(r2 => r2.getLong(0) ->
            (if (r2.isNullAt(2)) None else Some(r2.getDouble(2)))).toMap
        assert(native === referenceLw(docs, m), s"seed $i diverged")
      }
    }
  }

  test("scoring stays inside whole-stage codegen (no fallback exprs)") {
    // a parquet-backed frame: a local relation would be constant-folded
    // into a LocalTableScan with no Project to inspect
    val docs = graft.queries.Tables.documents(spark, sf)
    val plan = ImportanceSampling.logWeights(docs, "doc_id", "text", model)
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"scoring Project not codegen'd:\n$plan")
  }

  test("bigram log-weight is n*(nll_raw - nll_target) and shifts toward the target") {
    import graft.operators.LanguageModel
    val docs = graft.queries.Tables.documents(spark, sf)
    val lmR = LanguageModel.train(docs, "doc_id", "text")
    val lmT = LanguageModel.train(docs.filter(col("lang") === "en"),
      "doc_id", "text")
    // the composed closed form from the two perplexity relations
    val ref = LanguageModel.perplexity(docs, "doc_id", "text", lmR)
      .select(col("doc_id"), col("n_bigrams"), col("nll").as("nr"))
      .join(LanguageModel.perplexity(docs, "doc_id", "text", lmT)
        .select(col("doc_id"), col("nll").as("nt")), Seq("doc_id"))
      .select(col("doc_id"),
        coalesce(col("n_bigrams") * (col("nr") - col("nt")), lit(0.0))
          .as("lw"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // the single-map-stage formulation the query registers
    def nllOf(m: LanguageModel.BigramLm) =
      graft.functions.LmExprs.bigramNll(col("text"), m.vocab.toArray,
        m.unigrams.toArray, m.bigrams.toArray, m.alphabetSize, m.alpha)
    val n1 = greatest(size(split(col("text"), " ")) - 1, lit(0)).cast("double")
    val got = docs.select(col("doc_id"),
        coalesce(n1 * (nllOf(lmR) - nllOf(lmT)), lit(0.0)).as("lw"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === ref)
    // the en target must score higher on average under its own model
    val byLang = docs.select(col("doc_id"),
        (col("lang") === "en").as("is_t"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val (tgt, rest) = got.partition { case (id, _) => byLang(id) }
    val mt = tgt.values.sum / tgt.size
    val mr = rest.values.sum / rest.size
    assert(mt > mr, s"target docs should weigh more: en=$mt other=$mr")
  }

  test("resample plans as partial top-k, not a global sort") {
    val lw = ImportanceSampling.logWeights(tiny, "id", "text", model)
    val p = ImportanceSampling.resampleTopK(lw, "id", k = 3, seed = "t")
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"no partial top-k:\n$p")
  }
}
