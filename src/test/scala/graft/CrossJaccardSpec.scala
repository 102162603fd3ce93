package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Cross-corpus fuzzy decontamination: the prefix-filtered join must
  * return EXACTLY the naive cross inverted-index result, catch planted
  * paraphrase leakage, and respect threshold/short-doc semantics. */
class CrossJaccardSpec extends SparkSpecBase {

  import spark.implicits._

  /** Naive reference: full cross Jaccard over distinct 3-gram shingle
    * sets, no prefix filter — the definitional result. */
  private def naive(corpus: DataFrame, evalDocs: DataFrame,
      threshold: Double): Set[(Long, Long, Double)] = {
    def sets(d: DataFrame, idCol: String): Map[Long, Set[String]] =
      d.select(col(idCol), Dedup.shingles(col("text"), 3).as("sh"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
        .filter(_._2.nonEmpty).toMap
    val c = sets(corpus, "doc_id")
    val e = sets(evalDocs, "eval_id")
    (for {
      (dc, sc) <- c.toSeq; (de, se) <- e.toSeq
      j = (sc & se).size.toDouble / (sc | se).size
      if j >= threshold
    } yield (dc, de, math.rint(j * 1e6) / 1e6)).toSet
  }

  private def got(corpus: DataFrame, evalDocs: DataFrame,
      threshold: Double): Set[(Long, Long, Double)] =
    Dedup.crossNgramJaccard(corpus, "doc_id", evalDocs, "eval_id", "text",
        shingleN = 3, threshold = threshold)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e6) / 1e6)).toSet

  test("equals the naive cross inverted-index result on the fixture") {
    val docs = graft.queries.Tables.documents(spark, sf)
    val eval = docs.filter(col("doc_id") % 17 === 0)
      .select(col("doc_id").as("eval_id"), col("text"))
    Seq(0.5, 0.8).foreach { t =>
      assert(got(docs, eval, t) === naive(docs, eval, t), s"threshold $t")
    }
  }

  test("catches planted paraphrase leakage; id spaces stay independent") {
    val bench = Seq((1L, "the quick brown fox jumps over the lazy dog near the old river bank today"))
      .toDF("eval_id", "text")
    // doc 1 = one-word edit of bench 1 (J well above 0.8 on 3-grams is
    // false — one word flips 3 shingles of ~12; use a tail append
    // instead); doc 2 = unrelated; doc 1 shares the EVAL id value 1
    // on purpose: distinct id spaces must not self-exclude
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the old river bank today and tomorrow"),
      (2L, "completely different text about query engines and shuffle exchanges at scale")
    ).toDF("doc_id", "text")
    val hits = got(corpus, bench, 0.8)
    assert(hits.map(h => (h._1, h._2)) === Set((1L, 1L)),
      s"expected exactly the planted leak, got $hits")
    assert(hits.head._3 >= 0.8 && hits.head._3 < 1.0)
  }

  test("short documents and empty eval sets produce empty results") {
    val corpus = Seq((1L, "a b"), (2L, "a b c d e")).toDF("doc_id", "text")
    val evalShort = Seq((9L, "x y")).toDF("eval_id", "text")
    assert(got(corpus, evalShort, 0.8) === Set.empty)
    val evalNone = Seq.empty[(Long, String)].toDF("eval_id", "text")
    assert(got(corpus, evalNone, 0.8) === Set.empty)
  }
}
