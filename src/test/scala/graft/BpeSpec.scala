package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.queries.Tables

/** Trained-BPE tokenization: hand-computed merges on the classic
  * Sennrich corpus, greedy-apply ≡ sequential-apply equivalence,
  * round-trip losslessness, and layout-independent training. */
class BpeSpec extends SparkSpecBase {

  private lazy val docs = Tables.documents(spark, sf)

  test("trainBpeMerges reproduces the classic corpus' merges, hand-computed") {
    import spark.implicits._
    // Sennrich et al.'s running example: low×5 lower×2 newest×6 widest×3
    val corpus = Seq(
      (1L, ("low " * 5).trim), (2L, ("lower " * 2).trim),
      (3L, ("newest " * 6).trim), (4L, ("widest " * 3).trim))
      .toDF("doc_id", "text")
    val merges = TextAnalysis.trainBpeMerges(corpus, "doc_id", "text", numMerges = 5)
    // pair counts round 1: (e,s)=(s,t)=(t,</w>)=9 → lexicographic min
    // (e,s); then (es,t)=9; (est,</w>)=9; then (l,o)=(o,w)=7 → (l,o);
    // then (lo,w)=7
    assert(merges.toSeq === Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w")))
    // tokenization under those 5 merges, hand-derived
    val toks = Seq((1L, "low newest")).toDF("doc_id", "text")
      .select(graft.functions.Bpe.tokens(col("text"), merges).as("t"))
      .head().getSeq[String](0)
    assert(toks === Seq("low", "</w>", "n", "e", "w", "est</w>"))
  }

  test("greedy-by-rank application equals sequential apply-in-order") {
    // the GPT-2 greedy and the Sennrich sequential formulations must
    // agree for merges produced by this trainer; check on real corpus
    // words under real trained merges
    val merges = TextAnalysis.trainBpeMerges(docs, "doc_id", "text",
      numMerges = 120)
    def sequential(word: String): Seq[String] = {
      // code points, not UTF-16 chars — the kernel and trainer both
      // split on code points, and this oracle must match them on
      // supplementary characters
      var syms = word.codePoints().toArray
        .map(cp => new String(Character.toChars(cp))).toVector :+ "</w>"
      merges.foreach { case (a, b) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms
    }
    import spark.implicits._
    val words = docs.select(explode(split(col("text"), "\\s+")).as("w"))
      .filter(col("w") =!= "").distinct().limit(200)
      .collect().map(_.getString(0))
    val viaExpr = words.toSeq.toDF("text")
      .select(col("text"), graft.functions.Bpe.tokens(col("text"), merges).as("t"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    words.foreach { w =>
      assert(viaExpr(w) === sequential(w), s"divergence on '$w'")
    }
  }

  test("BPE round-trip is lossless and training is layout-independent") {
    val merges = TextAnalysis.trainBpeMerges(docs, "doc_id", "text")
    assert(merges.nonEmpty)
    // repartitioned input trains the identical merge list (the sample
    // is hash-ordered, not layout-ordered)
    val again = TextAnalysis.trainBpeMerges(docs.repartition(7), "doc_id", "text")
    assert(merges.toSeq === again.toSeq)
    // every fixture doc reconstructs exactly: the expected
    // concatenation is built FROM the split words (word + </w> each),
    // the same construction the token_count_bpe certificate uses
    val ws = graft.functions.Bpe.WsClass
    val t = TextAnalysis.bpeTokens(docs, "doc_id", "text", merges)
      .join(docs.select(col("doc_id"),
        filter(split(col("text"), ws), x => x =!= "").as("w")), Seq("doc_id"))
    val bad = t.filter(array_join(col("tokens"), "") =!=
        array_join(transform(col("w"), x => concat(x, lit("</w>"))), ""))
      .count()
    assert(bad === 0, s"$bad docs failed the BPE round trip")
    // and compression: at least one token per word, never more tokens
    // than characters + per-word markers
    val badBounds = t.filter(col("n_tokens") < col("n_words") ||
        col("n_tokens") > length(array_join(col("w"), "")) + col("n_words"))
      .count()
    assert(badBounds === 0)
  }

  test("BPE certificates survive hostile text: literal </w>, Unicode whitespace, NULL") {
    import spark.implicits._
    val merges = TextAnalysis.trainBpeMerges(docs, "doc_id", "text", numMerges = 50)
    val ws = graft.functions.Bpe.WsClass
    // a</w>b: the marker substring inside a WORD must not confuse the
    // round-trip check (no replace step anywhere); U+2028 is NOT in
    // the ASCII whitespace class, so kernel and verifier both keep it
    // inside the word; NULL text behaves as empty
    val hostile = Seq(
      (1L, "plain words here"),
      (2L, "contains a</w>b marker"),
      (3L, "uni codesep"),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val txt = coalesce(col("text"), lit(""))
    val words = filter(split(txt, ws), x => x =!= "")
    val toks = graft.functions.Bpe.tokens(txt, merges)
    val rows = hostile.select(col("doc_id"), words.as("w"), toks.as("toks"))
      .select(col("doc_id"),
        (array_join(col("toks"), "") ===
          array_join(transform(col("w"), x => concat(x, lit("</w>"))), ""))
          .as("rt"),
        size(col("w")).as("nw"))
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getInt(2)))).toMap
    assert(rows(1L)._1 && rows(2L)._1 && rows(3L)._1 && rows(4L)._1,
      s"round trip must hold on hostile text: $rows")
    assert(rows(3L)._2 === 1, "U+2028/U+000B must NOT split words")
    assert(rows(4L)._2 === 0, "NULL text behaves as empty")
  }
}
