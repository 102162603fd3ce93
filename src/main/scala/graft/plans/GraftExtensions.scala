package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{DotProduct, MinHashBandKeys, QuantizeInt8, QuantizedCosine, RollingMinHash64, ShingleHashes, SimHash64, SortedJaccard, WinnowHashes}

/** SQL-surface registration for the engine's native expressions — the
  * `SparkSessionExtensions` integration point (builder guide §custom
  * operator): after registration the dedup/similarity kernels are
  * callable from plain SQL, e.g.
  *
  * {{{
  *   spark.sql("SELECT simhash64(shingle_hashes(text, 3)) FROM docs")
  * }}}
  *
  * Use `withExtensions(new GraftExtensions)` at session build time, or
  * [[GraftExtensions.registerAll]] on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int =
    if (e.foldable) e.eval() match {
      case i: Int => i
      case l: Long if l.isValidInt => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new org.apache.spark.sql.AnalysisException(
        errorClass = "_LEGACY_ERROR_TEMP_3089",
        messageParameters = Map("msg" ->
          s"$what must be an integral constant, got $other"))
    } else throw new org.apache.spark.sql.AnalysisException(
      errorClass = "_LEGACY_ERROR_TEMP_3089",
      messageParameters = Map("msg" -> s"$what must be a constant expression"))

  /** (name, info, builder) triples for every injectable function. */
  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("shingle_hashes",
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "shingle_hashes(text, n)")
        ShingleHashes(args.head, intArg(args(1), "n"))
      }),
    ("minhash_band_keys",
      new ExpressionInfo(classOf[MinHashBandKeys].getName, "minhash_band_keys"),
      (args: Seq[Expression]) => {
        require(args.size == 3, "minhash_band_keys(hashes, k, bands)")
        MinHashBandKeys(args.head, intArg(args(1), "k"), intArg(args(2), "bands"))
      }),
    ("simhash64",
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "simhash64(hashes)")
        SimHash64(args.head)
      }),
    ("dot_product",
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "dot_product(a, b)")
        DotProduct(args.head, args(1))
      }),
    ("rolling_min_hash",
      new ExpressionInfo(classOf[RollingMinHash64].getName, "rolling_min_hash"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "rolling_min_hash(text, w)")
        RollingMinHash64(args.head, intArg(args(1), "w"))
      }),
    ("winnow_hashes",
      new ExpressionInfo(classOf[WinnowHashes].getName, "winnow_hashes"),
      (args: Seq[Expression]) => {
        require(args.size == 3, "winnow_hashes(text, w, g)")
        WinnowHashes(args.head, intArg(args(1), "w"), intArg(args(2), "g"))
      }),
    ("sorted_jaccard",
      // DESCRIBE FUNCTION surfaces the preconditions: inputs must be
      // SORTED DISTINCT (undefined results otherwise); a null element
      // yields NULL (elements are otherwise read as primitive longs)
      new ExpressionInfo(classOf[SortedJaccard].getName, null, "sorted_jaccard",
        "_FUNC_(a, b) - Jaccard |intersect|/|union| of two SORTED DISTINCT " +
          "array<bigint> columns, rounded to 6 decimals; NULL when both " +
          "are empty. Inputs MUST be sorted distinct (as produced by " +
          "shingle_hashes/winnow_hashes or " +
          "array_sort(array_distinct(...))) - results are undefined " +
          "otherwise. A null element yields NULL.",
        "", "", "", "", "", "", ""),
      (args: Seq[Expression]) => {
        require(args.size == 2, "sorted_jaccard(a, b)")
        SortedJaccard(args.head, args(1))
      }),
    ("quantize_int8",
      new ExpressionInfo(classOf[QuantizeInt8].getName, "quantize_int8"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "quantize_int8(v)")
        QuantizeInt8(args.head)
      }),
    ("quantized_cosine",
      new ExpressionInfo(classOf[QuantizedCosine].getName, "quantized_cosine"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "quantized_cosine(a, b)")
        QuantizedCosine(args.head, args(1))
      }),
    // The hyperplane/centroid configs are CONSTANT nested-array
    // literals from SQL (e.g. array(array(1.0d, 0.0d), ...)): the
    // builder folds them driver-side exactly like the Column API
    // passes Scala arrays, so the same codegen'd kernel runs.
    // (bloom_long_hits is deliberately NOT SQL-injectable: its Bloom
    // filter is a driver-built sketch object with no literal form —
    // use TextAnalysis.decontaminate / BloomLongHits.hits.)
    ("lsh_keys",
      new ExpressionInfo(classOf[graft.functions.LshKeys].getName, null, "lsh_keys",
        "_FUNC_(v, planes, multi_probe) - per-table LSH bucket keys of " +
          "array<double> v under constant array<array<array<double>>> " +
          "planes (one matrix per table); multi_probe > 0 appends the " +
          "smallest-margin 1-bit-flip probe keys per table.",
        "", "", "", "", "", "", ""),
      (args: Seq[Expression]) => {
        require(args.size == 3, "lsh_keys(v, planes, multi_probe)")
        graft.functions.LshKeys(args.head,
          tensorArg(args(1), "planes"),
          intArg(args(2), "multi_probe"))
      }),
    ("ivf_cells",
      new ExpressionInfo(classOf[graft.functions.IvfCells].getName, null, "ivf_cells",
        "_FUNC_(v, centroids, n) - 0-based centroid ids of the n " +
          "nearest IVF cells of array<double> v under constant " +
          "array<array<double>> centroids, by dot product.",
        "", "", "", "", "", "", ""),
      (args: Seq[Expression]) => {
        require(args.size == 3, "ivf_cells(v, centroids, n)")
        graft.functions.IvfCells(args.head,
          matrixArg(args(1), "centroids"),
          intArg(args(2), "n"))
      }),
    ("pq_codes",
      new ExpressionInfo(classOf[graft.functions.PqCodes].getName, null, "pq_codes",
        "_FUNC_(v, codebooks) - m-byte product-quantization code blob " +
          "of array<double> v under constant " +
          "array<array<array<double>>> codebooks (one <=256-centroid " +
          "codebook per subspace); v is unit-normalized first, a " +
          "zero-norm or non-finite vector yields NULL.",
        "", "", "", "", "", "", ""),
      (args: Seq[Expression]) => {
        require(args.size == 2, "pq_codes(v, codebooks)")
        graft.functions.PqCodes(args.head, tensorArg(args(1), "codebooks"))
      }),
    ("pq_adc_table",
      new ExpressionInfo(classOf[graft.functions.PqAdcTable].getName, null,
        "pq_adc_table",
        "_FUNC_(qv, codebooks) - per-query ADC lookup table " +
          "(m*ksub doubles) of array<double> qv under constant " +
          "array<array<array<double>>> codebooks; entry j*ksub + c is " +
          "the dot of query subvector j with centroid c.",
        "", "", "", "", "", "", ""),
      (args: Seq[Expression]) => {
        require(args.size == 2, "pq_adc_table(qv, codebooks)")
        graft.functions.PqAdcTable(args.head, tensorArg(args(1), "codebooks"))
      }),
    ("pq_adc_score",
      new ExpressionInfo(classOf[graft.functions.PqAdcScore].getName, null,
        "pq_adc_score",
        "_FUNC_(codes, table) - approximate cosine of a pq_codes blob " +
          "against a pq_adc_table: sum of m table lookups.",
        "", "", "", "", "", "", ""),
      (args: Seq[Expression]) => {
        require(args.size == 2, "pq_adc_score(codes, table)")
        graft.functions.PqAdcScore(args.head, args(1))
      }),
    ("all_finite",
      new ExpressionInfo(classOf[graft.functions.AllFinite].getName, null,
        "all_finite",
        "_FUNC_(v) - TRUE iff every element of array<double> v is " +
          "non-null and finite; NULL for a NULL array.",
        "", "", "", "", "", "", ""),
      (args: Seq[Expression]) => {
        require(args.size == 1, "all_finite(v)")
        graft.functions.AllFinite(args.head)
      }),
    ("bpe_tokens",
      new ExpressionInfo(classOf[graft.functions.BpeTokens].getName, null,
        "bpe_tokens",
        "_FUNC_(text, merges) - BPE tokens of text under a constant " +
          "merge list (array of 2-element array<string> pairs, in " +
          "training order); words split on the ASCII class " +
          "[ \\t\\n\\f\\r]+, each word ends in a </w> marker symbol.",
        "", "", "", "", "", "", ""),
      (args: Seq[Expression]) => {
        require(args.size == 2, "bpe_tokens(text, merges)")
        graft.functions.BpeTokens(args.head, mergesArg(args(1), "merges"))
      }))

  /** Constant BPE merge list from SQL: a foldable
    * array<array<string>> of exact pairs. */
  private def mergesArg(e: Expression, what: String): Array[(String, String)] = {
    import org.apache.spark.sql.types.{ArrayType, StringType}
    def bad(msg: String): Nothing =
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "_LEGACY_ERROR_TEMP_3089",
        messageParameters = Map("msg" -> s"$what $msg"))
    e.dataType match {
      case ArrayType(ArrayType(StringType, _), _)
          if e.foldable && e.eval() != null =>
        val ad = e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        Array.tabulate(ad.numElements()) { i =>
          val p = ad.getArray(i)
          if (p == null || p.numElements() != 2 ||
              p.isNullAt(0) || p.isNullAt(1))
            bad("pairs must be non-null 2-element array<string> entries")
          (p.getUTF8String(0).toString, p.getUTF8String(1).toString)
        }
      case _ => bad("must be a constant non-null array<array<string>> of merge pairs")
    }
  }

  private def matrixArg(e: Expression, what: String): Array[Array[Double]] = {
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    e.dataType match {
      // null-check eval(): a foldable NULL of the right type (e.g.
      // CAST(NULL AS ARRAY<ARRAY<DOUBLE>>)) passes the type/foldable
      // guard but must raise the same clean error, not an NPE
      case ArrayType(ArrayType(DoubleType, _), _) if e.foldable && e.eval() != null =>
        val ad = e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        Array.tabulate(ad.numElements()) { i =>
          val r = ad.getArray(i)
          if (r == null)
            throw new org.apache.spark.sql.AnalysisException(
              errorClass = "_LEGACY_ERROR_TEMP_3089",
              messageParameters = Map("msg" ->
                s"$what must not contain NULL rows"))
          r.toDoubleArray()
        } match {
          case m if m.nonEmpty && m.exists(_.length != m.head.length) =>
            throw new org.apache.spark.sql.AnalysisException(
              errorClass = "_LEGACY_ERROR_TEMP_3089",
              messageParameters = Map("msg" ->
                s"$what must be rectangular (rows of equal length)"))
          case m => m
        }
      case _ => throw new org.apache.spark.sql.AnalysisException(
        errorClass = "_LEGACY_ERROR_TEMP_3089",
        messageParameters = Map("msg" ->
          s"$what must be a constant non-null array<array<double>>"))
    }
  }

  private def tensorArg(e: Expression, what: String): Array[Array[Array[Double]]] = {
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    e.dataType match {
      case ArrayType(ArrayType(ArrayType(DoubleType, _), _), _)
          if e.foldable && e.eval() != null =>
        val ad = e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val t = Array.tabulate(ad.numElements()) { i =>
          val m = ad.getArray(i)
          // a NULL inner matrix/row would NPE below, escaping the
          // clean-analysis-error guarantee — reject it here
          if (m == null)
            throw new org.apache.spark.sql.AnalysisException(
              errorClass = "_LEGACY_ERROR_TEMP_3089",
              messageParameters = Map("msg" ->
                s"$what must not contain NULL matrices"))
          Array.tabulate(m.numElements()) { j =>
            val r = m.getArray(j)
            if (r == null)
              throw new org.apache.spark.sql.AnalysisException(
                errorClass = "_LEGACY_ERROR_TEMP_3089",
                messageParameters = Map("msg" ->
                  s"$what must not contain NULL rows"))
            r.toDoubleArray()
          }
        }
        // empty shapes would surface as raw collection errors from the
        // expression's field initializers (empty.max / head on empty)
        // — keep the SQL surface's clean-analysis-error guarantee
        if (t.isEmpty || t.exists(m => m.isEmpty || m.exists(_.isEmpty)))
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "_LEGACY_ERROR_TEMP_3089",
            messageParameters = Map("msg" ->
              s"$what must be a non-empty constant tensor (no empty matrices or rows)"))
        // ragged matrices would crash per-row on executors (dot loops
        // index by the first row's length) or silently score a prefix
        if (t.exists(m => m.exists(_.length != m.head.length)))
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "_LEGACY_ERROR_TEMP_3089",
            messageParameters = Map("msg" ->
              s"$what matrices must be rectangular (rows of equal length)"))
        t
      case _ => throw new org.apache.spark.sql.AnalysisException(
        errorClass = "_LEGACY_ERROR_TEMP_3089",
        messageParameters = Map("msg" ->
          s"$what must be a constant non-null array<array<array<double>>>"))
    }
  }

  /** Register every function on an already-built session. */
  def registerAll(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
