package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** How to align row-index sets when combining two frames.
  *
  * Mirrors the `how` argument of the reference's `join`/`add`
  * (reference: sparsity/sparse_frame.py:243-245, 319-337).
  */
sealed trait AlignHow { def name: String }
object AlignHow {
  case object Outer extends AlignHow { val name = "outer" }
  case object Inner extends AlignHow { val name = "inner" }
  case object Left  extends AlignHow { val name = "left"  }
  case object Right extends AlignHow { val name = "right" }
  def of(s: String): AlignHow = s.toLowerCase match {
    case "outer" => Outer
    case "inner" => Inner
    case "left"  => Left
    case "right" => Right
    case other   => throw new IllegalArgumentException(s"unknown how: $other")
  }
}

/** A distributed sparse 2-D table in COO ("long") form.
  *
  * The logical model follows the reference's `SparseFrame`
  * (reference: sparsity/sparse_frame.py:39-45): a matrix with labelled
  * rows (`indexCols` — one column, or several for a MultiIndex), labelled
  * columns (`columnUniverse` — the ordered lexicon, which may contain
  * labels for which no cell is stored), and homogeneous double values
  * where an *absent* cell means exactly 0.0, never NULL.
  *
  * Physical representation is a long/COO `DataFrame` with schema
  * `(<indexCols...>, col: string, value: double)`. This replaces the
  * reference's CSR matrix + sentinel zero row trick
  * (sparse_frame.py:125-134): in COO form absence already *is* zero, so
  * outer alignment never needs NULL handling — only a `coalesce(v, 0.0)`
  * at dense materialization.
  *
  * All operators are pure Catalyst-optimizable DataFrame transforms:
  * filters push down to the parquet scan, aggregations get map-side
  * partial combine, joins pick broadcast/sort-merge via AQE. Nothing
  * here collects to the driver except explicit validation counts.
  */
final case class SparseRel(
    df: DataFrame,
    indexCols: Seq[String],
    columnUniverse: Seq[String]) {

  require(indexCols.nonEmpty, "SparseRel needs at least one index column")

  import SparseRel._

  /** Column expressions for the row key. */
  private def keyCols: Seq[Column] = indexCols.map(df.col)

  /** Logical shape: (#distinct row labels, #columns in the universe).
    * (reference: sparse_frame.py:58,127). Triggers a job for rows. */
  def shape: (Long, Int) =
    (df.select(indexCols.map(col): _*).distinct().count(), columnUniverse.size)

  /** Count of stored non-zero cells (reference: sparse_frame.py:162-163). */
  def nnz: Long = df.filter(col(VALUE) =!= 0.0).count()

  // ------------------------------------------------------------------
  // Projections / filters (SURVEY §2.2)
  // ------------------------------------------------------------------

  /** Column projection preserving requested order
    * (reference: sparse_frame.py:460-467). Unknown labels are an error,
    * like pandas `__getitem__`. */
  def projectCols(names: Seq[String]): SparseRel = {
    val missing = names.filterNot(columnUniverse.contains)
    require(missing.isEmpty, s"unknown columns: ${missing.mkString(",")}")
    copy(df = df.filter(col(COL).isin(names: _*)), columnUniverse = names)
  }

  /** Label-range row selection, *inclusive* of both endpoints like a
    * pandas `.loc[a:b]` label slice (reference: sparsity/indexing.py:3-11;
    * test_sparse_frame.py:159-171). Operates on one index level. */
  def locRange(level: String, lo: Column, hi: Column): SparseRel =
    copy(df = df.filter(col(level) >= lo && col(level) <= hi))

  /** Single-label row selection (`.loc[k]`). */
  def locKey(level: String, k: Column): SparseRel =
    copy(df = df.filter(col(level) === k))

  /** Boolean-mask row selection (`.loc[mask]`,
    * test_sparse_frame.py:438-443): any Column predicate over index cols. */
  def filterRows(pred: Column): SparseRel = copy(df = df.filter(pred))

  /** Positional head — the reference's `iloc[:n]` / `head(n)`
    * (sparse_frame.py:382-387). Spark rows have no stable position, so
    * positions are defined against the sorted index (documented
    * deviation, SURVEY §7.0). Ranking runs in one window over the
    * distinct *row labels* (small), then semi-joins back — avoids a
    * global sort of the full COO set. */
  def takeRows(n: Int): SparseRel = {
    val w = Window.orderBy(indexCols.map(col): _*)
    val keep = df.select(indexCols.map(col): _*).distinct()
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
    copy(df = df.join(keep, indexCols, "left_semi"))
  }

  /** Drop rows whose index label is NULL/NaN
    * (reference: sparse_frame.py:469-474 — values carry no NULLs by
    * construction, only labels can be missing). */
  def dropnaIndex(): SparseRel = {
    val pred = indexCols.map { c =>
      val base = col(c).isNotNull
      // isnan only applies to floating types; guard by data type.
      df.schema(c).dataType match {
        case org.apache.spark.sql.types.DoubleType |
             org.apache.spark.sql.types.FloatType => base && !isnan(col(c))
        case _ => base
      }
    }.reduce(_ && _)
    copy(df = df.filter(pred))
  }

  /** Keep the first row per duplicated index label
    * (reference: sparse_frame.py:454-458). "First" is pinned by an
    * explicit deterministic ordering column since Spark has no row
    * order (SURVEY §7.4). Keeps *whole logical rows*: ranks the
    * distinct (key, ord) pairs, then semi-joins the winners back. */
  def dropDupIdx(dedupKey: Seq[String], orderBy: Seq[Column]): SparseRel = {
    val w = Window.partitionBy(dedupKey.map(col): _*).orderBy(orderBy: _*)
    val keep = df.select(indexCols.map(col): _*).distinct()
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    copy(df = df.join(keep, indexCols, "left_semi"))
  }

  /** Rename columns through a total function
    * (reference: sparse_frame.py:290-300). The rename is applied to both
    * the stored COO labels and the universe metadata. */
  def renameCols(f: String => String): SparseRel = {
    val mapping = columnUniverse.map(c => c -> f(c))
    val m = map(mapping.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    copy(
      df = df.withColumn(COL, element_at(m, col(COL))),
      columnUniverse = mapping.map(_._2))
  }

  /** Re-key the frame through a mapping relation `(oldKey..., newKey...)`
    * (reference `set_index`, sparse_frame.py:476-494). At scale: if the
    * mapping is small, mark it broadcastable at the call site. */
  def setIndexFrom(mapping: DataFrame, newIndexCols: Seq[String]): SparseRel =
    copy(
      df = df.join(mapping, indexCols)
        .select((newIndexCols.map(col) :+ col(COL) :+ col(VALUE)): _*),
      indexCols = newIndexCols)

  /** Keep a subset of MultiIndex levels as the new index
    * (`set_index(level=...)`, sparse_frame.py:476-494). Cells with now-
    * identical keys remain distinct COO entries; aggregate explicitly
    * via [[groupbySum]] if a canonical frame is needed. */
  def setIndexLevel(levels: Seq[String]): SparseRel = {
    require(levels.forall(indexCols.contains), "unknown index level")
    copy(
      df = df.select((levels.map(col) :+ col(COL) :+ col(VALUE)): _*),
      indexCols = levels)
  }

  /** Sort rows by index label (reference: sparse_frame.py:306-317).
    * In Spark ordering is a property of the output, not the frame;
    * exposed for parity and for deterministic materialization. */
  def sortIndex(): SparseRel = copy(df = df.orderBy(indexCols.map(col): _*))

  // ------------------------------------------------------------------
  // Aggregations (SURVEY §2.4)
  // ------------------------------------------------------------------

  /** The flagship: group rows by key and sum each column
    * (reference: sparse_frame.py:199-231, the sparse-GEMM trick).
    * Spark's hash aggregate with map-side partial combine over COO rows
    * is the idiomatic equivalent: one shuffle on (key..., col), never a
    * densified intermediate. */
  def groupbySum(): SparseRel =
    copy(df = df.groupBy((indexCols.map(col) :+ col(COL)): _*)
      .agg(sum(VALUE).as(VALUE)))

  /** Group by a subset of index levels (reference `groupby_sum(level=)`,
    * sparse_frame.py:218-227). */
  def groupbySumLevel(levels: Seq[String]): SparseRel =
    setIndexLevel(levels).groupbySum()

  /** Group by an external key expression over the index
    * (reference `groupby_sum(by=array)`, sparse_frame.py:218-227). */
  def groupbySumBy(key: Column, keyName: String): SparseRel =
    copy(
      df = df.groupBy(key.as(keyName), col(COL)).agg(sum(VALUE).as(VALUE)),
      indexCols = Seq(keyName))

  /** Per-column sums, axis=0 (reference: sparse_frame.py:143-156). */
  def sumAxis0: DataFrame = df.groupBy(col(COL)).agg(sum(VALUE).as(VALUE))

  /** Per-column mean over the *logical* row count — zeros included, like
    * scipy's matrix mean, not nnz (SURVEY §2.4 A2 caveat). */
  def meanAxis0: DataFrame = {
    val n = df.select(indexCols.map(col): _*).distinct().count()
    df.groupBy(col(COL)).agg((sum(VALUE) / lit(n.toDouble)).as(VALUE))
  }

  /** Per-row sums, axis=1. */
  def sumAxis1: DataFrame =
    df.groupBy(indexCols.map(col): _*).agg(sum(VALUE).as(VALUE))

  // ------------------------------------------------------------------
  // Alignment algebra (SURVEY §2.3 / §2.6)
  // ------------------------------------------------------------------

  /** Restrict this frame's rows to the index set dictated by `how`.
    * Inner/left/right use distinct-key semi-joins; Spark broadcasts the
    * key set automatically when small (AQE), so the common small-dim
    * case costs no extra shuffle. */
  private def restrictKeys(a: DataFrame, b: DataFrame, how: AlignHow): DataFrame = {
    def keysOf(d: DataFrame) = d.select(indexCols.map(col): _*).distinct()
    how match {
      case AlignHow.Outer => a.unionByName(b)
      case AlignHow.Inner =>
        val shared = keysOf(a).join(keysOf(b), indexCols, "left_semi")
        a.unionByName(b).join(shared, indexCols, "left_semi")
      case AlignHow.Left =>
        a.unionByName(b.join(keysOf(a), indexCols, "left_semi"))
      case AlignHow.Right =>
        a.join(keysOf(b), indexCols, "left_semi").unionByName(b)
    }
  }

  /** Index-aligned elementwise addition (reference: sparse_frame.py:319-337;
    * zero-fill semantics test_sparse_frame.py:293-342). Requires equal
    * column universes like the reference (sparse_frame.py:331). In COO
    * form aligned addition IS a grouped sum of the unioned cell sets —
    * rows present on one side pass through unchanged because the missing
    * side contributes nothing (= 0). */
  def add(other: SparseRel, how: AlignHow = AlignHow.Outer): SparseRel = {
    require(columnUniverse == other.columnUniverse,
      "add requires identical column universes")
    require(indexCols == other.indexCols, "add requires identical index")
    copy(df = restrictKeys(df, other.df, how)
      .groupBy((indexCols.map(col) :+ col(COL)): _*)
      .agg(sum(VALUE).as(VALUE)))
  }

  /** Index-aligned horizontal join, the reference's only real join
    * (`join(axis=1)`, sparse_frame.py:233-288): concatenate two frames'
    * columns over the `how`-aligned row set; a row missing on one side
    * yields zeros for that side's columns (pandas oracle
    * `.join(...).fillna(0)`, test_sparse_frame.py:81-100).
    *
    * Column universes must be disjoint (the reference assumes this for
    * hstack; overlapping labels would be ambiguous cells). In COO form
    * the join is a union of cell sets restricted to the aligned keys —
    * no wide shuffle at all for `outer`. */
  def joinAxis1(other: SparseRel, how: AlignHow = AlignHow.Outer): SparseRel = {
    require(indexCols == other.indexCols, "joinAxis1 requires same index")
    val overlap = columnUniverse.intersect(other.columnUniverse)
    require(overlap.isEmpty, s"overlapping columns: ${overlap.mkString(",")}")
    copy(
      df = restrictKeys(df, other.df, how),
      columnUniverse = columnUniverse ++ other.columnUniverse)
  }

  /** Vertical concatenation (reference `vstack`, sparse_frame.py:496-507):
    * requires identical column sets, concatenates row sets. Duplicate
    * index labels are allowed, as in the reference. */
  def vstack(other: SparseRel): SparseRel = {
    require(columnUniverse == other.columnUniverse,
      "vstack requires identical column universes")
    require(indexCols == other.indexCols, "vstack requires identical index")
    copy(df = df.unionByName(other.df))
  }

  // ------------------------------------------------------------------
  // Column maintenance (SURVEY §2.5 R3)
  // ------------------------------------------------------------------

  /** Append a NEW column with a broadcast scalar value for every row
    * label (reference `assign`, sparse_frame.py:423-452; assigning an
    * existing column is an error there too). */
  def assignScalar(name: String, value: Double): SparseRel = {
    require(!columnUniverse.contains(name), s"column exists: $name")
    val newCells = df.select(indexCols.map(col): _*).distinct()
      .withColumn(COL, lit(name))
      .withColumn(VALUE, lit(value))
    copy(df = df.unionByName(newCells), columnUniverse = columnUniverse :+ name)
  }

  /** Append a NEW column from a relation `(indexCols..., value)`. */
  def assignFrom(name: String, values: DataFrame): SparseRel = {
    require(!columnUniverse.contains(name), s"column exists: $name")
    val cells = values.select(
      (indexCols.map(col) :+ lit(name).as(COL) :+ col(VALUE).cast("double").as(VALUE)): _*)
    copy(df = df.unionByName(cells), columnUniverse = columnUniverse :+ name)
  }

  // ------------------------------------------------------------------
  // Materialization (SURVEY §2.11)
  // ------------------------------------------------------------------

  /** Dense ("wide") materialization: one output column per universe
    * label, absent cells as literal 0.0 (the reference's `todense`,
    * sparse_frame.py:102-123). Pivot with the *explicit* universe list —
    * no extra distinct-scan job, and all-zero declared columns survive
    * (test_sparse_frame.py:353-363). */
  def toDense: DataFrame = {
    val pivoted = df.groupBy(indexCols.map(col): _*)
      .pivot(COL, columnUniverse)
      .agg(sum(VALUE))
    columnUniverse.foldLeft(pivoted) { (d, c) =>
      d.withColumn(c, coalesce(col(c), lit(0.0)))
    }
  }
}

object SparseRel {
  /** Schema contract for the COO DataFrame. */
  val COL = "col"
  val VALUE = "value"

  /** Construct from an already-COO relation. */
  def fromCoo(coo: DataFrame, indexCols: Seq[String],
      columnUniverse: Seq[String]): SparseRel =
    SparseRel(
      coo.select((indexCols.map(coo.col) :+
        coo.col(COL).cast("string").as(COL) :+
        coo.col(VALUE).cast("double").as(VALUE)): _*),
      indexCols, columnUniverse)

  /** One-hot encode a categorical column of a dense relation against an
    * explicit category list (reference `sparse_one_hot`,
    * sparse_frame.py:567-601): each input row becomes one COO cell
    * `(index..., category, 1.0)`.
    *
    *  - A category value present in the data but absent from
    *    `categories` is a hard error, like the reference's
    *    `ValueError` (sparse_frame.py:591-594) — validated with one
    *    cheap aggregate over the distinct values, not a row scan
    *    collect.
    *  - Categories absent from the data still live in the returned
    *    universe (all-zero columns survive, test_sparse_frame.py:353-363).
    */
  def oneHot(dense: DataFrame, column: String, categories: Seq[String],
      indexCols: Seq[String], validate: Boolean = true): SparseRel = {
    if (validate) {
      val unseen = dense.select(col(column)).distinct()
        .filter(!col(column).isin(categories: _*))
        .limit(1).collect()
      if (unseen.nonEmpty)
        throw new IllegalArgumentException(
          s"unseen category in '$column': ${unseen.head.get(0)}")
    }
    SparseRel(
      dense.select((indexCols.map(col) :+
        col(column).cast("string").as(COL) :+
        lit(1.0).as(VALUE)): _*),
      indexCols, categories)
  }

  /** Event-log scan → one-hot COO frame, the Spark-native equivalent of
    * the reference's TrailDB C scan (`read_traildb`,
    * sparsity/io.py:10-24 + src/traildb_coo.c:12-115): one matrix row
    * per event, columns = lexicon of the chosen field, value 1.0, index
    * = (uuid, timestamp) ↦ here (user_id, ts). The C hashtable
    * dict-encode (traildb_coo.c:59-76) is unnecessary: the string field
    * value itself is the COO column key and parquet dictionary-encodes
    * it at rest. Lexicon order is lexicographic, not first-seen
    * (documented deviation, SURVEY §3.3). */
  def scanEvents(spark: SparkSession, eventsPath: String, field: String,
      indexCols: Seq[String]): SparseRel = {
    val ev = spark.read.parquet(eventsPath)
    val lexicon = ev.select(col(field).cast("string")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    oneHot(ev, field, lexicon, indexCols, validate = false)
  }

  /** Fold of joinAxis1/vstack over a collection (reference `concat`,
    * sparse_frame.py:394-398). */
  def concat(frames: Seq[SparseRel], axis: Int,
      how: AlignHow = AlignHow.Outer): SparseRel = {
    require(frames.nonEmpty, "concat of empty collection")
    axis match {
      case 1 => frames.reduce(_.joinAxis1(_, how))
      case 0 => frames.reduce(_.vstack(_))
      case other => throw new IllegalArgumentException(s"axis=$other")
    }
  }
}
