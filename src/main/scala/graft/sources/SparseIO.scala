package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.SparseRel

/** Persistence for [[SparseRel]] — the Spark-native replacement for the
  * reference's npz round-trip (`to_npz`/`read_npz`,
  * sparsity/sparse_frame.py:509-516 + sparsity/io.py:26-47), which stored
  * `data/indices/indptr/shape/frame_index/frame_columns`.
  *
  * Layout: `<path>/data/` holds the COO cells as parquet (columnar,
  * min/max row-group stats, splittable for parallel reads — the
  * distributed analogue of dask `read_npz(glob)`, dask/io.py:51-112);
  * `<path>/_sparse_meta.json` is a tiny sidecar carrying what parquet
  * cannot: the ordered column universe (including all-zero columns,
  * test_sparse_frame.py:353-363) and the index column names.
  *
  * Writes are range-partitioned and sorted by the index so that a
  * subsequent `locRange` prunes row groups via parquet min/max — the
  * same benefit the dask layer gets from sorted divisions
  * (dask/io.py:38-48).
  */
object SparseIO {

  private val META = "_sparse_meta.json"

  def write(rel: SparseRel, path: String, rangePartitions: Int = 0): Unit = {
    val out =
      if (rangePartitions > 0)
        rel.df.repartitionByRange(rangePartitions, rel.indexCols.map(col): _*)
          .sortWithinPartitions(rel.indexCols.map(col): _*)
      else rel.df
    out.write.mode("overwrite").parquet(s"$path/data")
    val meta = metaJson(rel)
    Files.write(Paths.get(path, META), meta.getBytes(StandardCharsets.UTF_8))
  }

  def read(spark: SparkSession, path: String): SparseRel = {
    val meta = new String(
      Files.readAllBytes(Paths.get(path, META)), StandardCharsets.UTF_8)
    val (indexCols, universe) = parseMeta(meta)
    SparseRel(spark.read.parquet(s"$path/data"), indexCols, universe)
  }

  // Minimal hand-rolled JSON — the only values are arrays of strings and
  // every name is builder-controlled; escaping covers quotes/backslash.
  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def arr(xs: Seq[String]): String =
    xs.map(x => "\"" + esc(x) + "\"").mkString("[", ",", "]")

  private def metaJson(rel: SparseRel): String =
    s"""{"indexCols":${arr(rel.indexCols)},"columnUniverse":${arr(rel.columnUniverse)}}"""

  private def parseMeta(json: String): (Seq[String], Seq[String]) = {
    def field(name: String): Seq[String] = {
      val m = java.util.regex.Pattern
        .compile("\"" + name + "\"\\s*:\\s*\\[(.*?)\\]", java.util.regex.Pattern.DOTALL)
        .matcher(json)
      require(m.find(), s"missing $name in sparse meta")
      val body = m.group(1).trim
      if (body.isEmpty) Seq.empty
      else body.split(",").toSeq.map { tok =>
        val t = tok.trim
        require(t.startsWith("\"") && t.endsWith("\""), s"bad meta token: $t")
        t.substring(1, t.length - 1)
          .replace("\\\"", "\"").replace("\\\\", "\\")
      }
    }
    (field("indexCols"), field("columnUniverse"))
  }
}
