package graft.queries

/** DuckDB oracle SQL for the rolling-hash text fingerprints
  * (`fingerprint_rolling`, `overlap_topk`) — the last hash-dependent
  * text rows, closed by re-deriving the 64-bit Karp–Rabin pipeline of
  * [[graft.functions.HashExprs]] (`RollingHash.windowHashes` +
  * splitmix64 finalizer) INSIDE DuckDB with exact mod-2⁶⁴ arithmetic:
  *
  *  - a wrapping 64-bit multiply is not native SQL (UBIGINT `*`
  *    raises on overflow), so `mulmod(a, c)` splits `a` into 32-bit
  *    halves and recombines through HUGEINT — every intermediate
  *    stays under 2⁹⁷ ≪ HUGEINT's 2¹²⁷;
  *  - a window's un-whitened hash Σ byte·Bʲ needs no recurrence at
  *    w = 16: the 16 powers of the FNV prime are Scala-computed
  *    literals and each window is one 16-term SUM mod 2⁶⁴ (the Scala
  *    sliding recurrence is algebraically identical in exact modular
  *    arithmetic);
  *  - UTF-8 bytes come from `hex(encode(text))` + 2-char substrings —
  *    byte-exact for any input, not just ASCII;
  *  - the splitmix64 whitener (xor-shift / multiply ×2 / xor-shift)
  *    maps 1:1 onto `xor`, `>>`, and two `mulmod`s;
  *  - minima compare SIGNED (Scala `Long` order), so the unsigned
  *    hash is re-signed before any MIN/window.
  *
  * Both oracles were validated value-identical against an independent
  * arbitrary-precision reimplementation before wiring; the driver's
  * hash-compare against the Spark output is the standing gate. */
private[graft] object RollingHashOracles {

  private val M64 = "18446744073709551616" // 2^64
  private val B = 0x100000001B3L // RollingHash.B (FNV prime)
  private val C1 = "13787848793156543929" // 0xBF58476D1CE4E5B9 unsigned
  private val C2 = "10723151780598845931" // 0x94D049BB133111EB unsigned
  private val GOLD = "11400714819323198485" // 0x9E3779B97F4A7C15 unsigned

  /** (a · c) mod 2⁶⁴ via 32-bit split over HUGEINT; `a` is a UBIGINT
    * SQL expression, `c` an unsigned literal string. */
  private def mulmod(a: String, c: String): String =
    s"CAST(((CAST($a % 4294967296 AS HUGEINT) * $c + " +
      s"((CAST($a // 4294967296 AS HUGEINT) * $c) % 4294967296) * " +
      s"4294967296) % $M64) AS UBIGINT)"

  /** B^0..B^(w−1) mod 2⁶⁴ as (exponent, power) VALUES rows. */
  private def powValues(w: Int): String = {
    var p = 1L
    (0 until w).map { e =>
      val row = s"($e, CAST(${java.lang.Long.toUnsignedString(p)} AS UBIGINT))"
      p = p * B // wrapping — the exact JVM arithmetic of RollingHash
      row
    }.mkString(",\n")
  }

  /** The shared CTE chain ending in `hs(doc_id, s, sh, nh)`: the
    * SIGNED finalized hash of every `w`-byte window (1-based window
    * start `s`, `nh` windows per document; a document shorter than
    * `w` yields one whole-text window — the `windowHashes` contract). */
  private def windowHashCtes(w: Int): String =
    s"""d AS (SELECT doc_id, hex(encode(text)) AS hx,
       |    octet_length(encode(text)) AS n FROM documents),
       |pw(e, p) AS (VALUES
       |${powValues(w)}),
       |by0 AS (SELECT doc_id, i,
       |    CAST(('0x' || substring(hx, 2*i - 1, 2)) AS UBIGINT) AS b
       |  FROM d, LATERAL (SELECT unnest(generate_series(1, n)) AS i) g1),
       |ws AS (SELECT doc_id, LEAST($w, n) AS wlen,
       |    unnest(generate_series(1, GREATEST(1, n - $w + 1))) AS s
       |  FROM d),
       |terms AS (SELECT ws.doc_id, ws.s,
       |    CAST(((CAST(by0.b AS HUGEINT) * CAST(pw.p AS HUGEINT))
       |      % $M64) AS UBIGINT) AS term
       |  FROM ws JOIN by0 ON by0.doc_id = ws.doc_id
       |    AND by0.i >= ws.s AND by0.i < ws.s + ws.wlen
       |  JOIN pw ON pw.e = ws.wlen - 1 - (by0.i - ws.s)),
       |traw AS (SELECT doc_id, s,
       |    CAST((SUM(CAST(term AS HUGEINT)) % $M64) AS UBIGINT) AS h
       |  FROM terms GROUP BY doc_id, s),
       |-- LEFT join keeps zero-byte documents: their single window has
       |-- no term rows, and the Scala side hashes them as mix(0 + gold)
       |-- — h = 0 reproduces exactly that
       |raw AS (SELECT ws.doc_id, ws.s,
       |    COALESCE(traw.h, CAST(0 AS UBIGINT)) AS h
       |  FROM ws LEFT JOIN traw
       |    ON traw.doc_id = ws.doc_id AND traw.s = ws.s),
       |m1 AS (SELECT doc_id, s,
       |    CAST(((CAST(h AS HUGEINT) + $GOLD) % $M64) AS UBIGINT) AS z
       |  FROM raw),
       |m2 AS (SELECT doc_id, s, xor(z, z >> 30) AS z FROM m1),
       |m3 AS (SELECT doc_id, s, ${mulmod("z", C1)} AS z FROM m2),
       |m4 AS (SELECT doc_id, s, xor(z, z >> 27) AS z FROM m3),
       |m5 AS (SELECT doc_id, s, ${mulmod("z", C2)} AS z FROM m4),
       |m6 AS (SELECT doc_id, s, xor(z, z >> 31) AS z FROM m5),
       |hs AS (SELECT doc_id, s,
       |    CAST(CAST(z AS HUGEINT) -
       |      CASE WHEN z >= 9223372036854775808 THEN $M64 ELSE 0 END
       |      AS BIGINT) AS sh,
       |    COUNT(*) OVER (PARTITION BY doc_id) AS nh
       |  FROM m6)""".stripMargin

  /** fingerprint_rolling: per-document minimum finalized window hash
    * (`RollingMinHash64` replayed). */
  def fingerprintSql(w: Int = 16): String =
    s"""WITH ${windowHashCtes(w)}
       |SELECT doc_id, MIN(sh) AS fp FROM hs GROUP BY doc_id""".stripMargin

  /** overlap_topk: winnowing selection (`WinnowHashes` — the distinct
    * sliding-`g` minima, one global minimum when a document has ≤ g
    * window hashes), document-frequency stop-fingerprint filter,
    * shared-count pair join (`overlapPairs`), then the per-doc top-k
    * by (shared DESC, partner ASC) — `overlapTopKOf`'s deterministic
    * rank. */
  def overlapTopKSql(w: Int = 16, g: Int = 7, minShared: Int = 2,
      maxDocFreq: Int = 1000, k: Int = 5): String =
    s"""WITH ${windowHashCtes(w)},
       |wmin AS (SELECT doc_id, s, nh,
       |    MIN(sh) OVER (PARTITION BY doc_id ORDER BY s
       |      ROWS BETWEEN CURRENT ROW AND ${g - 1} FOLLOWING) AS fp
       |  FROM hs),
       |sel AS (
       |  SELECT DISTINCT doc_id, fp FROM wmin
       |  WHERE nh > $g AND s <= nh - $g + 1
       |  UNION
       |  SELECT doc_id, MIN(sh) AS fp FROM hs WHERE nh <= $g
       |  GROUP BY doc_id),
       |df AS (SELECT fp FROM sel GROUP BY fp HAVING COUNT(*) <= $maxDocFreq),
       |kept AS (SELECT sel.doc_id, sel.fp FROM sel JOIN df ON df.fp = sel.fp),
       |prs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    COUNT(*) AS shared
       |  FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2 HAVING COUNT(*) >= $minShared),
       |directed AS (SELECT doc_a AS doc, doc_b AS partner, shared FROM prs
       |  UNION ALL SELECT doc_b, doc_a, shared FROM prs)
       |SELECT doc, partner, shared, CAST(rnk AS INT) AS rank FROM (
       |  SELECT doc, partner, shared,
       |    ROW_NUMBER() OVER (PARTITION BY doc
       |      ORDER BY shared DESC, partner) AS rnk
       |  FROM directed)
       |WHERE rnk <= $k""".stripMargin
}
