package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Timestamp-type robustness.
  *
  * Parquet timestamps come in two flavors: `isAdjustedToUTC=true`
  * (Spark `TimestampType`, an instant) and `isAdjustedToUTC=false`
  * (Spark `TIMESTAMP_NTZ`, a wall-clock reading). Which one a fixture
  * carries is a property of the WRITER, not of the data — pandas flips
  * the annotation depending on tz-awareness of the source frame — so
  * every operator doing timestamp arithmetic must accept both. The
  * reference normalizes at the boundary for the same reason
  * (`read_traildb(ts_unit=...)`, sparsity/sparse_frame.py:411-421).
  *
  * Engine contract (pinned by `NtzInvarianceSpec`): naive timestamps
  * are interpreted as UTC. Every entry point sets
  * `spark.sql.session.timeZone=UTC`, so the NTZ→LTZ cast below is a
  * pure re-annotation — identical micros — and query results are
  * invariant to the fixture's annotation. DuckDB reads the same file
  * naively, so oracle comparisons agree either way.
  */
object Ts {

  /** Microseconds since epoch for `TIMESTAMP` *or* `TIMESTAMP_NTZ`
    * input. On an already-LTZ column the cast is a Catalyst no-op;
    * on NTZ it applies the session zone (UTC per the contract above).
    * Use this — never bare `unix_micros` — for timestamp math. */
  def epochMicros(c: Column): Column = unix_micros(c.cast(TimestampType))

  /** Normalize a possibly-NTZ timestamp column to `TimestampType`
    * under the naive==UTC contract (no-op when already LTZ). */
  def toUtcInstant(c: Column): Column = c.cast(TimestampType)
}
