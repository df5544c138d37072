package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared helpers for the declared-query inventory.
  *
  * Every query in `graft.SparkEntry.queries` takes `(spark, sfDir)` and must
  * be deterministic (fixed literals, unique-key ORDER BY, NULLS LAST — see
  * SURVEY.md §5/§7.4) so the driver's DuckDB hash-compare is stable.
  */
object Tables {
  /** The queries registry value type: (session, testdata dir) => result. */
  type Q = (SparkSession, String) => DataFrame

  /** Load one testdata table (`TESTDATA.md`): parquet is self-describing,
    * the scan is lazy, and Catalyst pushes filters/projections into it. */
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Fixed timestamp literal (UTC) — wall-clock-free stand-in for the
    * reference's `CURRENT_DATE - INTERVAL` predicates (SURVEY §7.4). */
  def ts(iso: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(if (iso.length == 10) s"$iso 00:00:00" else iso)
}
