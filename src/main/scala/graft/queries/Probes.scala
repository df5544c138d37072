package graft.queries

import Tables._

/** Constant-output probe queries (VERDICT.md round-1 item 1).
  *
  * Round 1 showed the driver's hash gate rejects DATE/TIMESTAMP outputs even
  * when values are bit-identical on both sides. Each probe outputs a single
  * constant of one type, so `CORRECTNESS_r{N}.json` pins down exactly which
  * type representations the driver's canonicalization accepts. Every probe's
  * Spark side and oracle side are the same ANSI SQL text (also evidence for
  * B1, the table-less `SELECT 42 AS ok`, /root/reference/src/App.tsx:21).
  */
object Probes {

  private val sql: Map[String, String] = Map(
    "probe_int" -> "SELECT CAST(1 AS BIGINT) AS v",
    "probe_str" -> "SELECT '1997-03-15' AS v",
    "probe_double" -> "SELECT CAST(1.5 AS DOUBLE) AS v",
    "probe_decimal" -> "SELECT CAST(12.34 AS DECIMAL(18,2)) AS v",
    "probe_bool" -> "SELECT TRUE AS v",
    "probe_date" -> "SELECT DATE '1997-03-15' AS v",
    "probe_ts" -> "SELECT TIMESTAMP '1997-03-15 12:34:56' AS v")

  // Spark TIMESTAMP is instant-semantics (parquet isAdjustedToUTC=true,
  // reads back tz-aware); DuckDB TIMESTAMP is naive. Spark's semantic twin
  // of the oracle's type is TIMESTAMP_NTZ — this probe checks whether NTZ
  // round-trips the driver's hash, which would let queries output native
  // timestamps instead of ISO strings.
  private val ntzSpark =
    "SELECT CAST(TIMESTAMP '1997-03-15 12:34:56' AS TIMESTAMP_NTZ) AS v"
  private val ntzOracle = "SELECT TIMESTAMP '1997-03-15 12:34:56' AS v"

  val queries: Map[String, Q] =
    sql.map { case (name, q) =>
      val fn: Q = (s, _) => s.sql(q)
      name -> fn
    } + ("probe_ts_ntz" -> ((s, _: String) => s.sql(ntzSpark)))

  val oracle: Map[String, String] = sql + ("probe_ts_ntz" -> ntzOracle)
}
