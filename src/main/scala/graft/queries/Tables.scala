package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the declared-query inventory.
  *
  * Every query in `graft.SparkEntry.queries` takes `(spark, sfDir)` and must
  * be deterministic (fixed literals, unique-key ORDER BY, NULLS LAST — see
  * SURVEY.md §5/§7.4) so the driver's DuckDB hash-compare is stable.
  *
  * Canonicalization policy (learned from round 1, VERDICT.md "What's wrong"
  * #1): the driver's hash canonicalizes DATE/TIMESTAMP values differently on
  * the Spark-parquet side vs the DuckDB-oracle side even when the values are
  * bit-identical, so NO declared query outputs a temporal column. Every
  * temporal result is rendered to an ISO-8601 string on BOTH sides
  * (`date_format` ↔ `strftime`) — which also matches the reference UI's own
  * rendering rule (Date → ISO string, /root/reference/src/arrow.ts:6).
  * Money/measure sums go through DECIMAL so they are exact and
  * order-insensitive at any parallelism.
  */
object Tables {
  /** The queries registry value type: (session, testdata dir) => result. */
  type Q = (SparkSession, String) => DataFrame

  val tableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Load one testdata table (`TESTDATA.md`): parquet is self-describing,
    * the scan is lazy, and Catalyst pushes filters/projections into it. */
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Register every testdata table as a temp view (for spark.sql queries —
    * the analog of the reference's single SQL delegation point,
    * /root/reference/src/duckdb.ts:46-49) and return the session. */
  def views(s: SparkSession, dir: String): SparkSession = {
    tableNames.foreach(n => t(s, dir, n).createOrReplaceTempView(n))
    s
  }

  /** Fixed timestamp literal interpreted in the SESSION time zone (UTC) —
    * wall-clock-free stand-in for the reference's `CURRENT_DATE - INTERVAL`
    * predicates (SURVEY §7.4). A Column (not java.sql.Timestamp) so the JVM
    * default zone never participates; constant-folds and pushes down. */
  def ts(iso: String): Column =
    to_timestamp(lit(if (iso.length == 10) s"$iso 00:00:00" else iso))

  // --- temporal canonicalization: Spark side ------------------------------
  /** Render a day-granular date/timestamp as 'yyyy-MM-dd' (session TZ). */
  def dstr(c: Column): Column = date_format(c, "yyyy-MM-dd")
  /** Render a timestamp as 'yyyy-MM-dd HH:mm:ss' (second granularity). */
  def tstr(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")
  /** Month bucket of a timestamp as 'yyyy-MM-dd' (first of month). */
  def monthStr(c: Column): Column = dstr(date_trunc("month", c))

  // --- temporal canonicalization: DuckDB oracle side ----------------------
  def oDay(x: String): String = s"strftime($x, '%Y-%m-%d')"
  def oSec(x: String): String = s"strftime($x, '%Y-%m-%d %H:%M:%S')"
  def oMonth(x: String): String =
    s"strftime(date_trunc('month', $x), '%Y-%m-%d')"

  /** Exact money sum: SUM(CAST(x AS DECIMAL(18,2))) cast back to (18,2).
    * Inputs are 2-decimal money; the widened sum is cast back only for a
    * stable output type vs the oracle. Values here stay far below 10^16 at
    * sf0.1 (ADVICE r1: at real 100 TB keep the widened DECIMAL(28,2)). */
  def dsum(c: String): Column = dsumOf(col(c))
  def dsumOf(c: Column): Column = {
    import org.apache.spark.sql.types.DecimalType
    sum(c.cast(DecimalType(18, 2))).cast(DecimalType(18, 2))
  }
  def oDsum(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DECIMAL(18,2))"
}
