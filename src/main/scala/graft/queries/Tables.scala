package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the declared-query inventory.
  *
  * Every query in `graft.SparkEntry.queries` takes `(spark, sfDir)` and must
  * be deterministic (fixed literals, unique-key ORDER BY, NULLS LAST — see
  * SURVEY.md §5/§7.4) so the driver's DuckDB hash-compare is stable.
  *
  * Canonicalization policy (probe-refined over rounds 1-3):
  *  - Temporal: plain TIMESTAMP outputs fail the driver's schema gate
  *    (Spark writes instant-semantics parquet, isAdjustedToUTC=true, which
  *    DuckDB reads as TIMESTAMPTZ vs the oracle's naive TIMESTAMP) — probe
  *    evidence: probe_ts red, probe_date/probe_ts_ntz green. Policy: output
  *    DATE, TIMESTAMP_NTZ, or an ISO-8601 string (`date_format` ↔
  *    `strftime`), never plain TIMESTAMP. The string form also matches the
  *    reference UI's rendering rule (/root/reference/src/arrow.ts:6).
  *  - Money: sum exactly as DECIMAL (order-insensitive at any parallelism),
  *    then cast the final result to DOUBLE on BOTH sides. Rounds 1-3 showed
  *    DECIMAL outputs hash-red on multi-row results even when values compare
  *    equal (trailing-zero / Decimal-vs-float rendering in the driver's
  *    canonicalization — VERDICT r3 hypothesis a); DOUBLE is probe-proven
  *    green, and a single cast of an exact decimal sum is deterministic.
  */
object Tables {
  /** The queries registry value type: (session, testdata dir) => result. */
  type Q = (SparkSession, String) => DataFrame

  val tableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Load one testdata table (`TESTDATA.md`): parquet is self-describing,
    * the scan is lazy, and Catalyst pushes filters/projections into it.
    *
    * Memoized per (session, dir, name): `spark.read.parquet` reads the
    * footer for schema + lists files eagerly, and declared queries are
    * invoked several times per harness run (verify dump, bench samples,
    * plan gates) — re-reading footers each time is harness overhead, not
    * query cost. Reuse is safe: the returned DataFrame is an immutable
    * lazy plan, physical planning re-reads session confs on every action
    * (so DeterminismSpec's regime switches still apply), and the testdata
    * files never change within a run.
    *
    * Retention note (ADVICE r9, accepted for the single-session harness):
    * memo keys hold SparkSession references for the JVM lifetime, so a
    * host that creates and stops MANY sessions would retain stopped
    * sessions' plans; the harness and test suites share one session
    * (TestSpark/Session are memoized), so nothing accumulates here. */
  private val tableMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String),
      DataFrame]

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    tableMemo.getOrElseUpdate((s, dir, name),
      s.read.parquet(s"$dir/$name.parquet"))

  /** Register every testdata table as a temp view (for spark.sql queries —
    * the analog of the reference's single SQL delegation point,
    * /root/reference/src/duckdb.ts:46-49) and return the session.
    *
    * Registration always runs (ADVICE r9): the expensive part — footer
    * reads — is already eliminated by `tableMemo`, so these are 10
    * near-free catalog puts, and re-putting every call self-heals a view
    * name clobbered by the engine's user-facing import paths
    * (`Catalog.registerFile` / `createOrReplaceParquetView` derive view
    * names from user file paths — an imported `lineitem.parquet` would
    * otherwise silently shadow the testdata view for every later
    * SQL-routed query). A dir change (bench warms at sf0.001, then times
    * sf0.1) repoints the shared names for the same reason. */
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

  /** `events.ts` as a timestamp — the single adapter point between the
    * testdata's physical encoding and every event query. The column is
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) in the parquet, which Spark
    * reads natively as TIMESTAMP_NTZ and DuckDB as a naive TIMESTAMP, so
    * both engines see identical micro-precision wall-clock values and the
    * adapter is the identity. NOTE: micros-native input is now a
    * PRECONDITION, not a preference — a TIMESTAMP(NANOS) parquet reads as
    * BIGINT under Session's nanosAsLong flag, and this identity (and
    * eventUs below) would pass the raw long through to date_trunc /
    * CAST-AS-TIMESTAMP call sites, producing silently wrong values rather
    * than an error (ADVICE r14). Nanos-encoded events data is unsupported
    * end to end; re-adding it means branching here on the column dtype
    * (BIGINT ⇒ timestamp_micros(ts div 1000)). Keeping every event query
    * routed through this one adapter is what keeps that a one-line fix. */
  def eventTs(c: Column): Column = c

  /** The `ts` column as exact epoch MICROS (bigint) — the integer twin
    * of eventTs for queries that compare/emit raw micros (as-of join,
    * sessionize, funnel); matches the oracle's `epoch_us(ts)`. The
    * NTZ→TIMESTAMP cast reinterprets in the session zone, which Session
    * pins to UTC, so `unix_micros` yields the same integer DuckDB's
    * `epoch_us` derives from the same naive value — exact int arithmetic,
    * no doubles anywhere. */
  def eventUs: Column = expr("unix_micros(CAST(ts AS TIMESTAMP))")

  // --- temporal canonicalization: DuckDB oracle side ----------------------
  def oDay(x: String): String = s"strftime($x, '%Y-%m-%d')"
  def oSec(x: String): String = s"strftime($x, '%Y-%m-%d %H:%M:%S')"
  def oMonth(x: String): String =
    s"strftime(date_trunc('month', $x), '%Y-%m-%d')"

  /** Exact-then-double money sum: SUM(CAST(x AS DECIMAL(18,2))) cast to
    * DOUBLE. The internal sum is exact decimal, so it is order-insensitive
    * at any parallelism (double sums are not); the one final cast is a
    * single rounding of an exact value, hence deterministic and identical
    * in Spark and DuckDB (both round-to-nearest). DOUBLE output because the
    * driver's hash canonicalization rejects multi-row DECIMAL results
    * (Tables policy note above). Values stay far below 10^16 at sf0.1
    * (ADVICE r1: at real 100 TB widen the internal sum to DECIMAL(28,2)). */
  def dsum(c: String): Column = dsumOf(col(c))
  def dsumOf(c: Column): Column = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)
  }
  def oDsum(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE)"

  // --- shared intermediate cache -------------------------------------------

  private val memo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String),
      DataFrame]

  /** Memoized persisted intermediate, keyed by (session, dir, name): the
    * builders of shared subtrees (shingle index, simhash bands, re-agg
    * base) are invoked once per query execution, and a Verify/Bench session
    * executes each query up to 3 times — without memoization every
    * invocation would `persist` a fresh copy that nothing ever unpersists
    * (ADVICE r5). One cached copy per (session, dir) is the 100 TB analog
    * of materializing the intermediate once and reading it from storage. */
  def memoPersist(s: SparkSession, dir: String, name: String)
      (build: => DataFrame): DataFrame =
    memo.getOrElseUpdate((s, dir, name),
      build.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Drop one memoized intermediate (unpersisting its cache) so a bench
    * build leg can re-measure the REAL construction cost — the memo
    * analog of `Layout.written.remove` for path-backed artifacts. */
  def dropMemo(s: SparkSession, dir: String, name: String): Unit =
    memo.remove((s, dir, name)).foreach(_.unpersist())
}
