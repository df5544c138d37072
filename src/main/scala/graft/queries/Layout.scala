package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import Tables._

/** Declared queries over REWRITTEN storage layouts — the hash-backed twin
  * of ScaleSpec's layout assertions (VERDICT r8 task 7). `Scale
  * .writePartitioned` is the single highest-leverage layout decision for a
  * 100 TB fact table queried by a low-cardinality key: each key value
  * becomes a directory, and an equality filter on it never lists — let
  * alone reads — the other directories. ScaleSpec proves the pruning shape;
  * this query proves the DATA: the full write → prune → read → aggregate
  * pipeline hash-matches the oracle aggregating the ORIGINAL table, so a
  * row lost/duplicated/mangled by the layout rewrite (or a partition
  * directory mis-encoded on read-back) fails CORRECTNESS, not just a spec.
  */
object Layout {

  // One layout write per (session, sfDir, kind): Verify/Bench invoke each
  // query up to 3 times and the plan gates re-build the frame — rewriting
  // the table each time would turn a read benchmark into a write benchmark.
  // mode("overwrite") keeps a stale layout from a previous JVM harmless.
  // The SESSION is part of the key (ADVICE r11): bucketedPair and
  // unionByNameView register catalog tables/views in a SPECIFIC session,
  // so a second SparkSession in the same JVM must re-register its own
  // rather than silently reading a name that only exists in the first
  // session's catalog (path-only layouts just rewrite once per session —
  // a write, not a correctness hazard).
  // NOTE (accepted, single-session harness): entries live for the JVM
  // lifetime; a long-lived multi-session host would want eviction.
  private[queries] val written =
    scala.collection.concurrent.TrieMap.empty[
      (SparkSession, String, String), String]

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  // Per-JVM pid component (ADVICE r9): two concurrent harness JVMs on one
  // host would otherwise mode(overwrite) the SAME tmp directory
  // concurrently and could interleave into a corrupt mixed layout.
  private val pid = ProcessHandle.current.pid

  /** Layout root under java.io.tmpdir, unique per (kind, sfDir, JVM). */
  private[queries] def tmpRoot(kind: String, dir: String): String =
    s"${System.getProperty("java.io.tmpdir")}" +
      s"/graft_layout_${kind}_${md5hex(dir).take(12)}_p$pid"

  /** `orders` rewritten under java.io.tmpdir partitioned by o_orderstatus
    * (3 values — exactly the low-cardinality key the layout is for);
    * returns the layout root. Keyed by sfDir hash so sf0.001 plan gates
    * and sf0.01 Verify runs never read each other's layout. */
  private def partitionedOrders(s: SparkSession, dir: String): String =
    written.getOrElseUpdate((s, dir, "orders"), {
      val path = tmpRoot("orders", dir)
      graft.engine.Scale.writePartitioned(
        t(s, dir, "orders"), path, "o_orderstatus")
      path
    })

  /** Partition-pruned aggregate over the rewritten layout: the filter on
    * the partition column must reach the scan as a PartitionFilter (gated
    * in PlanSpec), i.e. only the o_orderstatus=F directories are listed.
    * The oracle runs the same aggregate on the ORIGINAL orders table, so a
    * hash match certifies the layout roundtrip preserved every row. */
  val partPrune: Q = (s, dir) => {
    val path = partitionedOrders(s, dir)
    s.read.parquet(path)
      .filter(col("o_orderstatus") === "F")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum("o_totalprice").as("total"))
      .orderBy(col("o_orderpriority"))
  }

  val partPruneSql: String =
    """SELECT o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders WHERE o_orderstatus = 'F'
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** `orders` + `customer` rewritten as BUCKETED catalog tables on the
    * join key (`Scale.writeBucketed`: same key, same bucket count ⇒
    * co-located joins with no shuffle exchange on either side — the single
    * biggest join cost lever for fact⋈fact at 100 TB). Returns the two
    * table names; written once per (sfDir, JVM). saveAsTable is the only
    * way Spark persists bucket metadata, so names carry the dir hash AND
    * the pid to keep concurrent harness JVMs off each other's tables. */
  private[queries] def bucketedPair(
      s: SparkSession, dir: String): (String, String) = {
    val ot = written.getOrElseUpdate((s, dir, "bkt_orders"), {
      val name = s"graft_bkt_orders_${md5hex(dir).take(12)}_p$pid"
      graft.engine.Scale.writeBucketed(
        t(s, dir, "orders").select(col("o_custkey"), col("o_totalprice")),
        name, "o_custkey", 8)
      name
    })
    val ct = written.getOrElseUpdate((s, dir, "bkt_customer"), {
      val name = s"graft_bkt_customer_${md5hex(dir).take(12)}_p$pid"
      graft.engine.Scale.writeBucketed(
        t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment")),
        name, "c_custkey", 8)
      name
    })
    (ot, ct)
  }

  /** `orders` rewritten range-sorted by o_orderdate into 8 files
    * (`Scale.writeSorted`): repartitionByRange gives each file a disjoint
    * date range and sortWithinPartitions orders rows inside, so every row
    * group's min/max footer stats are TIGHT and a date-range filter skips
    * whole files and row groups — the stats-tightening layout for
    * high-cardinality range keys, third leg of the partitioned/bucketed/
    * sorted triad. `private[queries]` so LayoutSpec can read the same
    * layout's parquet footers for the stat-level skipping assertion. */
  private[queries] def sortedOrders(s: SparkSession, dir: String): String =
    written.getOrElseUpdate((s, dir, "sorted_orders"), {
      val path = tmpRoot("sorted_orders", dir)
      graft.engine.Scale.writeSorted(
        t(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice")),
        path, "o_orderdate", 8)
      path
    })

  /** Row-group-skipping aggregate over the sorted layout (VERDICT r9 #4):
    * a tight Q1-1995 range filter (~4% of the 6.6-year span) over the
    * date-sorted rewrite. The filter pushes to the parquet scan, where the
    * sorted layout's disjoint min/max stats let the reader skip the other
    * ~96% of row groups at footer-read time (LayoutSpec asserts the
    * overlap set is a strict subset BY READING THE FOOTERS); the oracle
    * aggregates the ORIGINAL table under the same predicate, so a hash
    * match certifies the sorted rewrite lost/duplicated nothing. */
  val sortSkip: Q = (s, dir) => {
    val path = sortedOrders(s, dir)
    s.read.parquet(path)
      .filter(col("o_orderdate") >= ts("1995-01-01") &&
        col("o_orderdate") < ts("1995-04-01"))
      .agg(count(lit(1)).as("n"), dsum("o_totalprice").as("total"),
        dstr(min(col("o_orderdate"))).as("first_day"),
        dstr(max(col("o_orderdate"))).as("last_day"))
  }

  val sortSkipSql: String =
    """SELECT COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
      |  strftime(MIN(o_orderdate), '%Y-%m-%d') AS first_day,
      |  strftime(MAX(o_orderdate), '%Y-%m-%d') AS last_day
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1995-04-01 00:00:00'""".stripMargin

  /** Shuffle-free bucketed join, certified by DATA (VERDICT r9 #2): both
    * sides read from their bucketed layouts and join on the bucket key
    * with ZERO exchanges anywhere in the plan — the `merge` hints pin
    * sort-merge (fact⋈fact at scale is never broadcastable; without the
    * hint the sf0.001 customer side would auto-broadcast and the gate
    * would certify nothing), bucketing supplies both sides' partitioning,
    * and the follow-up per-customer aggregate reuses the SAME bucket
    * partitioning (group keys ⊇ partition key), so even the aggregation
    * adds no exchange; the final order-by rides TakeOrderedAndProject.
    * PlanSpec asserts SortMergeJoin + zero Exchange. The oracle runs the
    * identical join+aggregate on the ORIGINAL tables, so a hash match
    * certifies the bucketed rewrite preserved every row of both tables. */
  val bucketJoin: Q = (s, dir) => {
    val (ot, ct) = bucketedPair(s, dir)
    s.table(ot).hint("merge")
      .join(s.table(ct).hint("merge"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"), dsum("o_totalprice").as("total"))
      .orderBy(col("c_custkey"))
      .limit(200)
  }

  val bucketJoinSql: String =
    """SELECT c_custkey, c_mktsegment, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_custkey, c_mktsegment
      |ORDER BY c_custkey LIMIT 200""".stripMargin

  /** Two parquet files with OVERLAPPING-BUT-DIFFERENT schemas — the same
    * 25 nations, one file carrying (key, name), the other (key, regionkey)
    * — unioned through the engine's A9 import path
    * (`Catalog.createOrReplaceParquetView`, mergeSchema). SURVEY §7.4 #4
    * names this a deliberate parity hazard: DuckDB's `read_parquet`
    * unifies by NAME, Spark's default union is by POSITION; the A9 path
    * must fill each file's missing columns with NULL exactly as the
    * oracle's explicit NULL-padded UNION ALL does. Registered once per
    * (sfDir, JVM); the view reads lazily so the union never copies bytes. */
  private def unionByNameView(s: SparkSession, dir: String): String =
    written.getOrElseUpdate((s, dir, "union_by_name"), {
      val root = tmpRoot("union_by_name", dir)
      t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
        .coalesce(1).write.mode("overwrite").parquet(s"$root/a.parquet")
      t(s, dir, "nation").select(col("n_nationkey"), col("n_regionkey"))
        .coalesce(1).write.mode("overwrite").parquet(s"$root/b.parquet")
      val view = s"graft_union_${md5hex(dir).take(8)}_p$pid"
      graft.engine.Catalog.createOrReplaceParquetView(
        s, java.nio.file.Paths.get(root),
        Seq(graft.engine.Catalog.ImportedFile("a.parquet", 0L),
          graft.engine.Catalog.ImportedFile("b.parquet", 0L)),
        view)
      view
    })

  val unionByName: Q = (s, dir) => {
    val view = unionByNameView(s, dir)
    s.table(view)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .orderBy(col("n_nationkey"), col("n_name").asc_nulls_last)
  }

  val unionByNameSql: String =
    """SELECT n_nationkey, n_name, CAST(NULL AS INTEGER) AS n_regionkey
      |FROM nation
      |UNION ALL
      |SELECT n_nationkey, CAST(NULL AS VARCHAR) AS n_name, n_regionkey
      |FROM nation
      |ORDER BY n_nationkey, n_name NULLS LAST""".stripMargin

  val queries: Map[String, Q] = Map(
    "c_part_prune" -> partPrune,
    "c_bucket_join" -> bucketJoin,
    "c_sort_skip" -> sortSkip,
    "c_union_by_name" -> unionByName)

  val oracle: Map[String, String] = Map(
    "c_part_prune" -> partPruneSql,
    "c_bucket_join" -> bucketJoinSql,
    "c_sort_skip" -> sortSkipSql,
    "c_union_by_name" -> unionByNameSql)
}
