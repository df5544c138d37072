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

  // One layout write per (sfDir) per JVM: Verify/Bench invoke each query
  // up to 3 times and the plan gates re-build the frame — rewriting the
  // table each time would turn a read benchmark into a write benchmark.
  // mode("overwrite") keeps a stale layout from a previous JVM harmless.
  private val written = scala.collection.concurrent.TrieMap.empty[String, String]

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** `orders` rewritten under java.io.tmpdir partitioned by o_orderstatus
    * (3 values — exactly the low-cardinality key the layout is for);
    * returns the layout root. Keyed by sfDir hash so sf0.001 plan gates
    * and sf0.01 Verify runs never read each other's layout. */
  private def partitionedOrders(s: SparkSession, dir: String): String =
    written.getOrElseUpdate(dir, {
      val path = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft_layout_orders_${md5hex(dir).take(12)}"
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

  val queries: Map[String, Q] = Map("c_part_prune" -> partPrune)

  val oracle: Map[String, String] = Map("c_part_prune" -> partPruneSql)
}
