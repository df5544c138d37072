package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The buffer-capped collect (r22) must be provably complete for every
  * group whose count is within the cap — that is the soundness condition
  * under which `Dedup.cappedCommon` fused the DfCap guard into the
  * collect aggregation — and must never grow a buffer beyond the cap for
  * groups over it. */
class CappedLongListSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  test("complete and equal to collect_list for groups within the cap") {
    import spark.implicits._
    CappedLongList.register(spark)
    val rnd = new scala.util.Random(22)
    // many groups, sizes straddling the cap; values shuffled across
    // partitions so merges actually interleave
    val rows = (0 until 40).flatMap { g =>
      val n = 1 + rnd.nextInt(12)
      (0 until n).map(i => (g.toLong, rnd.nextLong()))
    }
    val df = rnd.shuffle(rows).toDF("g", "x").repartition(7)
    val out = df.groupBy("g")
      .agg(
        org.apache.spark.sql.functions.expr("count(1)").as("n"),
        org.apache.spark.sql.functions
          .expr("sort_array(graft_capped_longs(x, 8))").as("capped"),
        org.apache.spark.sql.functions
          .expr("sort_array(collect_list(x))").as("full"))
      .collect()
    assert(out.length == 40)
    out.foreach { r =>
      val n = r.getLong(1)
      val capped = r.getSeq[Long](2)
      val full = r.getSeq[Long](3)
      if (n <= 8) assert(capped == full, s"group under cap must be complete")
      else assert(capped.length == 8, s"buffer must stop at the cap")
    }
  }

  test("capped list elements are always a sub-multiset of the group") {
    import spark.implicits._
    CappedLongList.register(spark)
    val df = (0 until 100).map(i => (i % 3, (i % 10).toLong)).toDF("g", "x")
      .repartition(5)
    val out = df.groupBy("g")
      .agg(org.apache.spark.sql.functions
        .expr("graft_capped_longs(x, 6)").as("capped"))
      .collect()
    out.foreach { r =>
      val capped = r.getSeq[Long](1)
      assert(capped.length == 6)
      assert(capped.forall(v => v >= 0 && v <= 9))
    }
  }

  test("NULL values are skipped like collect_list; cap 0 yields empty") {
    CappedLongList.register(spark)
    val r = spark.sql(
      """SELECT graft_capped_longs(x, 5), graft_capped_longs(x, 0)
        |FROM VALUES (CAST(1 AS BIGINT)), (CAST(NULL AS BIGINT)),
        |            (CAST(2 AS BIGINT)) t(x)""".stripMargin).collect()(0)
    assert(r.getSeq[Long](0).sorted == Seq(1L, 2L))
    assert(r.getSeq[Long](1).isEmpty)
  }
}
