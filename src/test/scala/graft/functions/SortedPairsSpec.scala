package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The native posting-list pair explosion must emit exactly the rows,
  * in exactly the order, of the higher-order formulation it replaced
  * in the capped candidate generation (r21). */
class SortedPairsSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  private val hof =
    """flatten(transform(ds, (a, i) ->
      |  transform(slice(ds, i + 2, size(ds)),
      |            d -> named_struct('d1', a, 'd2', d))))""".stripMargin

  test("identical pairs and order vs the lambda formulation") {
    import spark.implicits._
    SortedPairs.register(spark)
    val rnd = new scala.util.Random(23)
    val rows: Seq[Seq[Long]] =
      Seq(Seq.empty[Long], Seq(7L), Seq(1L, 2L), Seq(3L, 5L, 9L)) ++
        Seq.fill(30)(Seq.fill(rnd.nextInt(50))(rnd.nextLong()).sorted.toSeq)
    val df = rows.toDF("ds")
    val out = df.selectExpr(
      "graft_sorted_pairs(ds) AS fast", s"($hof) AS ref").collect()
    out.foreach { r =>
      val fast = r.getSeq[org.apache.spark.sql.Row](0)
        .map(p => (p.getLong(0), p.getLong(1)))
      val ref = r.getSeq[org.apache.spark.sql.Row](1)
        .map(p => (p.getLong(0), p.getLong(1)))
      assert(fast == ref)
    }
    // NULL array propagates (typed via IF so the element type stays
    // non-null — a bare CAST(NULL AS ARRAY<BIGINT>) types containsNull)
    val n = spark.sql(
      "SELECT graft_sorted_pairs(IF(false, array(CAST(1 AS BIGINT)), NULL))")
      .collect()(0)
    assert(n.isNullAt(0))
    // nullable-element arrays are rejected at analysis (ADVICE r21: a
    // null slot would silently read as 0)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        "SELECT graft_sorted_pairs(CAST(array(1) AS ARRAY<BIGINT>))")
        .collect()
    }
    assert(e.getMessage.contains("non-null elements") ||
      e.getMessage.toLowerCase.contains("data type mismatch"))
  }
}
