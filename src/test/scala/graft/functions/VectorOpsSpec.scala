package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The native dot / squared-L2-slice folds must be bit-identical to the
  * `aggregate(zip_with(...))` SQL formulations they replaced in the LSH
  * bucket and PQ distance map stages (r21). */
class VectorOpsSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  test("graft_dot bit-identical to the zip_with product fold") {
    import spark.implicits._
    VectorOps.register(spark)
    val rnd = new scala.util.Random(17)
    val rows = Seq.fill(60)((
      Array.fill(64)(rnd.nextFloat() * 2 - 1),
      Array.fill(64)(rnd.nextDouble() * 6 - 3)))
    val out = rows.toDF("a", "w").selectExpr(
      "graft_dot(a, w) AS fast",
      """aggregate(zip_with(a, w,
        |  (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
        |  CAST(0 AS DOUBLE), (acc, p) -> acc + p) AS ref""".stripMargin)
      .collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("graft_l2_slice bit-identical to the sliced squared-distance fold") {
    import spark.implicits._
    VectorOps.register(spark)
    val rnd = new scala.util.Random(19)
    val rows = Seq.fill(60)((
      Array.fill(64)(rnd.nextFloat() * 2 - 1),
      Array.fill(8)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "c")
    Seq(1, 9, 57).foreach { start =>
      val out = df.selectExpr(
        s"graft_l2_slice(a, c, $start) AS fast",
        s"""aggregate(zip_with(slice(a, $start, 8), c,
           |  (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),
           |  CAST(0 AS DOUBLE), (acc, p) -> acc + p) AS ref""".stripMargin)
        .collect()
      out.foreach { r =>
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)),
          s"start=$start: ${r.getDouble(0)} != ${r.getDouble(1)}")
      }
    }
    // double×double whole-vector form (the l2Expr / subspace-residual
    // shape: no CAST in the original lambda — identity here)
    val dd = rows.map { case (_, c) => (c.map(_ + 0.5), c) }
      .toDF("a", "c").selectExpr(
        "graft_l2_slice(a, c, 1) AS fast",
        """aggregate(zip_with(a, c, (x, y) -> (x - y) * (x - y)),
          |  CAST(0 AS DOUBLE), (acc, p) -> acc + p) AS ref""".stripMargin)
      .collect()
    dd.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("short-slice and length-mismatch yield NULL (zip-pad poisoning)") {
    VectorOps.register(spark)
    val r = spark.sql(
      "SELECT graft_l2_slice(array(CAST(1 AS DOUBLE)), " +
        "array(CAST(1 AS DOUBLE), CAST(2 AS DOUBLE)), 1) AS a, " +
        "graft_dot(array(CAST(1 AS FLOAT)), " +
        "array(CAST(1 AS DOUBLE), CAST(2 AS DOUBLE))) AS b").collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
