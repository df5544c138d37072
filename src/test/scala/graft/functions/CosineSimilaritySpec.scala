package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The native codegen cosine expression must be bit-identical to the SQL
  * fold formulation the oracle checks (same IEEE op sequence), in both
  * codegen and interpreted modes. */
class CosineSimilaritySpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  private val foldSql =
    """aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
      |  CAST(0 AS DOUBLE), (acc, p) -> acc + p) /
      |(SQRT(aggregate(zip_with(a, a, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
      |  CAST(0 AS DOUBLE), (acc, p) -> acc + p)) *
      | SQRT(aggregate(zip_with(b, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
      |  CAST(0 AS DOUBLE), (acc, p) -> acc + p)))""".stripMargin

  test("bit-identical to the SQL fold on random vectors") {
    import spark.implicits._
    CosineSimilarity.register(spark)
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)((
      Array.fill(64)(rnd.nextFloat() * 2 - 1),
      Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val out = df.selectExpr("cosine_sim(a, b) AS c", s"($foldSql) AS f")
      .collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"${r.getDouble(0)} != ${r.getDouble(1)}")
    }
  }

  test("float×double side (trained codebook shape) bit-identical to fold") {
    import spark.implicits._
    CosineSimilarity.register(spark)
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(50)((
      Array.fill(64)(rnd.nextFloat() * 2 - 1),
      Array.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
    // d×d twin: the same fold text with the double array on both sides
    val foldBB =
      """aggregate(zip_with(b, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
        |  CAST(0 AS DOUBLE), (acc, p) -> acc + p) /
        |(SQRT(aggregate(zip_with(b, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
        |  CAST(0 AS DOUBLE), (acc, p) -> acc + p)) *
        | SQRT(aggregate(zip_with(b, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
        |  CAST(0 AS DOUBLE), (acc, p) -> acc + p)))""".stripMargin
    val out = df.selectExpr("cosine_sim(a, b) AS c", s"($foldSql) AS f",
      "cosine_sim(b, b) AS db", s"($foldBB) AS fb")
      .collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"f×d: ${r.getDouble(0)} != ${r.getDouble(1)}")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)),
        s"d×d: ${r.getDouble(2)} != ${r.getDouble(3)}")
    }
  }

  test("interpreted path matches eval contract (null on mismatch/empty)") {
    val mk = (xs: Seq[Float]) =>
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(xs.toArray)
    val e = CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal(mk(Seq(1f, 0f)),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal(mk(Seq(1f, 0f)),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    assert(e.eval(null) == 1.0d)
    val mismatch = e.copy(right =
      org.apache.spark.sql.catalyst.expressions.Literal(mk(Seq(1f)),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    assert(mismatch.eval(null) == null)
  }

  test("usable from the SQL path after registration") {
    CosineSimilarity.register(spark)
    val v = spark.sql(
      "SELECT cosine_sim(array(CAST(3 AS FLOAT), CAST(4 AS FLOAT)), " +
        "array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS c")
      .collect()(0).getDouble(0)
    assert(math.abs(v - 1.0) < 1e-15)
  }
}
