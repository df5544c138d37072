package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** The NULLIF→<> optimizer rule: plan-level effect (parquet pushdown
  * restored) and value-level equivalence on the three-valued edge cases. */
class NullifPushdownSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("nullif(col, lit) IS NOT NULL pushes down as IsNotNull + NotEq") {
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(org.apache.spark.sql.functions
        .expr("nullif(l_linestatus, 'F') IS NOT NULL"))
    val plan = graft.engine.Engine.explain(df)
    assert(plan.contains("Not(EqualTo(l_linestatus,F))"),
      s"rule should restore pushdown:\n$plan")
  }

  test("rewrite is value-equivalent, including NULL inputs") {
    import spark.implicits._
    val df = Seq(Some("F"), Some("O"), None).toDF("s")
    val viaNullif = df.filter(
      org.apache.spark.sql.functions.expr("nullif(s, 'F') IS NOT NULL"))
    assert(viaNullif.collect().map(_.getString(0)).toSeq == Seq("O"))
    // projection context (not just Filter): both forms agree row-for-row
    val both = df.selectExpr(
      "nullif(s, 'F') IS NOT NULL AS a",
      "s IS NOT NULL AND s <> 'F' AS b").collect()
    assert(both.forall(r => r.getBoolean(0) == r.getBoolean(1)))
  }

  test("nullif(col, NULL) is left alone (guard case)") {
    import spark.implicits._
    val df = Seq(Some("x"), None).toDF("s")
    val out = df.selectExpr(
      "nullif(s, CAST(NULL AS STRING)) IS NOT NULL AS p").collect()
      .map(_.getBoolean(0)).toSeq
    assert(out == Seq(true, false))
  }
}
