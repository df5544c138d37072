package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two float or double
  * vectors (each side independently float or double — the trained-codebook
  * paths compare a float embedding against double centroids, r21), with
  * whole-stage codegen (`doGenCode`) — the engine-extension path the
  * survey reserves for operators where built-ins fall short
  * (Expression > UDF: no boxing, no codegen fence).
  *
  * Numerical contract: ONE pass accumulating dot, |a|², |b|² as sequential
  * left folds in element order with float→double widening (a double input
  * is already double — CAST is the identity, exactly as in the SQL fold),
  * final result `dot / (sqrt(na2) * sqrt(nb2))`. This is the exact IEEE
  * operation sequence of the SQL formulation used by the oracle-checked
  * similarity queries (`aggregate(zip_with(...))` / DuckDB `list_reduce`),
  * so replacing the fold with this expression is bit-for-bit invisible to
  * the correctness gate (the three separate SQL folds — dot, |a|², |b|² —
  * each accumulate independently, so interleaving them in one loop leaves
  * every accumulator's IEEE addition sequence unchanged).
  *
  * Returns null for null/empty/length-mismatched inputs (the SQL fold
  * would produce null/NaN; callers filter nulls).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // ExpectsInputTypes needs the private[sql] AbstractDataType — check
  // input types manually instead.
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float|double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def isDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n == 0 || y.numElements() != n) null
    else {
      val (xd, yd) = (isDouble(left), isDouble(right))
      var dot = 0.0d
      var na2 = 0.0d
      var nb2 = 0.0d
      var i = 0
      while (i < n) {
        val xi = if (xd) x.getDouble(i) else x.getFloat(i).toDouble
        val yi = if (yd) y.getDouble(i) else y.getFloat(i).toDouble
        dot += xi * yi
        na2 += xi * xi
        nb2 += yi * yi
        i += 1
      }
      dot / (math.sqrt(na2) * math.sqrt(nb2))
    }
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na2 = ctx.freshName("na2")
      val nb2 = ctx.freshName("nb2")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val getX =
        if (isDouble(left)) s"$a.getDouble($i)"
        else s"(double) $a.getFloat($i)"
      val getY =
        if (isDouble(right)) s"$b.getDouble($i)"
        else s"(double) $b.getFloat($i)"
      s"""
         |final int $n = $a.numElements();
         |if ($n == 0 || $b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0d;
         |  double $na2 = 0.0d;
         |  double $nb2 = 0.0d;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $xi = $getX;
         |    final double $yi = $getY;
         |    $dot += $xi * $yi;
         |    $na2 += $xi * $xi;
         |    $nb2 += $yi * $yi;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na2) *
         |    java.lang.Math.sqrt($nb2));
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {

  /** Register `cosine_sim(a, b)` in the session's function registry so the
    * SQL path (A6) can call it too. Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim",
      { exprs: Seq[Expression] =>
        require(exprs.length == 2, "cosine_sim takes exactly 2 arguments")
        CosineSimilarity(exprs.head, exprs(1))
      },
      "built-in")
}
