package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native twins of the two remaining interpreted vector folds (r21,
  * guide §1.2 "per-task work"): higher-order `aggregate(zip_with(...))`
  * lambdas evaluate interpreted per element, and the LSH-bucket / PQ
  * map stages run hundreds of such folds per row. Both expressions
  * reproduce the exact IEEE operation sequence of the SQL folds they
  * replace (sequential left fold in element order, float→double
  * widening per element — a double element's CAST is the identity), so
  * swapping them in is invisible to the oracle hash gate. Each side may
  * independently be array<float> or array<double>.
  */
private[functions] trait VectorFold extends BinaryExpression {

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

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected def isDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  protected def getter(arr: String, idx: String, dbl: Boolean): String =
    if (dbl) s"$arr.getDouble($idx)" else s"(double) $arr.getFloat($idx)"

  protected def elem(a: ArrayData, i: Int, dbl: Boolean): Double =
    if (dbl) a.getDouble(i) else a.getFloat(i).toDouble
}

/** `graft_dot(a, b)` ≡ `aggregate(zip_with(a, b, (x, y) ->
  * CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE),
  * (acc, p) -> acc + p)` — the LSH hyperplane-projection fold. NULL for
  * length mismatch (zip_with would pad with NULL and poison the sum),
  * 0.0 for empty (the fold's seed). */
case class DotProduct(left: Expression, right: Expression)
    extends VectorFold {

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) null
    else {
      val (xd, yd) = (isDouble(left), isDouble(right))
      var acc = 0.0d
      var i = 0
      while (i < n) {
        acc += elem(x, i, xd) * elem(y, i, yd)
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0d;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ${getter(a, i, isDouble(left))} *
         |      ${getter(b, i, isDouble(right))};
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** `graft_l2_slice(a, b, start)` ≡ `aggregate(zip_with(slice(a, start,
  * size(b)), b, (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE)
  * - y)), CAST(0 AS DOUBLE), (acc, p) -> acc + p)` — the PQ subspace
  * squared-distance fold (`start` is the 1-based slice offset into `a`;
  * start=1 is the whole-vector L2 of `l2Expr`). NULL when `a` has fewer
  * than size(b) elements from `start` (the short slice would zip-pad
  * with NULL and poison the sum). NOTE the asymmetry the SLICE carries
  * (ADVICE r21): an `a` LONGER than size(b) from `start` folds the
  * truncated prefix — the sliced formulation's semantics, which the PQ
  * subspace sites rely on even at start=1 (a 64-dim residual against an
  * 8-dim codeword) — whereas the UNsliced `zip_with(a, b, …)` two call
  * sites replaced with start=1 (`l2Expr`, `distArr`) would NULL-poison
  * on any mismatch. Those two sites pass equal-length arrays by
  * construction, so the difference is latent there; it is the sliced
  * fold, not the unsliced one, that this expression implements. */
case class SquaredL2Slice(left: Expression, right: Expression, start: Int)
    extends VectorFold {

  require(start >= 1, s"slice start is 1-based, got $start")

  override def prettyName: String = "graft_l2_slice"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = y.numElements()
    if (x.numElements() - (start - 1) < n) null
    else {
      val (xd, yd) = (isDouble(left), isDouble(right))
      var acc = 0.0d
      var i = 0
      while (i < n) {
        val d = elem(x, start - 1 + i, xd) - elem(y, i, yd)
        acc += d * d
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val off = s"(${start - 1} + $i)"
      s"""
         |final int $n = $b.numElements();
         |if ($a.numElements() - ${start - 1} < $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0d;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $d = ${getter(a, off, isDouble(left))} -
         |      ${getter(b, i, isDouble(right))};
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredL2Slice =
    copy(left = newLeft, right = newRight)
}

object VectorOps {

  private val dotBuilder = { exprs: Seq[Expression] =>
    require(exprs.length == 2, "graft_dot takes exactly 2 arguments")
    DotProduct(exprs.head, exprs(1))
  }

  private val l2Builder = { exprs: Seq[Expression] =>
    require(exprs.length == 3, "graft_l2_slice takes (a, b, startLiteral)")
    val st = exprs(2) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
          if v != null => v.toString.toInt
      case other => throw new IllegalArgumentException(
        s"graft_l2_slice start must be an integer literal, got $other")
    }
    SquaredL2Slice(exprs.head, exprs(1), st)
  }

  /** Register `graft_dot(a, b)` and `graft_l2_slice(a, b, start)` for
    * `expr(...)` strings (incl. lambda bodies). Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_dot", dotBuilder, "built-in")
    reg.createOrReplaceTempFunction("graft_l2_slice", l2Builder, "built-in")
  }

  /** Session-extension installer (the DuckdbCompat.install idiom): the
    * bucket/signature expression STRINGS (`bucketExpr`, tuned tables)
    * are built at object init and consumed by ~15 query sites — a
    * session-wide injection beats per-site register calls. */
  def install(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      new ExpressionInfo(getClass.getCanonicalName, "graft_dot"),
      dotBuilder))
    ext.injectFunction((FunctionIdentifier("graft_l2_slice"),
      new ExpressionInfo(getClass.getCanonicalName, "graft_l2_slice"),
      l2Builder))
  }
}
