package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Native twin of the posting-list pair explosion (r21, guide §1.2):
  * all ordered pairs (ds[i], ds[j]) with i < j of a BIGINT array, in
  * the exact order of the higher-order formulation it replaces —
  *
  *   flatten(transform(ds, (a, i) ->
  *     transform(slice(ds, i + 2, size(ds)),
  *               d -> named_struct('d1', a, 'd2', d))))
  *
  * (outer index ascending, inner ascending). The lambda version
  * evaluates interpreted per element and allocates a slice per outer
  * element — O(n²) boxed evaluations per posting list; this builds the
  * n(n-1)/2 structs in one flat loop. NULL in → NULL out; empty or
  * 1-element lists yield an empty array, as flatten-of-empties does.
  */
case class SortedPairs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // containsNull arrays are REJECTED (ADVICE r21): `pairs` reads slots
    // with getLong, which renders a null element as 0 — silently wrong
    // pairs where the lambda formulation would emit null struct fields.
    // The one call site feeds array_sort(graft_capped_longs(...)), whose
    // element type is non-null by construction.
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> with non-null elements," +
        s" got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("d1", LongType, nullable = false),
      StructField("d2", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_sorted_pairs"

  override def nullSafeEval(input: Any): Any =
    SortedPairs.pairs(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SortedPairs.pairs($c)")

  override protected def withNewChildInternal(
      newChild: Expression): SortedPairs = copy(child = newChild)
}

object SortedPairs {

  /** All (ds[i], ds[j]) i<j as rows, outer-ascending then inner —
    * static so codegen can call it directly. */
  def pairs(ds: ArrayData): ArrayData = {
    val n = ds.numElements()
    val out = new Array[Any](if (n < 2) 0 else n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n - 1) {
      val a = ds.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = InternalRow(a, ds.getLong(j))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Register `graft_sorted_pairs(a)` for `expr(...)` strings.
    * Idempotent (the cosine_sim registration pattern). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sorted_pairs",
      { exprs: Seq[Expression] =>
        require(exprs.length == 1, "graft_sorted_pairs takes 1 argument")
        SortedPairs(exprs.head)
      },
      "built-in")
}
