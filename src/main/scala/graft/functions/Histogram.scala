package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `histogram(x)` — DuckDB's per-group value-count aggregate (delegated
  * surface, `/root/reference/src/duckdb.ts:46-49`): a MAP from each
  * distinct non-NULL value of `x` to its row count, entries sorted by
  * key, exactly DuckDB's output shape (NULL inputs are skipped there
  * too). Spark has no map-building counting aggregate, so this is a
  * native `TypedImperativeAggregate`: the buffer is a hash map that
  * folds map-side per partition and merges partial maps at the exchange
  * — the same two-phase shape as built-in hash aggregates, so the
  * shuffle carries one (value → count) map per group per partition, not
  * rows. Distinct-value cardinality per group is the caller's contract
  * (DuckDB's histogram materializes the same map); a high-cardinality
  * column belongs in a GROUP BY, not a histogram.
  *
  * Key types: the atomic fixed-width types + strings — the set with an
  * unambiguous byte serialization below. Anything else (decimals,
  * nested types) fails type-checking loudly.
  */
case class Histogram(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Any, Long]]
  with UnaryLike[Expression] {

  override def prettyName: String = "histogram"
  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(child.dataType, LongType, valueContainsNull = false)

  private def supported(dt: DataType): Boolean = dt match {
    case StringType | BooleanType | ByteType | ShortType | IntegerType |
        LongType | FloatType | DoubleType | DateType | TimestampType |
        TimestampNTZType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (supported(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"histogram keys of type ${child.dataType.sql} are not supported —" +
        " group by the expression instead (SELECT x, COUNT(*) GROUP BY x)")

  override def createAggregationBuffer(): mutable.HashMap[Any, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[Any, Long],
      input: InternalRow): mutable.HashMap[Any, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // the scan may reuse the backing buffer of a UTF8String between
      // rows — copy before the value outlives this call as a map key
      val k = v match {
        case s: UTF8String => s.copy()
        case other => other
      }
      buf.update(k, buf.getOrElse(k, 0L) + 1L)
    }
    buf
  }

  override def merge(
      a: mutable.HashMap[Any, Long],
      b: mutable.HashMap[Any, Long]): mutable.HashMap[Any, Long] = {
    b.foreach { case (k, n) => a.update(k, a.getOrElse(k, 0L) + n) }
    a
  }

  override def eval(buf: mutable.HashMap[Any, Long]): Any = {
    val ordering = TypeUtils.getInterpretedOrdering(child.dataType)
      .asInstanceOf[Ordering[Any]]
    val sorted = buf.toSeq.sortBy(_._1)(ordering)
    new ArrayBasedMapData(
      new GenericArrayData(sorted.map(_._1)),
      new GenericArrayData(sorted.map(_._2)))
  }

  override def serialize(buf: mutable.HashMap[Any, Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (k, n) =>
      child.dataType match {
        case StringType =>
          val b = k.asInstanceOf[UTF8String].getBytes
          out.writeInt(b.length); out.write(b)
        case BooleanType => out.writeBoolean(k.asInstanceOf[Boolean])
        case ByteType => out.writeByte(k.asInstanceOf[Byte].toInt)
        case ShortType => out.writeShort(k.asInstanceOf[Short].toInt)
        case IntegerType | DateType => out.writeInt(k.asInstanceOf[Int])
        case LongType | TimestampType | TimestampNTZType =>
          out.writeLong(k.asInstanceOf[Long])
        case FloatType => out.writeFloat(k.asInstanceOf[Float])
        case DoubleType => out.writeDouble(k.asInstanceOf[Double])
        case other => throw new IllegalStateException(
          s"histogram: unreachable key type $other") // checkInputDataTypes
      }
      out.writeLong(n)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Any, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[Any, Long]
    var i = 0
    while (i < n) {
      val k: Any = child.dataType match {
        case StringType =>
          val len = in.readInt()
          val b = new Array[Byte](len)
          in.readFully(b)
          UTF8String.fromBytes(b)
        case BooleanType => in.readBoolean()
        case ByteType => in.readByte()
        case ShortType => in.readShort()
        case IntegerType | DateType => in.readInt()
        case LongType | TimestampType | TimestampNTZType => in.readLong()
        case FloatType => in.readFloat()
        case DoubleType => in.readDouble()
        case other => throw new IllegalStateException(
          s"histogram: unreachable key type $other")
      }
      buf.update(k, in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): Histogram =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): Histogram =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Histogram =
    copy(child = newChild)
}
