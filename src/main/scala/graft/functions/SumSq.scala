package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` UDAF: exact sum of squares over BIGINT.
  *
  * The reference exposes no UDF registration of its own (its only scalar
  * surface is what DuckDB ships — /root/reference/src/duckdb.ts:46-49), so
  * this is API-surface breadth on our side: the Spark-idiomatic way to add
  * an aggregate the engine lacks — a typed `Aggregator` usable both from
  * the Dataset API (`SumSq.toColumn`) and from SQL via
  * `spark.udf.register("sum_sq", functions.udaf(SumSq))`.
  *
  * Scale: `reduce` folds map-side per partition and `merge` combines
  * partial buffers, so the shuffle carries one Long per group per
  * partition — the same two-phase shape as built-in hash aggregates.
  * Integer arithmetic throughout: deterministic at any parallelism.
  */
object SumSq extends Aggregator[Long, Long, Long] {
  override def zero: Long = 0L
  override def reduce(buf: Long, x: Long): Long = buf + x * x
  override def merge(a: Long, b: Long): Long = a + b
  override def finish(r: Long): Long = r
  override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
