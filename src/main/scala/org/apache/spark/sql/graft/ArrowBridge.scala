package org.apache.spark.sql.graft

import org.apache.arrow.vector.types.pojo.Schema
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.util.ArrowUtils

/** Bridge to Spark's own Arrow serialization, which is `private[sql]`
  * (it backs `collectAsArrowToPython`/`toPandas` but has no public Scala
  * surface in Spark 4.1). Lives in an `org.apache.spark.sql` subpackage
  * solely to satisfy the access qualifier — the standard ecosystem
  * pattern for this gap. Using Spark's converter instead of hand-rolling
  * one means full type coverage and, crucially, DISTRIBUTED encoding:
  * executors produce the IPC record-batch messages, the driver only
  * relays bytes. Consumed by `graft.engine.Export.toArrowStream`.
  */
object ArrowBridge {

  /** The DataFrame's schema as an Arrow schema (session time zone applies
    * to timestamp columns). */
  def arrowSchema(df: DataFrame): Schema = {
    val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    // must mirror what toArrowBatchRdd reads from the session conf, or
    // the stream header would disagree with the executor-encoded batches:
    // useLargeVarTypes switches Utf8/Binary to the Large variants, and
    // errorOnDuplicatedFieldNames is derived from the pandas
    // struct-handling mode ("legacy" errors on duplicate struct fields)
    val large = df.sparkSession.conf
      .get("spark.sql.execution.arrow.useLargeVarTypes", "false").toBoolean
    val errOnDup = df.sparkSession.conf
      .get("spark.sql.execution.pandas.structHandlingMode", "legacy") == "legacy"
    ArrowUtils.toArrowSchema(df.schema, tz,
      errorOnDuplicatedFieldNames = errOnDup, largeVarTypes = large)
  }

  /** Fully-framed Arrow IPC record-batch messages, one chunk per
    * partition slice, encoded on the executors. */
  def arrowBatches(df: DataFrame): RDD[Array[Byte]] =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
      .toArrowBatchRdd
}
