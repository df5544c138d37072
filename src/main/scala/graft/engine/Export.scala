package graft.engine

import org.apache.spark.sql.DataFrame

/** CSV export — A15 (RFC-4180 escaper) and A16 (streaming export);
  * reference `/root/reference/src/arrow.ts:17-26,47-88`,
  * `src/App.tsx:504-531`.
  *
  * Two paths, mirroring the reference's split:
  *  - `toCsvParts`: driver-side streaming via `toLocalIterator` (the analog
  *    of the Arrow record-batch iterator) with the reference's ~1e6-char
  *    flush parts, every cell through the A14 formatter. For interactive
  *    export of a result a human will open.
  *  - `writeCsv`: the at-scale path — a fully distributed
  *    `df.write.csv(header=true)`, which is RFC-4180 and never funnels the
  *    dataset through the driver. A 100 TB export must use this one.
  */
object Export {

  /** A15: quote iff the cell contains `"`, `,`, `\n` or `\r`; double
    * internal quotes (`src/arrow.ts:17-22`). */
  def csvEscape(value: String): String =
    if (value.exists(c => c == '"' || c == ',' || c == '\n' || c == '\r'))
      "\"" + value.replace("\"", "\"\"") + "\""
    else value

  /** A15: one CRLF-terminated CSV line (`src/arrow.ts:24-26`). */
  def csvLine(cells: Seq[String]): String =
    cells.map(csvEscape).mkString(",") + "\r\n"

  final case class CsvExport(parts: Seq[String], rows: Long, columns: Int)

  /** The reference's flush-chunk size (`src/arrow.ts:53`). */
  val FlushChars = 1000000

  /** A16: streaming export — header from the schema, cells through the A14
    * formatter, buffer flushed to a new part every ~`flushChars` chars.
    * Streams one partition at a time to the driver; peak driver memory is
    * one partition + one part, not the result. */
  def toCsvParts(
      df: DataFrame, header: Boolean = true,
      flushChars: Int = FlushChars): CsvExport = {
    val columns = df.columns
    val parts = Seq.newBuilder[String]
    val buffer = new StringBuilder
    var rows = 0L
    if (header) buffer.append(csvLine(columns.toSeq))
    Engine.stream(df).foreach { row =>
      buffer.append(csvLine(row.toSeq.map(Render.formatCell)))
      rows += 1
      if (buffer.length >= flushChars) {
        parts += buffer.result()
        buffer.clear()
      }
    }
    if (buffer.nonEmpty) parts += buffer.result()
    CsvExport(parts.result(), rows, columns.length)
  }

  /** The distributed export: executors write in parallel, header per part
    * file, RFC-4180 quoting — the only correct shape at 100 TB.
    * escape="\"" because Spark's writer defaults to BACKSLASH escapes,
    * which is not RFC-4180 (`"say \"hi\""` instead of `"say ""hi"""`) —
    * caught by the ExportSpec round-trip. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.option("header", "true").option("escape", "\"")
      .mode("overwrite").csv(path)

  /** Distributed NDJSON export (the `COPY TO (FORMAT json)` analog of the
    * delegated writer surface) — one JSON object per line, readable back by
    * `Catalog`'s `.ndjson` route. */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Distributed parquet export (`COPY TO (FORMAT parquet)` analog) —
    * self-describing schema, the right interchange format at scale. */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** Distributed ORC export (beyond-reference: Spark-native columnar
    * alternative, readable back through `Catalog`'s `.orc` route). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Arrow IPC stream export — the reference's native result surface (its
    * queries return Arrow Tables, `/root/reference/src/duckdb.ts:46-49`),
    * so a caller migrating from it can consume bit-compatible Arrow.
    * Record batches are serialized DISTRIBUTED (one IPC message per
    * partition chunk, executors do the columnar encoding) and streamed to
    * `out` one batch at a time — the driver holds a single batch, never
    * the result, so the export scales like `toCsvParts` but in Arrow's
    * columnar frame format. */
  def toArrowStream(df: DataFrame, out: java.io.OutputStream): Unit = {
    import org.apache.arrow.vector.ipc.{ArrowStreamWriter, WriteChannel}
    import org.apache.arrow.vector.ipc.message.{IpcOption, MessageSerializer}
    import org.apache.spark.sql.graft.ArrowBridge
    val ch = new WriteChannel(java.nio.channels.Channels.newChannel(out))
    MessageSerializer.serialize(ch, ArrowBridge.arrowSchema(df))
    // the bridge emits fully-framed IPC record-batch messages; pull them
    // in partition order and append verbatim.
    ArrowBridge.arrowBatches(df).toLocalIterator
      .foreach(batch => ch.write(batch))
    ArrowStreamWriter.writeEndOfStream(ch, IpcOption.DEFAULT)
  }
}
