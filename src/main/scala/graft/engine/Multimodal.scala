package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * BINARY columns with typed metadata, decoded/feature-extracted in
  * batches. (North-star extension; the reference has no media handling.)
  *
  * The actual codecs are NOT available in this environment, so the decode
  * step is a clearly-marked deterministic stub — but the Spark-side shape
  * is the real one:
  *  - media rides as `binary` next to its metadata; Spark never interprets
  *    it, so pruning/pushdown on the metadata columns still works and a
  *    query that doesn't touch `media` never reads those parquet pages;
  *  - decoding runs via `mapPartitions`, so a real decoder is initialized
  *    ONCE per partition (the JVM analog of `mapInPandas` batching), never
  *    per row;
  *  - at 100 TB: size partitions by `spark.sql.files.maxPartitionBytes` so
  *    a partition of blobs fits executor memory; derived features (dims,
  *    fingerprints, frame samples) persist as ordinary columns for
  *    downstream relational work.
  */
object Multimodal {

  /** Typed metadata a real decoder would produce. */
  final case class MediaMeta(
      format: String, width: Int, height: Int, nBytes: Long)

  /** A decoder turns one payload into metadata. Real implementations wrap
    * a native library handle that is expensive to construct — hence the
    * once-per-partition discipline below. */
  trait Decoder extends Serializable {
    def init(): Unit = ()
    def decode(bytes: Array[Byte]): MediaMeta
  }

  /** STUB decoder — deterministic fake in place of the absent codec: fakes
    * format from magic bytes and dimensions from a byte checksum. Replace
    * with a real codec binding in production; everything around it stays. */
  object StubDecoder extends Decoder {
    def decode(bytes: Array[Byte]): MediaMeta = {
      val magic = bytes.take(4).map(b => f"${b & 0xff}%02x").mkString
      val format = magic match {
        case m if m.startsWith("89504e47") => "png"
        case m if m.startsWith("ffd8") => "jpeg"
        case _ => "bin"
      }
      val sum = bytes.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) & 0xffffff)
      MediaMeta(format, (sum % 1920 + 1).toInt, (sum / 1920 % 1080 + 1).toInt,
        bytes.length.toLong)
    }
  }

  /** Decode a binary column into a `meta` struct, decoder initialized once
    * per partition. Input rows pass through unchanged. */
  def withDecodedMeta(
      df: DataFrame, binaryCol: String,
      decoder: Decoder = StubDecoder): DataFrame = {
    val spark = df.sparkSession
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    import org.apache.spark.sql.types._
    val metaType = StructType(Seq(
      StructField("format", StringType), StructField("width", IntegerType),
      StructField("height", IntegerType), StructField("n_bytes", LongType)))
    val outSchema = df.schema.add(StructField("meta", metaType))
    val idx = df.schema.fieldIndex(binaryCol)
    val out: Dataset[Row] = df.mapPartitions { it =>
      decoder.init() // once per partition — the point of mapPartitions
      it.map { row =>
        val m = decoder.decode(row.getAs[Array[Byte]](idx))
        Row.fromSeq(row.toSeq :+ Row(m.format, m.width, m.height, m.nBytes))
      }
    }(RowEncoder.encoderFor(outSchema))
    out
  }

  /** Deterministic frame sampling stub: n evenly spaced 16-byte slices of
    * the payload stand in for decoded video frames; the output shape
    * (array<binary> per row, exploded downstream) is the real one. */
  def sampleFrames(df: DataFrame, binaryCol: String, n: Int): DataFrame =
    df.withColumn("frames",
      expr(s"transform(sequence(0, $n - 1), i -> " +
        s"substring($binaryCol, CAST(i * greatest(length($binaryCol) div $n, 1) AS INT) + 1, 16))"))

  /** Feature-extraction stub: a `dim`-float embedding per payload, derived
    * deterministically from content hashes (values in [-1, 1]). A real
    * model replaces the expression with a batched encoder behind the same
    * column contract: `array<float>` named `embedding`, ready for the
    * `p_sim_*` ANN path (Similarity.scala) unchanged. Pure codegen'd SQL
    * expressions — no UDF, no per-row JVM boundary — so it runs inside
    * whole-stage codegen and scales map-side with zero shuffles. */
  def withStubEmbedding(
      df: DataFrame, binaryCol: String, dim: Int): DataFrame =
    df.withColumn("embedding",
      expr(s"""transform(sequence(0, $dim - 1), i ->
        |  CAST((CAST(CONV(SUBSTRING(md5(concat(base64($binaryCol), CAST(i AS STRING))), 1, 7), 16, 10) AS DOUBLE)
        |        / 134217728.0 - 1.0) AS FLOAT))""".stripMargin))

  /** Resize stub: clamps the payload to `maxBytes` (real impl: decode →
    * scale → re-encode inside the same per-partition decoder discipline as
    * `withDecodedMeta`). Keeps the binary column contract. */
  def resizeStub(df: DataFrame, binaryCol: String, maxBytes: Int): DataFrame =
    df.withColumn(binaryCol,
      expr(s"substring($binaryCol, 1, $maxBytes)"))
}
