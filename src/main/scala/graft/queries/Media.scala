package graft.queries

import org.apache.spark.sql.functions._

import graft.engine.Multimodal
import Tables._

/** Multimodal-column query surface: drives the binary decode path
  * (Multimodal.withDecodedMeta — mapPartitions, decoder initialized once
  * per partition) end to end as an oracle-checked declared query. The
  * testdata has no media table, so document text stands in as the opaque
  * payload (CAST(text AS BINARY)). ALL FOUR stub-decoded fields are
  * oracle-checked: format sniffing and byte length directly, and the
  * stub's width/height via the oracle recomputing the identical
  * polynomial byte checksum (fold of a*31+byte masked to 24 bits) over
  * the blob's hex expansion — so the whole mapPartitions decode path,
  * not just its cheap fields, is hash-gated.
  *
  * Scale: the decode is per-partition map work with zero shuffles; the
  * binary column rides next to its metadata, so queries not touching it
  * never read those parquet pages.
  */
object Media {

  val mediaMeta: Q = (s, dir) => {
    // top-k BEFORE the decode: the sort key (doc_id) is independent of the
    // decoded fields, so the expensive per-row decode runs on 500 rows,
    // not the corpus (the features-after-limit discipline, as in TextOps).
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("media"))
      .orderBy(col("doc_id"))
      .limit(500)
    Multimodal.withDecodedMeta(docs, "media")
      .select(col("doc_id"), col("meta.format").as("format"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.n_bytes").as("n_bytes"))
      .orderBy(col("doc_id"))
  }

  val mediaMetaSql: String =
    """WITH b AS (SELECT doc_id, encode(text) AS blob FROM documents
      |           ORDER BY doc_id LIMIT 500),
      |s AS (SELECT doc_id, blob,
      |        list_reduce(list_prepend(CAST(0 AS BIGINT),
      |          list_transform(range(0, octet_length(blob)),
      |            i -> CAST(('0x' || substr(hex(blob),
      |                   CAST(i * 2 + 1 AS INT), 2)) AS BIGINT))),
      |          (a, x) -> (a * 31 + x) & 16777215) AS csum
      |      FROM b)
      |SELECT doc_id,
      |  CASE WHEN starts_with(upper(hex(blob)), '89504E47') THEN 'png'
      |       WHEN starts_with(upper(hex(blob)), 'FFD8') THEN 'jpeg'
      |       ELSE 'bin' END AS format,
      |  CAST(csum % 1920 + 1 AS INT) AS width,
      |  CAST(csum // 1920 % 1080 + 1 AS INT) AS height,
      |  CAST(octet_length(blob) AS BIGINT) AS n_bytes
      |FROM s ORDER BY doc_id""".stripMargin

  val queries: Map[String, Q] = Map("p_media_meta" -> mediaMeta)
  val oracle: Map[String, String] = Map("p_media_meta" -> mediaMetaSql)
}
