package graft.queries

import org.apache.spark.sql.functions._

import graft.engine.Multimodal
import Tables._

/** Multimodal-column query surface: drives the binary decode path
  * (Multimodal.withDecodedMeta — mapPartitions, decoder initialized once
  * per partition) end to end as an oracle-checked declared query. The
  * testdata has no media table, so document text stands in as the opaque
  * payload (CAST(text AS BINARY)); format sniffing and byte length are the
  * two stub-decoded fields an oracle can recompute exactly (width/height
  * come from the stub's JVM checksum and stay spec-tested instead).
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
        col("meta.n_bytes").as("n_bytes"))
      .orderBy(col("doc_id"))
  }

  val mediaMetaSql: String =
    """SELECT doc_id,
      |  CASE WHEN starts_with(upper(hex(CAST(text AS BLOB))), '89504E47')
      |         THEN 'png'
      |       WHEN starts_with(upper(hex(CAST(text AS BLOB))), 'FFD8')
      |         THEN 'jpeg'
      |       ELSE 'bin' END AS format,
      |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes
      |FROM documents ORDER BY doc_id LIMIT 500""".stripMargin

  val queries: Map[String, Q] = Map("p_media_meta" -> mediaMeta)
  val oracle: Map[String, String] = Map("p_media_meta" -> mediaMetaSql)
}
