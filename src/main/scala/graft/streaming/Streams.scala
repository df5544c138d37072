package graft.streaming

import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming over the `events` shape — the beyond-reference
  * extension (SURVEY §7.5): the reference is batch-only (its one async
  * iterator is result pagination, `/root/reference/src/arrow.ts:60`), but a
  * training-data pipeline ingests event streams, so the engine ships
  * stream-native versions of its aggregations.
  *
  * Everything here takes a DataFrame/Dataset and works identically whether
  * the source is `readStream` (kafka/files at scale) or a batch table —
  * transformations are source-agnostic; only the sink call differs. The
  * batch twin of `hourlyCounts` is the oracle-checked `c_event_hourly`.
  *
  * Scale notes: watermarks bound state (2h of hour-buckets × event types);
  * session state is per-user and evicted on timeout, so state size tracks
  * ACTIVE keys, not history. Shuffle partitioning on the group keys is the
  * same as the batch aggregations.
  */
object Streams {

  /** Watermarked tumbling-window counts per event type: the streaming twin
    * of `c_event_hourly`. Late events beyond 2h are dropped (state bound);
    * output in Append mode emits only finalized windows. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hora"), col("event_type"), col("n"))

  /** Built-in gap-based session windows per user (Spark's session_window
    * + watermark — preferred over custom state when gap semantics fit). */
  def sessionCounts(events: DataFrame, gap: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("n_events"))

  /** Streaming exact dedup — the stream twin of `p_dedup_exact`: drop
    * repeats of a content key, with the watermark bounding the dedup state
    * to the late-arrival horizon (unbounded-history dedup is a state leak
    * at 100 TB; `dropDuplicatesWithinWatermark` expires keys once they
    * cannot collide with admissible late data anymore). */
  def dedupStream(events: DataFrame, keyCols: Seq[String]): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming curation front — the stream twin of the batch
    * `p_pipeline_full` prefix (URL canonicalization → URL-level dedup →
    * PII scrub): a crawl stream collapses recrawls of the same canonical
    * URL within the late-arrival horizon (state bounded exactly like
    * `dedupStream`) and redacts PII BEFORE anything persists — the
    * compliance ordering a real ingest requires. Reuses the batch Column
    * transforms verbatim (`Curation.canonicalUrl` / `redactPii`, whose
    * algebraic laws CurationSpec pins), so the batch and stream paths
    * cannot drift. */
  def curateStream(docs: DataFrame): DataFrame =
    docs
      .withColumn("canon", graft.queries.Curation.canonicalUrl(col("url")))
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark(Seq("canon"))
      .withColumn("text", graft.queries.Curation.redactPii(col("text")))
      .drop("url")

  /** Streaming near-dup front — the stream twin of `p_dedup_minhash`'s
    * candidate generation (VERDICT r10 #7): MinHash signature and band
    * keys via the batch Column transforms VERBATIM
    * (`Dedup.withMinhashSig` / `Dedup.withBandKeys` — the exact code the
    * batch LSH index runs), then keyed-state dedup per (band, key)
    * bucket under the watermark: the FIRST document to claim an LSH
    * bucket becomes its representative, and a later near-duplicate —
    * whose 4 band keys all collide with already-claimed buckets —
    * contributes no new claims. The output is the bucket→representative
    * claim stream (doc_id, ts, band, key): the incrementally built LSH
    * index a downstream exact-verifier joins candidates against, exactly
    * as the batch pipeline self-joins its band relation. State = one row
    * per claimed bucket inside the late-arrival horizon
    * (`dropDuplicatesWithinWatermark` expires the rest), so at 100 TB
    * state tracks distinct buckets in the watermark window, never corpus
    * history. */
  def nearDupStream(docs: DataFrame): DataFrame =
    graft.queries.Dedup.withBandKeys(
        graft.queries.Dedup.withMinhashSig(docs))
      .select(col("doc_id"), col("ts"),
        expr("stack(4, 0, k0, 1, k1, 2, k2, 3, k3)").as(Seq("band", "key")))
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark(Seq("band", "key"))

  /** Stream-stream interval join: purchases matched to clicks by the same
    * user within the preceding hour — the streaming twin of the batch
    * as-of join (c_join_asof). BOTH sides need watermarks plus a time-band
    * join condition: together they bound the buffered state to the band
    * (without them a stream-stream join must buffer forever). State size
    * tracks (active users × 1h of events), not history. */
  def purchasesWithRecentClicks(
      purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases.withWatermark("ts", "1 hour")
    val c = clicks
      .withColumnRenamed("user_id", "c_user_id")
      .withColumnRenamed("ts", "c_ts")
      .withWatermark("c_ts", "1 hour")
    p.join(c,
      col("user_id") === col("c_user_id") &&
        col("c_ts") >= col("ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("ts"))
  }

  /** Stream-static join: enrich a stream with a batch dimension table.
    * Spark re-plans the static side per micro-batch; with a small dim the
    * planner broadcasts it, so the stream side never shuffles — the
    * standard streaming-enrichment shape (the streaming twin of
    * `c_join_inner`'s broadcast dim). */
  def enriched(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  final case class Event(user_id: Long, ts: Timestamp, event_type: String)
  final case class UserTotal(user_id: Long, n_events: Long, n_errors: Long)

  /** Custom keyed state via mapGroupsWithState: running per-user totals —
    * the KeyValueGroupedDataset escape hatch for semantics the built-in
    * windows can't express. In production add
    * `GroupStateTimeout.ProcessingTimeTimeout` + `setTimeoutDuration` so
    * abandoned keys evict (bounding state); NoTimeout here keeps the
    * micro-batch loop quiescent between inputs, which test harnesses
    * (`processAllAvailable`) rely on. */
  def runningUserTotals(events: Dataset[Event]): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserTotal, UserTotal](GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserTotal]) =>
          val prev = state.getOption.getOrElse(UserTotal(userId, 0L, 0L))
          val evs = batch.toSeq
          val next = UserTotal(userId,
            prev.n_events + evs.size,
            prev.n_errors + evs.count(_.event_type == "error"))
          state.update(next)
          next
      }
  }

  /** Streaming ingestion INTO the IVF at-rest layout: new embeddings are
    * assigned to their coarse centroid MAP-SIDE with the exact batch
    * transform (`Similarity.withCentroid` — the code `p_sim_ivf_pruned`'s
    * layout writer runs) and appended to the centroid-partitioned parquet
    * layout via `writeStream.partitionBy`, so a partition-pruned nprobe
    * read stays valid as the corpus streams in. Stateless: no watermark,
    * no shuffle — each micro-batch is codegen map work plus a partitioned
    * file append, which is what lets ingestion keep up at production
    * rates. The codebook is the frozen trained artifact; retraining it
    * (see `p_sim_kmeans_step`) means rewriting the layout, exactly as in
    * a batch IVF rebuild. */
  def ivfIngest(
      embs: DataFrame,
      cents: Seq[(Long, Array[Float])],
      path: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    graft.queries.Similarity.withCentroid(embs, cents)
      .writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("cent_id")
      .start()

  /** Streaming maintenance of the dedup band index (VERDICT r12 #7 — the
    * `ivfIngest` pattern applied to dedup): accepted documents APPEND
    * their 4 MinHash band keys to the at-rest index that
    * `p_dedup_incremental` probes, so the daily-batch admission loop and
    * the streaming ingest maintain ONE index. The transform chain is the
    * batch code VERBATIM (`Dedup.withMinhashSig` → `Dedup.withBandKeys` —
    * the same Columns `minhashBands` builds its relation from), then a
    * stateless partitioned parquet append: band is the partition column,
    * so a probe for (band, key) lists 1 of 4 directories and pushes the
    * key onto row-group stats. Stateless by design — the index stores
    * EVERY admitted doc's keys (history is the point; bucket caps apply
    * at PROBE time, exactly as `incremental`'s `<= DfCap` filter), so
    * there is no watermark and no keyed state to bound: each micro-batch
    * is codegen map work + a file append, which is what keeps ingest at
    * production rates. Retention/compaction of the index is a layout
    * rewrite, as with the IVF layout. */
  def dedupIndexIngest(
      docs: DataFrame,
      path: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    graft.queries.Dedup.withBandKeys(
        graft.queries.Dedup.withMinhashSig(docs))
      .select(col("doc_id"),
        expr("stack(4, 0, k0, 1, k1, 2, k2, 3, k3)").as(Seq("band", "key")))
      .writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("band")
      .start()

  /** Streaming upsert into a parquet layout — the routed `ON CONFLICT`
    * statement's streaming twin: each micro-batch merges into the
    * at-rest layout through the SAME copy-on-write merge the statement
    * uses (`Dml.mergeIntoAll` — matched keys take the batch's row via
    * the key-span-pruned broadcast rewrite, fresh keys append), so
    * continuous ingestion of a mutable metadata/document store
    * maintains ONE layout with the batch path and cannot drift from it.
    * `foreachBatch` because a merge is not an append: the sink rewrites
    * files, which the streaming file sink cannot express. Restart
    * safety is the merge's own idempotence — re-merging a replayed
    * micro-batch matches the same keys to the same values and finds no
    * fresh keys, so at-least-once delivery converges to exactly-once
    * layout state. Duplicate keys WITHIN one micro-batch refuse via the
    * merge's uniqueness guard (dedup upstream with `dedupStream`). */
  def upsertStream(
      source: DataFrame, path: String, checkpoint: String,
      keys: Seq[String],
      setCols: Seq[String]): org.apache.spark.sql.streaming.StreamingQuery =
    source.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.engine.Dml.mergeIntoAll(
          batch.sparkSession, path, batch, keys, setCols)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** Streaming twin of `p_decontaminate` (r18): each micro-batch's
    * documents check against the STATIC eval n-gram relation through
    * the SAME broadcast transform the batch query runs
    * (`Dedup.contaminatedAgainst`), appending contamination flags to a
    * parquet sink. Per-batch grouping IS the global per-doc grouping —
    * a document arrives in exactly one micro-batch — so batch and
    * stream flags cannot drift; the eval side is a bounded model-like
    * artifact (a benchmark's n-grams), broadcast to every batch, and
    * state is ZERO (no watermark, no keyed store): the scale shape a
    * continuously-ingesting training pipeline needs for its
    * contamination gate. */
  def decontaminateStream(
      docs: DataFrame, evalGrams: DataFrame, path: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.queries.Dedup.contaminatedAgainst(batch, evalGrams)
          .write.mode("append").parquet(path)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** Streaming twin of `p_chunk_docs`: overlap-window chunking on the
    * document stream via `TextOps.withChunks` VERBATIM — stateless Column
    * work (explode + slice), so each micro-batch is pure map work with no
    * watermark or keyed state, and the batch and stream chunkers cannot
    * drift. Non-text input columns (doc_id, event time) ride through onto
    * every chunk row, so a downstream windowed aggregate can watermark on
    * the original event time. */
  def chunkStream(docs: DataFrame): DataFrame =
    graft.queries.TextOps.withChunks(docs)

  final case class CompactionStats(
      rowsBefore: Long, rowsAfter: Long,
      bytesBefore: Long, bytesAfter: Long, bucketsDropped: Long)

  /** Compaction of the at-rest dedup band index (VERDICT r14 #2 — the
    * rewrite `dedupIndexIngest`'s docs defer): apply the probe-time
    * bucket cap to STORAGE. The probe rule is `count <= DfCap`
    * (`Dedup.incremental`): an over-cap bucket is ignored ENTIRELY at
    * probe time — boilerplate keys, no dedup signal — so the
    * semantics-preserving compaction drops those buckets WHOLE. (Merely
    * trimming an over-cap bucket's tail would be wrong: the shrunken
    * bucket would pass the `<= DfCap` filter and start producing probe
    * hits it never produced before. StreamsSpec proves probe parity by
    * set equality.)
    *
    * Scale shape: the over-cap relation is tiny by construction (the few
    * hot boilerplate buckets), so it broadcasts into an anti-join and the
    * rewrite is one map-shaped job over the index, written back
    * partitioned by band — same layout, fewer bytes. The in-place swap
    * drops the streaming sink's `_spark_metadata` log: compaction
    * FINALIZES the segment into a plain batch layout (run it with the
    * ingest quiesced; a resumed ingest starts a fresh checkpoint/segment,
    * exactly as an IVF retrain rewrites its layout — production table
    * formats make this swap atomic under their manifest, which is the
    * same out-of-scope layer as in `engine/Dml.scala`). */
  def compactDedupIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String): CompactionStats = {
    def parquetBytes(): Long = {
      val st = java.nio.file.Files.walk(java.nio.file.Paths.get(path))
      try st.iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .map(java.nio.file.Files.size).sum
      finally st.close()
    }
    val bytesBefore = parquetBytes()
    val before = spark.read.parquet(path).select("doc_id", "band", "key")
    val rowsBefore = before.count()
    val over = before.groupBy(col("band"), col("key"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") > graft.queries.Dedup.DfCap)
      .select(col("band"), col("key"))
    val bucketsDropped = over.count()
    val kept = before.join(broadcast(over), Seq("band", "key"), "left_anti")
    val tmp = java.nio.file.Paths.get(
      s"${path}_compact_p${ProcessHandle.current.pid}")
    kept.write.mode("overwrite").partitionBy("band").parquet(tmp.toString)
    // swap: rename the live segment ASIDE, move the compacted layout into
    // place, THEN delete the renamed original — a crash mid-swap leaves a
    // recoverable full copy (the aside dir), unlike a delete-first swap
    // whose crash window strands the only copy in the tmp dir
    val root = java.nio.file.Paths.get(path)
    val aside = java.nio.file.Paths.get(
      s"${path}_old_p${ProcessHandle.current.pid}")
    java.nio.file.Files.move(root, aside)
    java.nio.file.Files.move(tmp, root)
    def clear(p: java.nio.file.Path): Unit = {
      val st = java.nio.file.Files.walk(p)
      val all = try st.iterator().asScala.toSeq.reverse finally st.close()
      all.foreach(java.nio.file.Files.deleteIfExists(_))
    }
    clear(aside)
    val after = spark.read.parquet(path)
    CompactionStats(rowsBefore, after.count(), bytesBefore, parquetBytes(),
      bucketsDropped)
  }

  /** Streaming twin of BPE token accounting (round 16): annotate each
    * incoming document with its tokenizer token count using the TRAINED
    * merges artifact — the model ships to the stream as inlined
    * literals (`Bpe.withTokenCount`, shared verbatim), so the query is
    * pure per-row map work: no state, no shuffle, no side input to
    * refresh. This is the production shape for token-budgeting an
    * ingest stream: train offline (the batch artifact), apply online.
    * StreamsSpec proves micro-batch ≡ batch on the same documents. */
  def tokenizeStream(
      docs: DataFrame, merges: Seq[(Long, String, String)]): DataFrame =
    graft.queries.Bpe.withTokenCount(docs, merges)

  /** Start `hourlyCounts` end to end from a file source to a memory/console
    * sink — the readStream → transform → writeStream shape. The schema
    * argument is required by streaming file sources (no inference). */
  def fileStreamHourly(
      spark: org.apache.spark.sql.SparkSession,
      sourceDir: String,
      schema: org.apache.spark.sql.types.StructType,
      queryName: String): org.apache.spark.sql.streaming.StreamingQuery =
    hourlyCounts(spark.readStream.schema(schema).parquet(sourceDir))
      .writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(queryName)
      .start()
}
