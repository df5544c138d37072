package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import Tables._

/** Text-analysis operators over `documents` — the LLM-pipeline text family:
  * term frequency, token counting, quality scoring, language-ID heuristic,
  * content fingerprinting. All integer/string computations (plus single
  * float divisions of exact integers), so oracle parity is exact.
  *
  * The synthetic corpus is a small shared vocabulary with a `lang` label
  * that is NOT reflected in the text, so the language-ID query demonstrates
  * the mechanism (stopword-hit scoring + deterministic argmax) and its
  * cross-engine parity, not classification accuracy.
  *
  * Scale: TF is the classic map-side-combined word count; everything else
  * is per-document map work followed by a small aggregation or a top-k —
  * no join, no wide shuffle.
  */
object TextOps {

  // --- Term frequency ------------------------------------------------------

  val tf: Q = (s, dir) =>
    t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("word"))
      .limit(50)

  val tfSql: String =
    """SELECT word, COUNT(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |GROUP BY word ORDER BY n DESC, word LIMIT 50""".stripMargin

  // --- Token counting ------------------------------------------------------

  // Whitespace tokens + a BPE-ish regex tokenizer (letter runs, digit runs,
  // single punctuation marks) — the standard pre-tokenization shape.
  private val tokenPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  // In the limited queries below, the top-k on the unique doc_id runs
  // BEFORE the per-row feature projection: row-wise functions commute with
  // orderBy+limit on a key, and computing features for only the kept rows
  // is the shape that matters when the feature is expensive.
  val tokens: Q = (s, dir) =>
    t(s, dir, "documents")
      .orderBy(col("doc_id")).limit(200)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast(LongType).as("n_ws_tokens"),
        size(expr(s"regexp_extract_all(text, '$tokenPattern', 0)"))
          .cast(LongType).as("n_re_tokens"),
        col("n_chars"))
      .orderBy(col("doc_id"))

  val tokensSql: String =
    s"""SELECT doc_id,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       |  CAST(len(regexp_extract_all(text, '$tokenPattern')) AS BIGINT)
       |    AS n_re_tokens,
       |  n_chars
       |FROM documents ORDER BY doc_id LIMIT 200""".stripMargin

  // --- Quality scoring -----------------------------------------------------

  // Length/stopword/word-shape heuristics; ratios are single divisions of
  // exact integers (deterministic). `ok` is the pass/fail quality gate.
  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")
  private def sqlList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString(", ")

  val quality: Q = (s, dir) =>
    t(s, dir, "documents")
      .orderBy(col("doc_id")).limit(200)
      .withColumn("ws", split(col("text"), " "))
      .select(col("doc_id"), col("n_chars"),
        size(col("ws")).cast(LongType).as("n_words"),
        (col("n_chars").cast("double") / size(col("ws")))
          .as("mean_word_len"),
        (size(expr(s"array_intersect(ws, array(${sqlList(stopwords)}))"))
          .cast("double") / size(col("ws"))).as("stopword_ratio"))
      .withColumn("ok",
        col("n_words") >= 10 && col("mean_word_len") < 12)
      .orderBy(col("doc_id"))

  val qualitySql: String =
    s"""SELECT doc_id, n_chars,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       |  CAST(n_chars AS DOUBLE) / len(string_split(text, ' '))
       |    AS mean_word_len,
       |  CAST(len(list_intersect(string_split(text, ' '),
       |       [${sqlList(stopwords)}])) AS DOUBLE)
       |    / len(string_split(text, ' ')) AS stopword_ratio,
       |  (CAST(len(string_split(text, ' ')) AS BIGINT) >= 10 AND
       |   CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')) < 12)
       |    AS ok
       |FROM documents ORDER BY doc_id LIMIT 200""".stripMargin

  // --- Repetition ratio (Gopher-style quality rule) ------------------------

  /** Duplicate-word fraction per document: 1 − |distinct words| / |words| —
    * the classic repetition filter for web-scraped training data (a page
    * whose text is mostly the same words repeated is boilerplate/spam, not
    * prose). Map-side only: the word split and the distinct count are
    * per-row array ops, no explode and no shuffle before the final top-k.
    * Exact integer counts; the single float division is deterministic, so
    * the oracle hash-matches. doc_id breaks rank ties. */
  val repetition: Q = (s, dir) =>
    t(s, dir, "documents")
      .withColumn("ws", split(col("text"), " "))
      .filter(size(col("ws")) > 0)
      .select(col("doc_id"),
        size(col("ws")).cast(LongType).as("n_words"),
        size(array_distinct(col("ws"))).cast(LongType).as("n_distinct"))
      .withColumn("rep_ratio",
        (col("n_words") - col("n_distinct")).cast("double") / col("n_words"))
      .orderBy(desc("rep_ratio"), col("doc_id"))
      .limit(200)

  val repetitionSql: String =
    """SELECT doc_id,
      |  CAST(len(ws) AS BIGINT) AS n_words,
      |  CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct,
      |  CAST(len(ws) - len(list_distinct(ws)) AS DOUBLE) / len(ws)
      |    AS rep_ratio
      |FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
      |WHERE len(ws) > 0
      |ORDER BY rep_ratio DESC, doc_id LIMIT 200""".stripMargin

  // --- Language-ID heuristic ----------------------------------------------

  private val langStops: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "los", "de", "y", "que"),
    "fr" -> Seq("le", "la", "et", "les", "des"))

  /** Stopword-hit language scores + deterministic argmax (ties resolve in
    * declaration order), reported as a (truth, predicted) confusion count. */
  val langid: Q = (s, dir) => {
    val scored = langStops.foldLeft(
      t(s, dir, "documents").withColumn("ws", split(col("text"), " "))) {
      case (df, (l, sw)) =>
        df.withColumn(s"s_$l",
          size(expr(s"array_intersect(ws, array(${sqlList(sw)}))")))
    }
    val maxExpr = langStops.map { case (l, _) => s"s_$l" }
      .reduceLeft((x, y) => s"GREATEST($x, $y)")
    val predExpr = langStops.map { case (l, _) =>
      s"WHEN s_$l = $maxExpr THEN '$l'"
    }.mkString("CASE ", " ", " END")
    scored
      .withColumn("predicted", expr(predExpr))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("predicted"))
  }

  val langidSql: String = {
    val scores = langStops.map { case (l, sw) =>
      s"len(list_intersect(string_split(text, ' '), [${sqlList(sw)}])) AS s_$l"
    }.mkString(",\n  ")
    val maxExpr = langStops.map { case (l, _) => s"s_$l" }
      .reduceLeft((x, y) => s"GREATEST($x, $y)")
    val predExpr = langStops.map { case (l, _) =>
      s"WHEN s_$l = $maxExpr THEN '$l'"
    }.mkString("CASE ", " ", " END")
    s"""WITH scored AS (
       |  SELECT lang,
       |  $scores
       |  FROM documents)
       |SELECT lang, $predExpr AS predicted, COUNT(*) AS n
       |FROM scored GROUP BY lang, predicted ORDER BY lang, predicted"""
      .stripMargin
  }

  // --- Content fingerprinting ---------------------------------------------

  /** Document fingerprints: full-content md5 plus a min-3 shingle sketch
    * (the 3 lexicographically smallest distinct word-trigrams, hashed) — a
    * winnowing-style content-defined sketch that survives small edits. */
  val fingerprint: Q = (s, dir) => {
    graft.functions.WordNgrams.register(s)
    t(s, dir, "documents")
      .withColumn("ws", split(col("text"), " "))
      .filter(size(col("ws")) >= 3)
      .orderBy(col("doc_id")).limit(200)
      .select(col("doc_id"),
        md5(lower(col("text"))).as("fp"),
        // graft_word_ngrams ≡ the trigram transform (r22, see shingleSrc)
        md5(expr(
          """array_join(slice(array_sort(array_distinct(
            |  graft_word_ngrams(ws, 3))), 1, 3), '|')"""
            .stripMargin)).as("sketch"))
      .orderBy(col("doc_id"))
  }

  val fingerprintSql: String =
    """SELECT doc_id, md5(lower(text)) AS fp,
      |  md5(array_to_string(list_slice(list_sort(list_distinct(
      |    list_transform(range(1, len(string_split(text, ' ')) - 1),
      |      i -> string_split(text, ' ')[i] || ' ' ||
      |           string_split(text, ' ')[i+1] || ' ' ||
      |           string_split(text, ' ')[i+2]))), 1, 3), '|')) AS sketch
      |FROM documents
      |WHERE len(string_split(text, ' ')) >= 3
      |ORDER BY doc_id LIMIT 200""".stripMargin

  /** (doc_id, source, shingle) distinct triples — corpus-analysis twin of
    * Dedup's inverted index, carrying the source for cross-corpus ops. */
  // NOT pre-distincted (r22, guide §2.4): both consumers dedup inside
  // their own aggregates — `boilerplate` counts DISTINCT doc_id per
  // shingle and `contamination` re-distincts on (source, sh) — so the
  // former `.distinct()` here was a full extra exchange of the exploded
  // shingle rows that changed no result (the oracle CTE keeps its
  // SELECT DISTINCT spelling; equal output either way).
  private def shingleSrc(s: SparkSession, dir: String) = {
    // graft_word_ngrams(ws, 3) ≡ transform(sequence(1, size(ws) - 2),
    //   i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2])) — native flat loop
    // (r22, WordNgramsSpec pins byte-identity on size >= 3 inputs)
    graft.functions.WordNgrams.register(s)
    t(s, dir, "documents")
      .withColumn("ws", split(col("text"), " "))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), col("source"),
        explode(expr("graft_word_ngrams(ws, 3)")).as("sh"))
  }

  private val oShingleSrc =
    """w AS (SELECT doc_id, source, string_split(text, ' ') AS ws
      |      FROM documents),
      |sh AS (SELECT DISTINCT doc_id, source,
      |         unnest(list_transform(range(1, len(ws) - 1),
      |           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
      |       FROM w WHERE len(ws) >= 3)""".stripMargin

  /** Boilerplate detection: shingles appearing in many distinct documents
    * are templated/repeated passages (headers, license text, nav chrome) —
    * the standard pre-dedup cleaning signal. One shuffle on the shingle;
    * at 100 TB this doubles as the document-frequency cap input the
    * near-dup operators need. */
  val boilerplate: Q = (s, dir) =>
    shingleSrc(s, dir)
      .groupBy(col("sh"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= 4)
      .orderBy(desc("df"), col("sh"))
      .limit(10)

  val boilerplateSql: String =
    s"""WITH $oShingleSrc
       |SELECT sh, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
       |FROM sh GROUP BY sh HAVING COUNT(DISTINCT doc_id) >= 4
       |ORDER BY df DESC, sh LIMIT 10""".stripMargin

  /** TF-IDF — the classic term-weighting operator joining the two halves
    * this file already computes: per-(doc, word) term frequency and
    * per-word document frequency. The idf factor is the RATIONAL form
    * N/df rather than log(N/df): measured on this host, JVM `Math.log`
    * and DuckDB `ln` disagree by 1 ulp on ~1/5000 of the N/df inputs, so
    * a log would break the cross-engine hash gate; the rational variant
    * is two IEEE ops (one divide, one multiply) in a fixed order on exact
    * integers — bit-identical everywhere. Production swaps in `log`
    * unchanged (it is a monotone transform of this output).
    *
    * Scale: tf is the map-side-combined word count; df re-aggregates the
    * (doc, word) relation — already unique — so it shuffles one row per
    * distinct pair; the tf↔df join shuffles on the word. The df side is
    * vocabulary-sized, which at 100 TB is NOT reliably broadcastable
    * (open-vocab web text), so the word-keyed shuffle join is the honest
    * shape; AQE will broadcast it when the vocabulary is small. The
    * doc_id slice pushes below the join, so only the kept docs' tf rows
    * join. */
  val tfidf: Q = (s, dir) => {
    val words = t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    val tfd = words.groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
    val dfd = tfd.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val n = t(s, dir, "documents").agg(count(lit(1)).as("n_docs"))
    tfd.filter(col("doc_id") < 10)
      .join(dfd, "word")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("word"), col("tf"), col("df"),
        (col("tf").cast("double") *
          (col("n_docs").cast("double") / col("df"))).as("tfidf"))
      .orderBy(col("doc_id"), col("word"))
  }

  val tfidfSql: String =
    """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
      |           FROM documents),
      |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM w
      |       GROUP BY doc_id, word),
      |df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
      |n AS (SELECT COUNT(*) AS n_docs FROM documents)
      |SELECT t.doc_id, t.word, t.tf, d.df,
      |  CAST(t.tf AS DOUBLE) * (CAST(n.n_docs AS DOUBLE) / d.df) AS tfidf
      |FROM tf t JOIN df d USING (word), n
      |WHERE t.doc_id < 10
      |ORDER BY t.doc_id, t.word""".stripMargin

  /** Cross-corpus contamination: shingle-set overlap between two sources
    * (the train/eval leakage check). Single pass: one shuffle on the
    * shingle with per-source membership flags, then a global roll-up —
    * never materializing two corpora subqueries separately. */
  val contamination: Q = (s, dir) =>
    shingleSrc(s, dir)
      .filter(col("source").isin("src0", "src1"))
      .select(col("source"), col("sh")).distinct()
      .groupBy(col("sh"))
      .agg(max(when(col("source") === "src0", 1).otherwise(0)).as("in_a"),
        max(when(col("source") === "src1", 1).otherwise(0)).as("in_b"))
      .agg(sum(col("in_a")).as("n_a"), sum(col("in_b")).as("n_b"),
        sum(col("in_a") * col("in_b")).as("n_shared"))

  val contaminationSql: String =
    s"""WITH $oShingleSrc,
       |a AS (SELECT DISTINCT sh FROM sh WHERE source = 'src0'),
       |b AS (SELECT DISTINCT sh FROM sh WHERE source = 'src1')
       |SELECT CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS n_a,
       |  CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS n_b,
       |  CAST((SELECT COUNT(*) FROM a JOIN b USING (sh)) AS BIGINT)
       |    AS n_shared""".stripMargin

  /** Deterministic hash-based train/test split: membership derives from
    * md5(doc_id) alone, so it is reproducible run-to-run, engine-to-engine,
    * and stable under repartitioning — the property random()-based splits
    * lack. Map-side expression; scales with zero extra shuffles. */
  val splitHash: Q = (s, dir) => {
    graft.functions.Md5PrefixLong.register(s)
    t(s, dir, "documents")
      .groupBy(when(
        // ≡ conv(substring(md5(..),1,4),16,10) cast long (digest fold, r21)
        expr("graft_md5_long(CAST(doc_id AS STRING), 4) % 100") < 90,
        "train").otherwise("test")
        .as("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"))
      .orderBy(col("split"))
  }

  val splitHashSql: String =
    """SELECT CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
      |    1, 4)) AS BIGINT) % 100 < 90 THEN 'train' ELSE 'test' END
      |    AS split,
      |  COUNT(*) AS n_docs, CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
      |FROM documents GROUP BY split ORDER BY split""".stripMargin

  // --- Sequence packing (context-window sharding) --------------------------

  /** Sequence packing: assign each document the fixed-size context-window
    * bin (4096 tokens) in which its first token lands when the corpus is
    * concatenated in a deterministic order — the standard pretraining
    * shard layout (documents split across window boundaries; `bin` is
    * where the doc STARTS). The running token total is a per-lang window
    * (PARTITION BY lang ORDER BY doc_id), so state is per-partition and
    * the shuffle is one hash partition by lang — at 100 TB the partition
    * key would be the shard/source the packer writes, never a global
    * unpartitioned window. All-integer arithmetic; hash-exact. */
  val packSequences: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "documents")
      .select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast(LongType).as("tok"))
      .withColumn("cum", sum(col("tok")).over(w))
      .withColumn("bin", expr("CAST((cum - tok) DIV 4096 AS BIGINT)"))
      .groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("lang"), col("bin"))
  }

  val packSequencesSql: String =
    """WITH d AS (
      |  SELECT lang, doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
      |  FROM documents),
      |c AS (
      |  SELECT lang, doc_id, tok,
      |    SUM(tok) OVER (PARTITION BY lang ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM d)
      |SELECT lang, CAST((cum - tok) // 4096 AS BIGINT) AS bin,
      |  COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS n_tokens,
      |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      |FROM c GROUP BY lang, bin ORDER BY lang, bin""".stripMargin

  // --- Corpus mixing (per-lang deterministic downsampling) -----------------

  /** Corpus mixing: rebalance the training mix by keeping a per-language
    * fraction of documents, selected by a reproducible md5(doc_id) hash —
    * so the kept set is stable run-to-run, engine-to-engine, and under
    * repartitioning. The mix decision reads hex digits 5–8 of the digest
    * while `p_split_hash` reads digits 1–4: DISJOINT digits, so keep is
    * independent of the train/test assignment and the two decisions
    * compose (a downsampled language still retains ~10% test docs rather
    * than having its test split sampled out wholesale — ADVICE r7).
    * Map-side expression + one small aggregate; the rates are the knob a
    * data-mixture pipeline sweeps. */
  private val mixRates: Seq[(String, Int)] =
    Seq("en" -> 90, "de" -> 50, "es" -> 25, "fr" -> 10)

  val corpusMix: Q = (s, dir) => {
    val rateExpr = mixRates.map { case (l, r) => s"WHEN '$l' THEN $r" }
      .mkString("CASE lang ", " ", " ELSE 100 END")
    graft.functions.Md5PrefixLong.register(s)
    t(s, dir, "documents")
      // ≡ conv(substring(md5(..),5,4),16,10) cast long (digest fold, r21)
      .withColumn("h",
        expr("graft_md5_long(CAST(doc_id AS STRING), 5, 4) % 100"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(expr(s"h < $rateExpr"), 1L).otherwise(0L)).as("n_kept"))
      .orderBy(col("lang"))
  }

  val corpusMixSql: String = {
    val rateExpr = mixRates.map { case (l, r) => s"WHEN '$l' THEN $r" }
      .mkString("CASE lang ", " ", " ELSE 100 END")
    s"""SELECT lang, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN CAST(('0x' ||
       |    substr(md5(CAST(doc_id AS VARCHAR)), 5, 4)) AS BIGINT) % 100
       |    < $rateExpr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
       |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
  }

  // --- End-to-end pipeline composition ------------------------------------

  /** The composed training-data pipeline in one query: quality gate →
    * exact dedup on normalized content (min-doc_id survivor) → per-lang
    * corpus stats. Each stage is the operator verified individually above;
    * this witnesses the composition (filter pushes into the scan, dedup
    * shuffles 16-byte hashes, stats aggregate the survivors). */
  val pipelineE2e: Q = (s, dir) =>
    t(s, dir, "documents")
      .withColumn("ws", split(col("text"), " "))
      .filter(size(col("ws")) >= 10 &&
        (col("n_chars").cast("double") / size(col("ws"))) < 12)
      .groupBy(md5(lower(col("text"))).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"),
        min(col("lang")).as("lang"),
        min(size(col("ws"))).cast(LongType).as("n_words"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("total_words"))
      .orderBy(col("lang"))

  val pipelineE2eSql: String =
    """WITH ok AS (
      |  SELECT doc_id, lang, text,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
      |  FROM documents
      |  WHERE len(string_split(text, ' ')) >= 10
      |    AND CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')) < 12),
      |dedup AS (
      |  SELECT md5(lower(text)) AS fp, MIN(doc_id) AS doc_id,
      |    MIN(lang) AS lang, MIN(n_words) AS n_words
      |  FROM ok GROUP BY fp)
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_words) AS BIGINT) AS total_words
      |FROM dedup GROUP BY lang ORDER BY lang""".stripMargin

  // --- Overlap-window chunking (round 15) ---------------------------------
  //
  // The step BETWEEN curation and `p_pack_sequences` in a training-data
  // pipeline: long documents split into fixed-size token windows with a
  // stride overlap (size 32, stride 24 ⇒ 8-token overlap), so no span
  // longer than the context window is lost at a chunk boundary. Pure
  // per-row map work — explode by computed chunk count, slice the token
  // array, no shuffle before the output ordering; each chunk carries its
  // 1-based start token, its actual length (the final chunk clips), and
  // an md5 of the joined tokens as the cross-engine content witness.
  private val ChunkC = 32
  private val ChunkS = 24

  /** The chunking transform over any frame carrying (doc_id, text) —
    * shared VERBATIM by the declared query and `Streams.chunkStream`
    * (stateless Column work, so batch and stream paths cannot drift).
    * Input columns other than `text` pass through onto every chunk row
    * (the stream keeps its event-time column for watermarking). */
  private[graft] def withChunks(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val keep = docs.columns.filterNot(_ == "text").map(col).toSeq
    docs
      .withColumn("ws", split(col("text"), " "))
      .withColumn("n", size(col("ws")))
      .withColumn("nchunks", expr(
        s"""CASE WHEN n <= $ChunkC THEN 1
           |  ELSE 1 + (n - $ChunkC + ${ChunkS - 1}) div $ChunkS END"""
          .stripMargin))
      .select(keep ++ Seq(col("ws"),
        explode(expr("sequence(0, nchunks - 1)")).as("chunk_id")): _*)
      .select(keep ++ Seq(
        col("chunk_id").cast("long").as("chunk_id"),
        expr(s"CAST(chunk_id * $ChunkS + 1 AS BIGINT)").as("start_tok"),
        expr(s"CAST(size(slice(ws, chunk_id * $ChunkS + 1, $ChunkC)) " +
          "AS BIGINT)").as("n_tokens"),
        expr(s"md5(concat_ws(' ', " +
          s"slice(ws, chunk_id * $ChunkS + 1, $ChunkC)))").as("chunk_md5"))
        : _*)
  }

  val chunkDocs: Q = (s, dir) =>
    withChunks(
      t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .orderBy(col("doc_id")).limit(200))
      .orderBy(col("doc_id"), col("chunk_id"))

  val chunkDocsSql: String =
    s"""WITH b AS (SELECT doc_id, text FROM documents
       |           ORDER BY doc_id LIMIT 200),
       |w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM b),
       |n AS (SELECT doc_id, ws, len(ws) AS n FROM w),
       |c AS (SELECT doc_id, ws, n,
       |  CASE WHEN n <= $ChunkC THEN 1
       |    ELSE 1 + (n - $ChunkC + ${ChunkS - 1}) // $ChunkS END AS nchunks
       |  FROM n),
       |e AS (SELECT doc_id, ws, n, unnest(range(0, nchunks)) AS cid FROM c)
       |SELECT doc_id, CAST(cid AS BIGINT) AS chunk_id,
       |  CAST(cid * $ChunkS + 1 AS BIGINT) AS start_tok,
       |  CAST(len(ws[CAST(cid * $ChunkS + 1 AS INT):
       |    CAST(least(cid * $ChunkS + $ChunkC, n) AS INT)]) AS BIGINT)
       |    AS n_tokens,
       |  md5(array_to_string(ws[CAST(cid * $ChunkS + 1 AS INT):
       |    CAST(least(cid * $ChunkS + $ChunkC, n) AS INT)], ' '))
       |    AS chunk_md5
       |FROM e
       |ORDER BY doc_id, chunk_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "p_text_tf" -> tf,
    "p_chunk_docs" -> chunkDocs,
    "p_text_tokens" -> tokens,
    "p_text_quality" -> quality,
    "p_text_repetition" -> repetition,
    "p_text_langid" -> langid,
    "p_text_fingerprint" -> fingerprint,
    "p_text_boilerplate" -> boilerplate,
    "p_text_tfidf" -> tfidf,
    "p_text_contamination" -> contamination,
    "p_split_hash" -> splitHash,
    "p_pack_sequences" -> packSequences,
    "p_corpus_mix" -> corpusMix,
    "p_pipeline_e2e" -> pipelineE2e)

  val oracle: Map[String, String] = Map(
    "p_text_tf" -> tfSql,
    "p_chunk_docs" -> chunkDocsSql,
    "p_text_tokens" -> tokensSql,
    "p_text_quality" -> qualitySql,
    "p_text_repetition" -> repetitionSql,
    "p_text_langid" -> langidSql,
    "p_text_fingerprint" -> fingerprintSql,
    "p_text_boilerplate" -> boilerplateSql,
    "p_text_tfidf" -> tfidfSql,
    "p_text_contamination" -> contaminationSql,
    "p_split_hash" -> splitHashSql,
    "p_pack_sequences" -> packSequencesSql,
    "p_corpus_mix" -> corpusMixSql,
    "p_pipeline_e2e" -> pipelineE2eSql)
}
