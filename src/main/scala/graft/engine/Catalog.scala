package graft.engine

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Import/catalog layer — A1-A4 and A9 (`/root/reference/src/fileImport.ts`,
  * `src/duckdb.ts:41-44`, `src/App.tsx:316-327`).
  *
  * The reference copies every file's bytes into the engine's virtual FS
  * (`registerFileBuffer`), which is why its README warns against large
  * folders. Spark needs no copy: registration is a lazy `spark.read` plus a
  * temp view, and the first query streams from disk in parallel — strictly
  * better at scale, same observable surface (path-addressable tables + an
  * optional union view over all parquet files).
  *
  * Format routing (A1/A4 + SURVEY §7.4.2-3):
  *  - `.parquet` → self-describing;
  *  - `.csv` → header + schema inference (DuckDB auto-detects both);
  *  - `.ndjson` → Spark's default line-delimited JSON reader;
  *  - `.json` → `multiLine=true` (a top-level JSON array, which DuckDB
  *    auto-detects but Spark must be told about).
  */
object Catalog {

  /** A1/A2's metadata record (`fileImport.ts:1-5`). */
  final case class ImportedFile(path: String, size: Long)

  // .orc is a beyond-reference extension (the reference imports only the
  // first four); Spark reads/writes ORC natively, so the engine accepts
  // it through the same routing.
  private val SupportedExts = Seq(".parquet", ".csv", ".json", ".ndjson",
    ".orc")

  /** A1: supported-format filter (case-insensitive extension). */
  def isSupportedFilePath(path: String): Boolean = {
    val lower = path.toLowerCase
    SupportedExts.exists(lower.endsWith)
  }

  /** A2: recursive directory scan — relative paths, sorted for determinism
    * (the reference preserves directory-iteration order, which is
    * filesystem-dependent; sorting is the reproducible choice). */
  def collectFiles(root: Path): Seq[ImportedFile] = {
    val stream = Files.walk(root)
    try
      stream.iterator().asScala
        .filter(Files.isRegularFile(_))
        .map(p => root.relativize(p).toString)
        .filter(isSupportedFilePath)
        .toSeq.sorted
        .map(rel => ImportedFile(rel, Files.size(root.resolve(rel))))
    finally stream.close()
  }

  /** A3: flat file-list fallback (paths already known). */
  def collectFromList(paths: Seq[String]): Seq[ImportedFile] =
    paths.filter(isSupportedFilePath)
      .map(p => ImportedFile(p, Files.size(Paths.get(p))))

  /** Temp-view name for a relative path: the reference keeps the raw path as
    * the table name (path-addressable); Spark view names can't contain
    * `/`/`.`, so sanitize deterministically. */
  def viewNameFor(path: String): String = {
    val base = path.replaceAll("[^A-Za-z0-9_]", "_")
    if (base.headOption.exists(c => c.isDigit)) s"t_$base" else base
  }

  private val viewOwner =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]
  private val pathView =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]
  /** Raw registered path → resolved filesystem location. The reference
    * registers files in the engine's virtual FS under their RELATIVE
    * import paths and its generated `read_parquet([...])` DDL names
    * those same paths (`/root/reference/src/App.tsx:316-327`); the Spark
    * analog resolves them back to where the bytes actually live. */
  private val pathLocation =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]
  /** View name -> mtime/size fingerprint of its underlying paths at
    * registration. A registered path-table view snapshots its file
    * LISTING; a reference user legitimately COPYs over a path and
    * re-reads it in the next statement (DuckDB re-lists per call), so
    * reuse must be freshness-checked: on a changed fingerprint the view
    * re-registers (fresh listing + schema), otherwise the cached view
    * serves — one stat per path per statement, not a re-inference. */
  private val viewStamp =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  /** Glob-pattern predicate shared by the path-existence check and the
    * stamp (they MUST agree — a path one side treats as a glob and the
    * other stats literally yields a constant stamp and permanent
    * staleness). */
  private[engine] def isGlobPath(p: String): Boolean =
    p.exists(c => c == '*' || c == '?') || p.contains("[")

  /** Cheap change fingerprint of a path set. Per path: for a FILE, its
    * (mtime, size); for a DIRECTORY, its own mtime plus every child's
    * (name, mtime, size) — an IN-PLACE part-file overwrite (cp over an
    * existing name) changes the child's mtime but NOT the directory's,
    * so the dir mtime alone would serve stale rows. A glob walks up to
    * its first non-glob ancestor directory; a path with no statable
    * base stamps uniquely per call, forcing a fresh registration
    * (correctness over cache). Same-length in-place overwrites inside
    * the filesystem's mtime resolution are below this fingerprint's
    * horizon — the documented limit. */
  private def pathStamp(paths: Seq[String]): String =
    paths.map { raw =>
      var base = raw
      while (base.nonEmpty && isGlobPath(base))
        base = Option(Paths.get(base).getParent).map(_.toString)
          .getOrElse("")
      val f = new java.io.File(base)
      if (base.isEmpty || !f.exists) s"?${System.nanoTime()}"
      else if (f.isDirectory) {
        val kids = Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
          .map(c => s"${c.getName}:${c.lastModified}:${c.length}")
          .sorted.mkString(",")
        s"${f.lastModified}:${md5hex(kids).take(12)}"
      } else s"${f.lastModified}:${f.length}"
    }.mkString("|")

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString

  /** Collision-safe view name for a path in this session: the sanitized
    * name, unless a DIFFERENT path already claimed it (distinct raw paths
    * can sanitize identically — `x-y.csv` vs `x_y.csv` — and the second
    * registration would silently serve the first file's data). The loser
    * gets a short path-hash suffix; the reference never collides because
    * its table name IS the raw path, so this restores that injectivity. */
  def claimViewName(spark: SparkSession, path: String): String =
    pathView.getOrElseUpdate((spark, path), {
      // claim by atomic putIfAbsent (not check-then-act): under concurrent
      // first claims of two colliding paths, exactly one wins the base
      // name and the other observes the foreign owner and takes the
      // suffixed name. The md5 suffix makes a suffixed-name collision
      // practically impossible, so one fallback level suffices.
      val base = viewNameFor(path)
      def owns(name: String): Boolean =
        !userClaimed.contains((spark, name)) &&
          viewOwner.putIfAbsent((spark, name), path).forall(_ == path)
      if (owns(base)) base
      else {
        val alt = s"${base}_${md5hex(path).take(6)}"
        owns(alt) // records ownership; collision here is ~impossible
        alt
      }
    })

  /** True when `name` is one of the engine's AUTO-registered path-table
    * views (quoted-path rewrites, imports, table-function sets) rather
    * than a relation the user created. DuckDB's catalog never contains
    * these — `SELECT * FROM 'f.parquet'` leaves no entry there — so
    * whole-catalog operations (EXPORT DATABASE) must skip them: their
    * data lives in the original files already. */
  def isAutoRegisteredView(spark: SparkSession, name: String): Boolean =
    viewOwner.contains((spark, name))

  /** Names the USER has claimed with their own DDL: a later
    * quoted-path registration must take a suffixed name instead of
    * silently clobbering the user's relation. */
  private val userClaimed =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Boolean]

  /** A user's own CREATE VIEW/TABLE re-using an auto-registered name
    * turns it into a USER relation: the router calls this on EVERY
    * routed CREATE so (a) catalog-wide operations stop skipping the
    * name, (b) the path-to-name binding drops — the next quoted-path
    * reference re-claims under a SUFFIXED name rather than replacing
    * the user's view — and (c) the freshness stamp dies with the old
    * registration. */
  def releaseAutoClaim(spark: SparkSession, name: String): Unit = {
    viewOwner.remove((spark, name)).foreach { ownedKey =>
      pathView.remove((spark, ownedKey))
    }
    viewStamp.remove((spark, name))
    userClaimed.put((spark, name), true)
    ()
  }

  /** Read one file with extension-based format routing. */
  def read(spark: SparkSession, absolute: Path): DataFrame = {
    val p = absolute.toString
    val lower = p.toLowerCase
    if (lower.endsWith(".parquet")) spark.read.parquet(p)
    else if (lower.endsWith(".csv"))
      // escape="\"" = RFC-4180 doubled-quote escapes (Spark's default
      // escape is backslash; DuckDB auto-detects — SURVEY §7.4.2)
      spark.read.option("header", "true").option("inferSchema", "true")
        .option("escape", "\"").csv(p)
    else if (lower.endsWith(".ndjson")) spark.read.json(p)
    else if (lower.endsWith(".json"))
      spark.read.option("multiLine", "true").json(p)
    else if (lower.endsWith(".orc")) spark.read.orc(p)
    else throw new IllegalArgumentException(s"unsupported format: $p")
  }

  /** B3 for every supported format: DuckDB (and so the reference's default
    * SQL — `/root/reference/src/App.tsx:16-17`, README examples) accepts a
    * quoted file path as a table: `SELECT * FROM 'dir/file.csv'`. Spark
    * has that syntax only as `format.`path`` and can't attach reader
    * options to it, so rewrite each FROM/JOIN-position single-quoted path
    * literal with a supported extension to a registered temp view: an
    * already-registered view (same `viewNameFor` sanitization as import)
    * is referenced directly; an unregistered path that exists on disk is
    * registered lazily through the extension router `read` (still zero
    * byte-copy — the view is a lazy scan). Paths that resolve to nothing
    * are left in place (Spark's analyzer reports them) and returned so
    * `Engine.tryQuery` can surface a targeted hint. */
  /** One lexed token: [start, end) span; quoted=true for `'...'` string
    * literals (span includes the quotes, `text` excludes them). */
  private final case class Tok(start: Int, end: Int, text: String, quoted: Boolean)

  /** Quote/comment-aware token scan (same state machine discipline as the
    * A12 lexer): words, `'...'` literals (with `''` escapes), and single
    * symbols, with comments and `"..."` identifiers opaque. */
  private def lexTokens(sql: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = sql.length
    while (i < n) {
      val ch = sql.charAt(i)
      def next = if (i + 1 < n) sql.charAt(i + 1) else '\u0000'
      if (ch == '-' && next == '-') { // line comment
        while (i < n && sql.charAt(i) != '\n') i += 1
      } else if (ch == '/' && next == '*') { // block comment
        i += 2
        while (i + 1 < n && !(sql.charAt(i) == '*' && sql.charAt(i + 1) == '/')) i += 1
        i = math.min(n, i + 2)
      } else if (ch == '\'') { // string literal, '' escapes
        val s = i; i += 1
        val b = new StringBuilder
        var open = true
        while (i < n && open) {
          if (sql.charAt(i) == '\'' && i + 1 < n && sql.charAt(i + 1) == '\'') {
            b.append('\''); i += 2
          } else if (sql.charAt(i) == '\'') { open = false; i += 1 }
          else { b.append(sql.charAt(i)); i += 1 }
        }
        out += Tok(s, i, b.result(), quoted = true)
      } else if (ch == '"' || ch == '`') { // quoted identifier — opaque,
        // with doubled-quote escapes like the A12 lexer (Sql.segments)
        val q = ch; val s = i; i += 1
        var open = true
        while (i < n && open) {
          if (sql.charAt(i) == q && i + 1 < n && sql.charAt(i + 1) == q) i += 2
          else if (sql.charAt(i) == q) { open = false; i += 1 }
          else i += 1
        }
        out += Tok(s, i, sql.substring(s, i), quoted = false)
      } else if (ch.isLetterOrDigit || ch == '_' || ch == '.') {
        val s = i
        while (i < n && (sql.charAt(i).isLetterOrDigit ||
          sql.charAt(i) == '_' || sql.charAt(i) == '.')) i += 1
        out += Tok(s, i, sql.substring(s, i), quoted = false)
      } else {
        if (!ch.isWhitespace) out += Tok(i, i + 1, ch.toString, quoted = false)
        i += 1
      }
    }
    out.result()
  }

  // `FROM` also appears inside TRIM/EXTRACT/SUBSTRING/OVERLAY(...) where
  // the following literal is a string OPERAND, not a table. Subqueries
  // also sit inside parens, so the discriminator is WHICH call opened the
  // enclosing paren: a paren-context stack records the token preceding
  // each `(`, and the rewrite is skipped only when the nearest enclosing
  // paren belongs to one of the operand-FROM functions.
  private val OperandFromFns = Set("trim", "extract", "substring", "overlay")

  // DuckDB's file-reading table functions in table position — the form
  // the reference's OWN generated union-view DDL uses verbatim
  // (`/root/reference/src/App.tsx:316-327` emits `CREATE OR REPLACE VIEW
  // v AS SELECT * FROM read_parquet(['p1', 'p2', …]);` through `exec`).
  // Spark has no such functions, so a call in FROM/JOIN position
  // rewrites to a registered temp view over the named files — lazy scan,
  // zero byte-copy, mergeSchema for read_parquet's union-by-name
  // semantics. The format comes from the FUNCTION name (DuckDB
  // semantics: read_csv reads csv whatever the extension).
  private val TableFnFormat = Map(
    "read_parquet" -> "parquet",
    "read_csv" -> "csv", "read_csv_auto" -> "csv",
    "read_json" -> "json", "read_json_auto" -> "json",
    "read_ndjson" -> "ndjson", "read_ndjson_auto" -> "ndjson")

  /** One multi-file scan with the table-function's format. Multi-path
    * parquet always merges schemas by name — DuckDB's
    * `union_by_name=true` and the A9 union view's contract. `.json`
    * files read as whole-document JSON (`multiLine`) only when EVERY
    * path says so; ndjson/mixed sets use the line-delimited reader.
    * `opts` carries the routed named options (csv header/delim). */
  private def readSet(
      spark: SparkSession, fmt: String, paths: Seq[String],
      opts: Map[String, String]): DataFrame = {
    // hive_partitioning=true (r18): recover col=value directory keys as
    // COLUMNS, DuckDB's partitioned-read option. Spark auto-discovers
    // partitions for a bare directory read, but the DuckDB idiom is a
    // GLOB ('dir/*/*.parquet') — there Spark needs the explicit
    // basePath (the deepest non-glob prefix) or the keys silently
    // vanish from the schema.
    val hive =
      opts.get("hive_partitioning").exists(_.equalsIgnoreCase("true"))
    def based(r: org.apache.spark.sql.DataFrameReader)
        : org.apache.spark.sql.DataFrameReader =
      if (!hive) r
      else {
        require(paths.forall(isGlobPath),
          "hive_partitioning=true expects glob paths" +
            " (read_parquet('dir/*/*.parquet', hive_partitioning=true));" +
            " a bare directory path recovers partitions without the" +
            " option")
        val bases = paths.map(globBase).distinct
        require(bases.length == 1 && bases.head.nonEmpty,
          "hive_partitioning=true needs paths sharing one non-glob base" +
            " directory")
        r.option("basePath", bases.head)
      }
    fmt match {
      case "parquet" =>
        based(spark.read.option("mergeSchema", "true")).parquet(paths: _*)
      case "csv" =>
        // columns= carries an explicit Spark-DDL schema: inference off,
        // header defaulting to FALSE (Spark cannot sniff a header the
        // way DuckDB's detector does — pass header=true explicitly)
        val explicit = opts.get("columns")
        val header = opts.getOrElse("header",
          if (explicit.isDefined) "false" else "true").toLowerCase
        val base0 = based(spark.read.option("header", header)
          .option("escape", "\""))
        val base = explicit match {
          case Some(ddl) => base0.schema(ddl)
          case None => base0.option("inferSchema", "true")
        }
        opts.get("delim").orElse(opts.get("sep"))
          .fold(base)(d => base.option("sep", d))
          .csv(paths: _*)
      case "json" if paths.forall(_.toLowerCase.endsWith(".json")) =>
        based(spark.read.option("multiLine", "true")).json(paths: _*)
      case _ => based(spark.read).json(paths: _*)
    }
  }

  /** DuckDB type spelling → Spark DDL type for `columns=` schemas:
    * names both engines share pass through; DuckDB-only spellings map
    * to the Spark type with the same VALUES; anything unknown refuses
    * (a guessed type reads the file differently than asked). */
  private[engine] def duckTypeToSpark(t: String): String = {
    val up = t.trim.toUpperCase
    up match {
      case "VARCHAR" | "TEXT" | "STRING" | "BPCHAR" => "STRING"
      case "INTEGER" | "INT" | "INT4" | "SIGNED" => "INT"
      case "BIGINT" | "INT8" | "LONG" => "BIGINT"
      case "SMALLINT" | "INT2" | "SHORT" => "SMALLINT"
      case "TINYINT" | "INT1" => "TINYINT"
      case "HUGEINT" => "DECIMAL(38,0)" // the values int128 can hold
      case "DOUBLE" | "FLOAT8" => "DOUBLE"
      // DuckDB's REAL is the 4-byte float (FLOAT4's alias), not DOUBLE:
      // mapping it wider would parse float64 where DuckDB parses float32
      // — a silent value divergence, exactly what this map refuses.
      case "FLOAT" | "FLOAT4" | "REAL" => "FLOAT"
      case "BOOLEAN" | "BOOL" | "LOGICAL" => "BOOLEAN"
      case "DATE" => "DATE"
      case "TIMESTAMP" | "DATETIME" => "TIMESTAMP"
      case "BLOB" | "BYTEA" | "BINARY" => "BINARY"
      case d if d.matches("DECIMAL\\s*\\(\\s*\\d+\\s*,\\s*\\d+\\s*\\)") ||
          d.matches("NUMERIC\\s*\\(\\s*\\d+\\s*,\\s*\\d+\\s*\\)") =>
        d.replaceFirst("NUMERIC", "DECIMAL")
      case other => throw new IllegalArgumentException(
        s"columns=: type '$other' is not mapped — use one of the" +
          " shared SQL type names (VARCHAR/INTEGER/BIGINT/DOUBLE/" +
          "BOOLEAN/DATE/TIMESTAMP/DECIMAL(p,s)/...)")
    }
  }

  /** The deepest non-glob directory prefix of a path — the basePath a
    * hive-partitioned glob read anchors partition discovery at. */
  private def globBase(p: String): String =
    p.split('/').takeWhile(c => !c.exists("*?[{".contains(_)))
      .mkString("/")

  /** Register (once) a temp view over a table-function's resolved path
    * set and return its name — content-addressed by format + paths, so
    * the same call text across statements reuses one view. */
  private def claimSetView(
      spark: SparkSession, fmt: String, resolved: Seq[String],
      opts: Map[String, String] = Map.empty): String = {
    val key = ((fmt +: resolved) ++
      opts.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" })
      .mkString("\u0001")
    val view = pathView.getOrElseUpdate((spark, key), {
      val base = s"t_${fmt}set_${md5hex(key).take(10)}"
      val name =
        if (userClaimed.contains((spark, base))) s"${base}_u" else base
      viewOwner.putIfAbsent((spark, name), key)
      name
    })
    // stamp-checked reuse (see viewStamp): re-register only when the
    // underlying paths changed since registration, so a COPY-overwritten
    // path re-reads fresh while the steady state costs one stat per path
    val stamp = pathStamp(resolved)
    if (!spark.catalog.tableExists(view) ||
        !viewStamp.get((spark, view)).contains(stamp)) {
      readSet(spark, fmt, resolved, opts).createOrReplaceTempView(view)
      viewStamp.put((spark, view), stamp)
    }
    view
  }

  def rewritePathTables(
      spark: SparkSession, statement: String): (String, Seq[String]) = {
    val toks = lexTokens(statement)
    val missing = Seq.newBuilder[String]
    val edits = Seq.newBuilder[(Tok, String)]
    val parenFn = scala.collection.mutable.Stack.empty[String]
    for (idx <- toks.indices) {
      val t = toks(idx)
      if (t.text == "(" && !t.quoted)
        parenFn.push(
          if (idx > 0 && !toks(idx - 1).quoted) toks(idx - 1).text.toLowerCase
          else "")
      else if (t.text == ")" && !t.quoted && parenFn.nonEmpty) parenFn.pop()
      if (t.quoted && idx > 0 && isSupportedFilePath(t.text)) {
        // the keyword must be a bare word: a QUOTED 'from' before the
        // literal is adjacent-string-literal concatenation ('from' '/x'),
        // not a table position
        val prev = toks(idx - 1)
        val kw = prev.text.toLowerCase
        val tableFrom = !prev.quoted && (kw == "from" || kw == "join") &&
          !parenFn.headOption.exists(OperandFromFns.contains)
        if (tableFrom) {
          val path = t.text
          val view = claimViewName(spark, path)
          val registered = spark.catalog.tableExists(view)
          // an import-registered path resolves to where its bytes live
          val loc = pathLocation.getOrElse((spark, path), path)
          val p = Paths.get(loc)
          if (registered || Files.exists(p)) {
            // same stamp-checked freshness as the table-function route:
            // a COPY-overwritten path must re-read fresh, not serve the
            // registration-time listing snapshot
            val stamp = pathStamp(Seq(loc))
            if (!registered ||
                (Files.exists(p) &&
                  !viewStamp.get((spark, view)).contains(stamp))) {
              read(spark, p).createOrReplaceTempView(view)
              pathLocation.putIfAbsent((spark, path), path)
              viewStamp.put((spark, view), stamp)
            }
            edits += ((t, Sql.sqlIdentifier(view)))
          } else missing += path
        }
      }
      // read_parquet / read_csv / read_json call in table position —
      // the reference's generated-DDL form. Parse the call's argument
      // tokens to the balancing close paren: quoted tokens are paths
      // (bare or inside DuckDB's [...] list literal), and a small set of
      // NAMED options is honored — union_by_name=true (mergeSchema IS
      // union-by-name), header=true/false and delim/sep='c' for csv.
      // Anything else refuses loudly: silently ignoring a reader option
      // would scan a file differently than the user asked.
      if (!t.quoted && TableFnFormat.contains(t.text.toLowerCase) &&
          idx > 0 && !toks(idx - 1).quoted &&
          Seq("from", "join").contains(toks(idx - 1).text.toLowerCase) &&
          !parenFn.headOption.exists(OperandFromFns.contains) &&
          idx + 1 < toks.length && !toks(idx + 1).quoted &&
          toks(idx + 1).text == "(") {
        val fn = t.text.toLowerCase
        var end = -1
        var k = idx + 2
        var depth = 1
        while (k < toks.length && end < 0) { // find the balancing paren
          val tk = toks(k)
          if (!tk.quoted && tk.text == "(") depth += 1
          else if (!tk.quoted && tk.text == ")") {
            depth -= 1; if (depth == 0) end = k
          }
          k += 1
        }
        require(end > 0, s"unbalanced parens in $fn(...)")
        val inner = toks.slice(idx + 2, end)
        val paths = Seq.newBuilder[String]
        val options = scala.collection.mutable.LinkedHashMap.empty[String, String]
        val NamedOpts =
          Set("union_by_name", "header", "delim", "sep", "hive_partitioning")
        var j = 0
        while (j < inner.length) {
          val tk = inner(j)
          if (tk.quoted) { paths += tk.text; j += 1 }
          else if (Seq("[", "]", ",").contains(tk.text)) j += 1
          else if (tk.text.equalsIgnoreCase("columns") &&
              j + 2 < inner.length && !inner(j + 1).quoted &&
              inner(j + 1).text == "=" && !inner(j + 2).quoted &&
              inner(j + 2).text == "{") {
            // columns={'name': 'TYPE', …} — DuckDB's explicit-schema
            // read. The struct literal's quoted tokens are NAMES and
            // TYPES, consumed here so they never read as paths; the
            // value stored is the Spark schema DDL the reader takes.
            // NOTE the header default: DuckDB still SNIFFS a header
            // row even with columns= (measured); Spark cannot sniff,
            // so without an explicit header option the first line is
            // DATA — pass header=true for headered files.
            var k = j + 3
            val fields = Seq.newBuilder[String]
            var curName: Option[String] = None
            var done = false
            while (k < inner.length && !done) {
              val t2 = inner(k)
              if (!t2.quoted && t2.text == "}") { done = true; k += 1 }
              else if (!t2.quoted && (t2.text == ":" || t2.text == ","))
                k += 1
              else if (t2.quoted && curName.isEmpty) {
                curName = Some(t2.text); k += 1
              } else if (t2.quoted) {
                fields += s"${Sql.sqlIdentifier(curName.get)} " +
                  duckTypeToSpark(t2.text)
                curName = None
                k += 1
              } else throw new IllegalArgumentException(
                s"$fn: columns= expects {'name': 'TYPE', ...} — got" +
                  s" '${t2.text}'")
            }
            require(done && curName.isEmpty,
              s"$fn: malformed columns= struct literal")
            val ddl = fields.result()
            require(ddl.nonEmpty, s"$fn: columns= needs at least one column")
            options += ("columns" -> ddl.mkString(", "))
            j = k
          }
          else if (NamedOpts.contains(tk.text.toLowerCase) &&
              j + 2 < inner.length && inner(j + 1).text == "=") {
            options += (tk.text.toLowerCase -> inner(j + 2).text)
            j += 3
          } else throw new IllegalArgumentException(
            s"$fn: unsupported argument '${tk.text}' — routed calls take" +
              " path literals (bare or in a [...] list) and the named" +
              " options union_by_name/header/delim/hive_partitioning/" +
              "columns")
        }
        options.foreach {
          case ("union_by_name", v) => require(v.equalsIgnoreCase("true"),
            s"$fn: union_by_name=$v is not routed (multi-file reads" +
              " always unify by name here)")
          case ("header", v) =>
            require(v.equalsIgnoreCase("true") || v.equalsIgnoreCase("false"),
              s"$fn: header must be true/false, got $v")
          case ("hive_partitioning", v) =>
            require(v.equalsIgnoreCase("true") || v.equalsIgnoreCase("false"),
              s"$fn: hive_partitioning must be true/false, got $v")
          case _ => () // delim/sep carry their literal value
        }
        val ps = paths.result()
        require(ps.nonEmpty, s"$fn needs at least one path literal")
        // a path registered through the import layer resolves to where
        // its bytes live; anything else must exist on disk as written —
        // except GLOB patterns (read_parquet('dir/*.parquet'), DuckDB's
        // daily idiom), which Spark's reader resolves itself and reports
        // loudly when they match nothing
        val resolved = ps.map(p =>
          pathLocation.getOrElse((spark, p), p))
        val absent = ps.zip(resolved)
          .collect { case (raw, r)
            if !isGlobPath(r) && !Files.exists(Paths.get(r)) => raw }
        if (absent.nonEmpty) missing ++= absent
        else {
          val fmtName = TableFnFormat(fn)
          // per-format option validity: silently ignoring an option
          // would read the file differently than asked
          if (fmtName != "csv")
            require(!options.contains("header") &&
              !options.contains("delim") && !options.contains("sep") &&
              !options.contains("columns"),
              s"$fn: header/delim/columns options apply to read_csv only")
          // union_by_name holds for parquet (mergeSchema) and json
          // (Spark's multi-file json reader unifies by name); csv would
          // need per-file header alignment Spark doesn't do — refuse
          require(fmtName != "csv" || !options.contains("union_by_name"),
            s"$fn: union_by_name is not routed for csv (Spark infers" +
              " one schema across the file set, not per-file headers)")
          val view = claimSetView(spark, fmtName, resolved, options.toMap)
          edits += ((Tok(t.start, toks(end).end, "", quoted = false),
            Sql.sqlIdentifier(view)))
        }
      }
    }
    val out = edits.result().sortBy(_._1.start).reverse
      .foldLeft(statement) { case (acc, (t, repl)) =>
        acc.substring(0, t.start) + repl + acc.substring(t.end)
      }
    (out, missing.result())
  }

  /** A4: register one file as a temp view; returns the (collision-safe)
    * view name. No byte copy — the scan stays lazy and distributed. */
  def registerFile(spark: SparkSession, root: Path, file: ImportedFile): String = {
    val name = claimViewName(spark, file.path)
    read(spark, root.resolve(file.path)).createOrReplaceTempView(name)
    // the raw import path stays addressable by the SQL-text routes (the
    // reference's generated read_parquet DDL names these same paths)
    pathLocation.put((spark, file.path), root.resolve(file.path).toString)
    name
  }

  /** A9: union view over all imported parquet files (`src/App.tsx:316-327`).
    * DuckDB's `read_parquet([...])` unifies schemas by name; Spark needs
    * `mergeSchema` for the same union-by-name semantics (SURVEY §7.4.4). */
  def createOrReplaceParquetView(
      spark: SparkSession, root: Path, imported: Seq[ImportedFile],
      tableName: String): Option[String] = {
    val paths = imported.map(_.path)
      .filter(_.toLowerCase.endsWith(".parquet"))
      .map(root.resolve(_).toString)
    if (paths.isEmpty) None
    else {
      val name = Sql.sqlIdentifier(tableName)
      spark.read.option("mergeSchema", "true").parquet(paths: _*)
        .createOrReplaceTempView(tableName)
      Some(name)
    }
  }

  /** Import a folder end to end (A2 + A4 + optional A9), returning the
    * per-file view names — the Spark analog of `importFiles`
    * (`src/App.tsx:329-354`) without the sequential byte copy. */
  def importFolder(
      spark: SparkSession, root: Path,
      unionViewName: Option[String] = None): (Seq[ImportedFile], Seq[String]) = {
    val files = collectFiles(root)
    val views = files.map(registerFile(spark, root, _))
    unionViewName.foreach(createOrReplaceParquetView(spark, root, files, _))
    (files, views)
  }
}
