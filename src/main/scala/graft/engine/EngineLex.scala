package graft.engine

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** The shared statement lexing kernel: one quote/comment/paren state
  * machine (`codeMask`) and the top-level keyword/separator scanners
  * every route and shim builds on. Mixed into [[Engine]]; split out by
  * file only. */
private[engine] trait EngineLex {
  this: Engine.type =>

  /** Per-character top-level map of a statement: `code(i)` is true when
    * char i sits outside string literals, double-quoted/backtick
    * identifiers, and both comment styles; `depth(i)` is the paren depth
    * BEFORE char i. This is the ONE state machine behind every keyword
    * scanner and splitter in the router — the same quote/comment rules
    * the A12 lexer (`Sql.segments`) applies — so a QUALIFY/ASOF/WHERE
    * sitting inside a `--` comment, a block comment, or a quoted
    * identifier never triggers a route. */
  private[engine] def codeMask(s: String): (Array[Boolean], Array[Int]) = {
    val n = s.length
    val code = new Array[Boolean](n)
    val depth = new Array[Int](n)
    var inS, inD, inB, inLine, inBlock = false
    var skip = 0 // chars already consumed by a two-char token
    var d = 0
    var i = 0
    while (i < n) {
      depth(i) = d
      val ch = s.charAt(i)
      val nx = if (i + 1 < n) s.charAt(i + 1) else ' '
      if (skip > 0) skip -= 1
      else if (inLine) { if (ch == '\n') inLine = false }
      else if (inBlock) {
        if (ch == '*' && nx == '/') { inBlock = false; skip = 1 }
      } else if (inS) {
        if (ch == '\'' && nx == '\'') skip = 1
        else if (ch == '\'') inS = false
      } else if (inD) {
        if (ch == '"' && nx == '"') skip = 1
        else if (ch == '"') inD = false
      } else if (inB) {
        if (ch == '`' && nx == '`') skip = 1
        else if (ch == '`') inB = false
      } else if (ch == '-' && nx == '-') inLine = true
      else if (ch == '/' && nx == '*') { inBlock = true; skip = 1 }
      else if (ch == '\'') inS = true
      else if (ch == '"') inD = true
      else if (ch == '`') inB = true
      else {
        code(i) = true
        if (ch == '(') d += 1
        else if (ch == ')') d = math.max(0, d - 1)
      }
      i += 1
    }
    (code, depth)
  }

  /** Index of the first top-level (outside string literals, quoted
    * identifiers, comments, and parens) whitespace-delimited occurrence
    * of any of `kws`, if one exists. `parenBoundary` additionally
    * accepts `(` as the trailing boundary — for keywords a user types
    * flush against a paren, like `ON CONFLICT(k)`. */
  private[engine] def firstTopLevelKeyword(
      s: String, kws: Seq[String],
      parenBoundary: Boolean = false): Option[Int] = {
    val (code, depth) = codeMask(s)
    var i = 0
    while (i < s.length) {
      if (code(i) && depth(i) == 0) {
        val hit = kws.exists(kw =>
          i + kw.length <= s.length &&
            s.regionMatches(true, i, kw, 0, kw.length) &&
            (i == 0 || s.charAt(i - 1).isWhitespace) &&
            (i + kw.length == s.length ||
              s.charAt(i + kw.length).isWhitespace ||
              (parenBoundary && s.charAt(i + kw.length) == '(')))
        if (hit) return Some(i)
      }
      i += 1
    }
    None
  }

  /** Split on a separator at paren/quote/comment top level only (SET
    * lists carry commas inside function calls and string literals). */
  private[engine] def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out = scala.collection.mutable.Buffer.empty[String]
    val (code, depth) = codeMask(s)
    var last = 0
    var i = 0
    while (i < s.length) {
      if (code(i) && depth(i) == 0 && s.charAt(i) == sep) {
        out += s.substring(last, i); last = i + 1
      }
      i += 1
    }
    out += s.substring(last)
    out.toSeq
  }

  /** A SUMMARIZE/DESCRIBE target: a full SELECT runs as-is; anything else
    * (table name, quoted path) wraps in SELECT * FROM so the path-table
    * rewrite applies uniformly. */
  private[engine] def sqlTarget(spark: SparkSession, target: String): DataFrame =
    // \b word boundary (mirroring describeSelRe): a table NAMED
    // `selected_docs` is a table, not a SELECT statement
    if (target.trim.matches("(?is)^SELECT\\b.*")) sql(spark, target)
    else sql(spark, s"SELECT * FROM ${target.trim}")

}
