package graft.engine

import java.text.Collator
import java.util.Locale

import Render.DisplayTable

/** Client-side page operators over the ≤200-row display page — A17
  * (substring search) and A18 (type-sniffing stable sort); reference
  * `/root/reference/src/App.tsx:448-502`.
  *
  * These are DISPLAY-layer operators by design: they act on the collected,
  * stringified page, exactly like the reference (which filters/sorts the
  * rendered rows, not the result set). Engine-side equivalents for full
  * results are ordinary `filter`/`orderBy` (SURVEY §2 A17/A18 notes).
  */
object Page {

  /** A17: case-insensitive substring match against any cell
    * (`src/App.tsx:482-490`). */
  def searchRows(table: DisplayTable, query: String): DisplayTable = {
    val q = query.trim.toLowerCase
    if (q.isEmpty) table
    else table.copy(rows =
      table.rows.filter(_.exists(_.toLowerCase.contains(q))))
  }

  private val NumericPattern = "^-?\\d+(\\.\\d+)?$".r

  // 'base' sensitivity ≈ PRIMARY strength (case- and accent-insensitive).
  private def collator: Collator = {
    val c = Collator.getInstance(Locale.ROOT)
    c.setStrength(Collator.PRIMARY)
    c
  }

  /** Date.parse analog for the formats the page can contain (the formatter
    * emits ISO instants; raw strings may be dates or timestamps). */
  private def parseEpoch(s: String): Option[Long] = {
    import java.time._
    import scala.util.Try
    Try(Instant.parse(s).toEpochMilli)
      .orElse(Try(LocalDateTime.parse(s.replace(' ', 'T'))
        .toInstant(ZoneOffset.UTC).toEpochMilli))
      .orElse(Try(LocalDate.parse(s).atStartOfDay(ZoneOffset.UTC)
        .toInstant.toEpochMilli))
      .toOption
  }

  /** localeCompare(numeric:true) analog: digit runs compare numerically,
    * text runs through a PRIMARY-strength collator. */
  private def alnumCompare(a: String, b: String): Int = {
    val coll = collator
    def tokens(s: String): Vector[String] =
      "\\d+|\\D+".r.findAllIn(s).toVector
    val (ta, tb) = (tokens(a), tokens(b))
    ta.zip(tb).foreach { case (x, y) =>
      val bothNum = x.head.isDigit && y.head.isDigit
      val c =
        if (bothNum) BigInt(x).compare(BigInt(y))
        else coll.compare(x, y)
      if (c != 0) return c
    }
    ta.length - tb.length match {
      case 0 => coll.compare(a, b) // tie-break full strings for stability
      case d => d
    }
  }

  /** A18 comparator (`src/App.tsx:456-480`): empties sort after non-empty
    * values (in ascending orientation), numeric compare when both look
    * numeric, epoch compare when both carry date hints and parse, else
    * alphanumeric collation. NOTE the caller multiplies the WHOLE result by
    * the direction — including the empty branch — exactly like the
    * reference's `cmp * dir` (`src/App.tsx:497`), so under `desc` empties
    * come first. (SURVEY §2's "empty always last regardless of direction"
    * paraphrase is wrong about the reference code; the code is ground
    * truth.) */
  def compareCells(aRaw: String, bRaw: String): Int = {
    val a = Option(aRaw).fold("")(_.trim)
    val b = Option(bRaw).fold("")(_.trim)
    (a.isEmpty, b.isEmpty) match {
      case (true, true) => 0
      case (true, false) => 1
      case (false, true) => -1
      case _ =>
        val numeric =
          if (NumericPattern.matches(a) && NumericPattern.matches(b))
            Some(BigDecimal(a).compare(BigDecimal(b)))
          else None
        numeric.getOrElse {
          def hint(s: String) =
            s.contains('-') || s.contains('T') || s.contains(':')
          val byDate =
            if (hint(a) && hint(b))
              for (ae <- parseEpoch(a); be <- parseEpoch(b))
                yield java.lang.Long.compare(ae, be)
            else None
          byDate.getOrElse(alnumCompare(a, b))
        }
    }
  }

  /** A18: per-column toggle sort, stable via original row index
    * (`src/App.tsx:492-502`). */
  def sortRows(table: DisplayTable, col: Int, ascending: Boolean): DisplayTable = {
    val dir = if (ascending) 1 else -1
    val indexed = table.rows.zipWithIndex
    val sorted = indexed.sortWith { case ((ra, ia), (rb, ib)) =>
      val cmp = compareCells(
        ra.lift(col).getOrElse(""), rb.lift(col).getOrElse("")) * dir
      if (cmp != 0) cmp < 0 else ia < ib
    }
    table.copy(rows = sorted.map(_._1))
  }
}
