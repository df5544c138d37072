package graft.engine

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck laws for the A18 type-sniffing comparator: `sortRows` is a
  * stable sort built on `compareCells`, so the comparator must be a
  * consistent weak ordering over arbitrary cell strings — antisymmetric
  * and sign-consistent — or sorting behavior becomes JVM-version- and
  * input-order-dependent (TimSort throws on inconsistent comparators). */
object PageProps extends Properties("Page") {

  // Cells of every sniffing class: empties, numerics, date-ish, free text.
  private val cell: Gen[String] = Gen.oneOf(
    Gen.const(""),
    Gen.chooseNum(-1000000L, 1000000L).map(_.toString),
    Gen.chooseNum(-99999, 99999).map(n => s"${n / 100}.${math.abs(n % 100)}"),
    Gen.chooseNum(0, 28).map(d => f"2024-01-${d + 1}%02d"),
    Gen.chooseNum(0, 23).map(h => f"2024-01-15T$h%02d:30:00"),
    Gen.alphaNumStr,
    Gen.asciiPrintableStr)

  property("antisymmetry: sign(cmp(a,b)) == -sign(cmp(b,a))") =
    Prop.forAll(cell, cell) { (a, b) =>
      math.signum(Page.compareCells(a, b)) ==
        -math.signum(Page.compareCells(b, a))
    }

  property("reflexivity: cmp(a,a) == 0") =
    Prop.forAll(cell) { a => Page.compareCells(a, a) == 0 }

  property("sorting any row set with the comparator never throws") =
    Prop.forAll(Gen.listOf(cell)) { cells =>
      val sorted = cells.sortWith((a, b) => Page.compareCells(a, b) < 0)
      sorted.length == cells.length
    }
}
