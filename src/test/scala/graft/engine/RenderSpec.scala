package graft.engine

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

/** A14 cell formatter against the type table in SURVEY §1.2
  * (/root/reference/src/arrow.ts:3-15), + A13/A19 via a real DataFrame. */
class RenderSpec extends AnyFunSuite {

  test("A14: null -> empty string") {
    assert(Render.formatCell(null) == "")
  }

  test("A14: integers and decimals render as plain decimal strings") {
    assert(Render.formatCell(42L) == "42")
    assert(Render.formatCell(new java.math.BigDecimal("12.30")) == "12.30")
    assert(Render.formatCell(1.5d) == "1.5")
    assert(Render.formatCell(true) == "true")
    assert(Render.formatCell("s") == "s")
  }

  test("A14: temporals render ISO-8601 UTC with milliseconds (JS shape)") {
    assert(Render.formatCell(java.sql.Timestamp.valueOf("1997-03-15 12:34:56"))
      == "1997-03-15T12:34:56.000Z") // JVM zone pinned UTC in build.sbt
    assert(Render.formatCell(LocalDate.of(1997, 3, 15))
      == "1997-03-15T00:00:00.000Z")
    assert(Render.formatCell(java.sql.Date.valueOf("1997-03-15"))
      == "1997-03-15T00:00:00.000Z")
  }

  test("A14: nested values render as JSON") {
    assert(Render.formatCell(Seq(1L, 2L)) == "[1,2]")
    assert(Render.formatCell(Map("k" -> "v\n")) == "{\"k\":\"v\\n\"}")
    assert(Render.formatCell(Seq(Seq("a"), null)) == "[[\"a\"],null]")
  }

  test("A13/A19: display limiter reports the true total") {
    val spark = graft.TestSpark.spark
    val df = spark.range(500).toDF("id")
    val page = Render.tableToRows(df.orderBy("id"), limit = 200)
    assert(page.columns == Seq("id"))
    assert(page.totalRows == 500 && page.shown == 200)
    assert(page.rows.head == Seq("0"))
    assert(Render.infoLine(page) ==
      "Linhas: 500 (mostrando 200) · Colunas: 1")
  }
}
