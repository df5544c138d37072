package graft.engine

import org.scalatest.funsuite.AnyFunSuite

/** A15 RFC-4180 escaping + A16 streaming export
  * (/root/reference/src/arrow.ts:17-26,47-88). */
class ExportSpec extends AnyFunSuite {

  test("A15: quoting only when needed; internal quotes doubled") {
    assert(Export.csvEscape("plain") == "plain")
    assert(Export.csvEscape("a,b") == "\"a,b\"")
    assert(Export.csvEscape("say \"hi\"") == "\"say \"\"hi\"\"\"")
    assert(Export.csvEscape("line\nbreak") == "\"line\nbreak\"")
    assert(Export.csvLine(Seq("a", "b,c")) == "a,\"b,c\"\r\n")
  }

  // Minimal RFC-4180 parser for the round-trip check.
  private def parseCsv(s: String): Seq[Seq[String]] = {
    val rows = Seq.newBuilder[Seq[String]]
    val row = Seq.newBuilder[String]
    val cell = new StringBuilder
    var inQ = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) {
        if (c == '"' && i + 1 < s.length && s.charAt(i + 1) == '"') {
          cell.append('"'); i += 1
        } else if (c == '"') inQ = false
        else cell.append(c)
      } else c match {
        case '"' => inQ = true
        case ',' => row += cell.result(); cell.clear()
        case '\r' if i + 1 < s.length && s.charAt(i + 1) == '\n' =>
          row += cell.result(); cell.clear()
          rows += row.result(); row.clear()
          i += 1
        case other => cell.append(other)
      }
      i += 1
    }
    rows.result()
  }

  test("A15 property: escape/parse round-trips arbitrary cells") {
    val rnd = new scala.util.Random(42)
    val alphabet = "ab,\"\n\r x"
    (1 to 200).foreach { _ =>
      val cells = Seq.fill(rnd.nextInt(4) + 1)(
        Seq.fill(rnd.nextInt(8))(alphabet(rnd.nextInt(alphabet.length)))
          .mkString)
      assert(parseCsv(Export.csvLine(cells)) == Seq(cells))
    }
  }

  test("A16: streaming export — header, formatting, flush parts, totals") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val df = Seq((1L, "a,b"), (2L, null: String), (3L, "it\"s"))
      .toDF("id", "s").orderBy("id")
    val out = Export.toCsvParts(df)
    assert(out.rows == 3 && out.columns == 2)
    assert(out.parts.mkString ==
      "id,s\r\n1,\"a,b\"\r\n2,\r\n3,\"it\"\"s\"\r\n")

    // tiny flushChars forces multiple parts; content must be unchanged
    val parts = Export.toCsvParts(df, flushChars = 8).parts
    assert(parts.size > 1)
    assert(parts.mkString == out.parts.mkString)

    // headerless export of an empty result: zero parts, zero rows
    val empty = Export.toCsvParts(df.filter($"id" < 0), header = false)
    assert(empty.rows == 0 && empty.parts.isEmpty)
  }

  test("A16 at scale: distributed writeCsv round-trips through the catalog") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val df = Seq((1L, "a,b"), (2L, "say \"hi\""), (3L, "plain"))
      .toDF("id", "s")
    val dir = java.nio.file.Files.createTempDirectory("csvout")
      .resolve("out.csv")
    Export.writeCsv(df, dir.toString)
    val back = Catalog.read(spark, dir) // same RFC-4180 reader options
    // inferSchema narrows small ids to INT — compare through strings
    assert(back.orderBy("id").collect()
      .map(r => (r.get(0).toString, r.getString(1))).toSeq ==
      Seq(("1", "a,b"), ("2", "say \"hi\""), ("3", "plain")))
  }

  test("writeJson / writeParquet / writeOrc round-trip (COPY TO analogs)") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val df = Seq((1L, "a\"b"), (2L, "x")).toDF("id", "s")
    val base = java.nio.file.Files.createTempDirectory("expout")
    Export.writeJson(df, base.resolve("out.ndjson").toString)
    Export.writeParquet(df, base.resolve("out.parquet").toString)
    Export.writeOrc(df, base.resolve("out.orc").toString)
    val j = Catalog.read(spark, base.resolve("out.ndjson"))
    val p = Catalog.read(spark, base.resolve("out.parquet"))
    val o = Catalog.read(spark, base.resolve("out.orc"))
    for (back <- Seq(j, p, o))
      assert(back.orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq ==
        Seq((1L, "a\"b"), (2L, "x")))
  }

  test("Arrow IPC stream export round-trips through an Arrow reader") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val df = Seq((1L, "a", 1.5), (2L, "b", -0.25), (3L, null, 42.0))
      .toDF("id", "s", "v").orderBy("id")
    val bytes = new java.io.ByteArrayOutputStream()
    Export.toArrowStream(df, bytes)
    // consume with the stock Arrow reader — schema, values, stream end
    val alloc = new org.apache.arrow.memory.RootAllocator()
    val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(
      new java.io.ByteArrayInputStream(bytes.toByteArray), alloc)
    try {
      val root = reader.getVectorSchemaRoot
      assert(root.getSchema.getFields.size() == 3)
      val got = Seq.newBuilder[(Long, String, Double)]
      while (reader.loadNextBatch()) {
        val ids = root.getVector("id")
          .asInstanceOf[org.apache.arrow.vector.BigIntVector]
        val ss = root.getVector("s")
          .asInstanceOf[org.apache.arrow.vector.VarCharVector]
        val vs = root.getVector("v")
          .asInstanceOf[org.apache.arrow.vector.Float8Vector]
        for (i <- 0 until root.getRowCount)
          got += ((ids.get(i),
            if (ss.isNull(i)) null else new String(ss.get(i), "UTF-8"),
            vs.get(i)))
      }
      assert(got.result().sortBy(_._1) ==
        Seq((1L, "a", 1.5), (2L, "b", -0.25), (3L, null, 42.0)))
    } finally { reader.close(); alloc.close() }
  }
}
