package graft.engine

import java.nio.file.{Files, Path, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** A1-A4/A9 import + format routing over the FIXTURES.md §4 micro-fixtures
  * (/root/reference/src/fileImport.ts, src/App.tsx:316-327). */
class CatalogSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  private val fixtures = Paths.get("src/test/resources/minifix")

  test("A1: extension filter, case-insensitive") {
    assert(Catalog.isSupportedFilePath("a/b.PARQUET"))
    assert(Catalog.isSupportedFilePath("x.csv"))
    assert(Catalog.isSupportedFilePath("x.json"))
    assert(Catalog.isSupportedFilePath("x.ndjson"))
    assert(Catalog.isSupportedFilePath("x.orc")) // beyond-reference format
    assert(!Catalog.isSupportedFilePath("x.txt"))
    assert(!Catalog.isSupportedFilePath("parquet")) // extension, not name
  }

  test("A2: recursive scan collects supported files with relative paths") {
    val tmp = Files.createTempDirectory("cat")
    Files.createDirectories(tmp.resolve("sub"))
    Files.copy(fixtures.resolve("mini.csv"), tmp.resolve("mini.csv"))
    Files.copy(fixtures.resolve("mini.ndjson"), tmp.resolve("sub/nested.ndjson"))
    Files.copy(fixtures.resolve("skip.txt"), tmp.resolve("skip.txt"))
    val files = Catalog.collectFiles(tmp)
    assert(files.map(_.path) == Seq("mini.csv", "sub/nested.ndjson"))
    assert(files.forall(_.size > 0))
  }

  test("A4: csv routing infers header and types") {
    val df = Catalog.read(spark, fixtures.resolve("mini.csv"))
    assert(df.columns.toSeq == Seq("id", "name", "amount"))
    val rows = df.orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows(0).getAs[String]("name") == "a, \"quoted\"")
    assert(rows(1).isNullAt(1)) // empty cell -> NULL
    assert(rows(0).getAs[Double]("amount") == 10.5)
  }

  test("A4: .ndjson is line-delimited; .json needs multiLine (SURVEY 7.4.3)") {
    val nd = Catalog.read(spark, fixtures.resolve("mini.ndjson"))
    val js = Catalog.read(spark, fixtures.resolve("mini.json"))
    assert(nd.count() == 3 && js.count() == 3)
    // same logical rows through both routes
    assert(nd.select("id", "name").orderBy("id").collect().toSeq ==
      js.select("id", "name").orderBy("id").collect().toSeq)
    // missing key -> NULL; nested object survives
    assert(nd.filter("id = 2").collect()(0).isNullAt(
      nd.columns.indexOf("name")))
    assert(nd.filter("id = 1").selectExpr("nested.k").collect()(0).getLong(0) == 1)
  }

  test("A4: registration exposes a queryable temp view (no byte copy)") {
    val tmp = Files.createTempDirectory("reg")
    Files.copy(fixtures.resolve("mini.csv"), tmp.resolve("mini.csv"))
    val files = Catalog.collectFiles(tmp)
    val Seq(view) = Catalog.importFolder(spark, tmp)._2
    assert(view == "mini_csv")
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM $view")
      .collect()(0).getLong(0) == 3)
  }

  test("A4: colliding sanitized names stay distinct (path injectivity)") {
    // distinct raw paths can sanitize to the same view name; the second
    // claim must NOT silently serve the first file's data (the reference
    // can't collide — its table name IS the raw path)
    val tmp = Files.createTempDirectory("collide")
    Files.writeString(tmp.resolve("x-y.csv"), "v\n1\n")
    Files.writeString(tmp.resolve("x_y.csv"), "v\n2\n")
    val (_, views) = Catalog.importFolder(spark, tmp)
    assert(views.size == 2 && views.distinct.size == 2)
    val got = views.map(v =>
      spark.sql(s"SELECT v FROM $v").collect()(0).getInt(0)).sorted
    assert(got == Seq(1, 2))
    // claims are stable: re-claiming the same path returns the same name
    assert(Catalog.claimViewName(spark, "x-y.csv") ==
      Catalog.claimViewName(spark, "x-y.csv"))
  }

  test("B3: rewritePathTables touches only genuine table positions") {
    val tmp = Files.createTempDirectory("rewrite")
    val f = tmp.resolve("data.csv")
    Files.writeString(f, "a\n1\n")
    def rw(sql: String): (String, Seq[String]) =
      Catalog.rewritePathTables(spark, sql)
    // table position rewrites to the claimed view
    val view = Catalog.claimViewName(spark, f.toString)
    assert(rw(s"SELECT * FROM '$f'")._1 == s"SELECT * FROM $view")
    // WHERE-clause literal, TRIM operand, comments, quoted 'from': untouched
    for (sql <- Seq(
      s"SELECT * FROM t WHERE c = '$f'",
      s"SELECT trim(BOTH 'x' FROM '$f') FROM t",
      s"SELECT 1 -- FROM '$f'",
      s"SELECT 'from' '$f'"))
      assert(rw(sql)._1 == sql, sql)
    // missing path is reported, not rewritten
    val (same, miss) = rw("SELECT * FROM '/no/such/p.csv'")
    assert(same == "SELECT * FROM '/no/such/p.csv'" &&
      miss == Seq("/no/such/p.csv"))
    // doubled-quote identifier escapes don't desync the scan
    val tricky = s"""SELECT "sa""y" FROM '$f'"""
    assert(rw(tricky)._1 == s"""SELECT "sa""y" FROM $view""")
  }

  test("A9: parquet union view merges schemas by name (B29, SURVEY 7.4.4)") {
    val tmp = Files.createTempDirectory("union")
    import spark.implicits._
    Seq((1L, "x")).toDF("id", "name")
      .write.parquet(tmp.resolve("union_a.parquet").toString)
    Seq((2L, "y", 9.5)).toDF("id", "name", "extra")
      .write.parquet(tmp.resolve("union_b.parquet").toString)
    val files = Catalog.collectFiles(tmp)
    val created = Catalog.createOrReplaceParquetView(
      spark, tmp, files, "united")
    assert(created.contains("united"))
    val df = spark.table("united").orderBy("id")
    assert(df.columns.toSeq.sorted == Seq("extra", "id", "name"))
    val rows = df.collect()
    assert(rows.length == 2)
    assert(rows(0).isNullAt(df.columns.indexOf("extra"))) // a-side: NULL
    assert(rows(1).getAs[Double]("extra") == 9.5)
  }

  test("A9: no parquet files -> no view") {
    val tmp = Files.createTempDirectory("noparquet")
    Files.copy(fixtures.resolve("mini.csv"), tmp.resolve("mini.csv"))
    assert(Catalog.createOrReplaceParquetView(
      spark, tmp, Catalog.collectFiles(tmp), "nope").isEmpty)
  }
}
