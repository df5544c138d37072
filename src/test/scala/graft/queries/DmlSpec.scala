package graft.queries

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.{Dml, Scale}

/** Mechanism certification for the copy-on-write DML rewriter (VERDICT
  * r14 #1): the hash-backed `c_dml_rewrite`/`c_dml_merge` queries prove
  * the post-DML DATA matches real DML semantics; this spec proves the
  * COPY-ON-WRITE claim itself — the prune selects a strict subset of
  * files, and every file outside the mutation's key range survives the
  * operation BYTE-identical (never rewritten, not even value-identically
  * re-encoded). Together: DML is correct and actually pruned.
  */
class DmlSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def md5(f: Path): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(Files.readAllBytes(f)).map("%02x".format(_)).mkString

  private def fileHashes(path: String): Map[String, String] = {
    val st = Files.list(Paths.get(path))
    try st.iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet") &&
        !p.getFileName.toString.startsWith("."))
      .map(p => p.getFileName.toString -> md5(p)).toMap
    finally st.close()
  }

  private def freshLayout(tag: String): String = {
    val path = Layout.tmpRoot(tag, dir) + s"_${System.nanoTime()}"
    Scale.writeSorted(
      Tables.t(spark, dir, "orders").select(col("o_orderkey"),
        col("o_orderdate"), col("o_orderstatus"), col("o_totalprice")),
      path, "o_orderdate", 8)
    path
  }

  private def orig: DataFrame =
    Tables.t(spark, dir, "orders").select(col("o_orderkey"),
      col("o_orderdate"), col("o_orderstatus"), col("o_totalprice"))

  /** Exact set equality (bag semantics) between the mutated layout and
    * the transform applied to the pristine table in memory. */
  private def assertSameRows(path: String, expect: DataFrame): Unit = {
    val got = spark.read.parquet(path)
    assert(got.exceptAll(expect).count() == 0 &&
      expect.exceptAll(got).count() == 0,
      "mutated layout must equal the transform of the original table")
  }

  test("DELETE: prunes to overlapping files; untouched files byte-identical") {
    val path = freshLayout("dmlspec_del")
    val before = fileHashes(path)
    val pred = col("o_orderdate") >= Tables.ts("1996-01-01") &&
      col("o_orderdate") < Tables.ts("1996-04-01")
    val stats = Dml.deleteWhere(spark, path, "o_orderdate",
      Dml.dayMicros("1996-01-01"), Dml.dayMicros("1996-04-01"), pred)

    // the prune must have selected SOME files but strictly fewer than all
    // — a quarter-wide predicate on a 6.6-year-span date-sorted layout
    assert(stats.nFiles == 8, s"expected 8 data files, got ${stats.nFiles}")
    assert(stats.nRewritten >= 1 && stats.nRewritten < stats.nFiles,
      s"prune must be partial: rewrote ${stats.nRewritten}/${stats.nFiles}")

    val after = fileHashes(path)
    // untouched originals survive byte-identical; rewritten ones are gone
    val kept = before.keySet.intersect(after.keySet)
    assert(kept.size == stats.nFiles - stats.nRewritten,
      s"kept ${kept.size} of ${before.size}, rewrote ${stats.nRewritten}")
    kept.foreach { name =>
      assert(before(name) == after(name),
        s"untouched file $name changed bytes — copy-on-write violated")
    }
    assertSameRows(path, orig.filter(!pred))
  }

  test("UPDATE: conditional assignment within pruned files only") {
    val path = freshLayout("dmlspec_upd")
    val before = fileHashes(path)
    val pred = col("o_orderdate") >= Tables.ts("1997-06-01") &&
      col("o_orderdate") < Tables.ts("1997-09-01")
    val stats = Dml.updateWhere(spark, path, "o_orderdate",
      Dml.dayMicros("1997-06-01"), Dml.dayMicros("1997-09-01"), pred,
      Seq("o_totalprice" -> col("o_totalprice") * lit(2)))
    assert(stats.nRewritten >= 1 && stats.nRewritten < stats.nFiles)
    val after = fileHashes(path)
    before.keySet.intersect(after.keySet).foreach { name =>
      assert(before(name) == after(name), s"untouched $name changed")
    }
    assertSameRows(path, orig.withColumn("o_totalprice",
      when(pred, col("o_totalprice") * lit(2)).otherwise(col("o_totalprice"))))
  }

  test("no-overlap predicate is a metadata no-op: zero files rewritten") {
    val path = freshLayout("dmlspec_noop")
    val before = fileHashes(path)
    val stats = Dml.deleteWhere(spark, path, "o_orderdate",
      Dml.dayMicros("2030-01-01"), Dml.dayMicros("2030-04-01"),
      col("o_orderdate") >= Tables.ts("2030-01-01"))
    assert(stats.nRewritten == 0, "future-dated predicate overlaps nothing")
    assert(fileHashes(path) == before, "no-op must not touch any file")
  }

  test("MERGE: matched rows rewritten in pruned files, fresh keys appended") {
    val path = freshLayout("dmlspec_mrg")
    val before = fileHashes(path)
    val win = orig.filter(col("o_orderdate") >= Tables.ts("1998-01-01") &&
      col("o_orderdate") < Tables.ts("1998-02-01"))
    val source = win
      .withColumn("o_orderstatus", lit("M"))
      .withColumn("o_totalprice", col("o_totalprice") * lit(2))
      .unionByName(win.filter(col("o_orderkey") % 3 === 0)
        .select((col("o_orderkey") * -1 - lit(1000000L)).as("o_orderkey"),
          col("o_orderdate"), lit("N").as("o_orderstatus"),
          lit(100.25).as("o_totalprice")))
    val stats = Dml.mergeInto(spark, path, "o_orderdate",
      Dml.dayMicros("1998-01-01"), Dml.dayMicros("1998-02-01"),
      source, Seq("o_orderkey"), Seq("o_orderstatus", "o_totalprice"))
    assert(stats.nRewritten >= 1 && stats.nRewritten < stats.nFiles)
    val after = fileHashes(path)
    before.keySet.intersect(after.keySet).foreach { name =>
      assert(before(name) == after(name), s"untouched $name changed")
    }
    // the NOT-MATCHED branch really appended (fresh negative keys on disk)
    assert(spark.read.parquet(path).filter(col("o_orderkey") < 0).count() > 0,
      "not-matched source keys must be appended")
    val matchPred = col("o_orderdate") >= Tables.ts("1998-01-01") &&
      col("o_orderdate") < Tables.ts("1998-02-01")
    val expect = orig
      .withColumn("o_orderstatus",
        when(matchPred, lit("M")).otherwise(col("o_orderstatus")))
      .withColumn("o_totalprice",
        when(matchPred, col("o_totalprice") * lit(2))
          .otherwise(col("o_totalprice")))
      .unionByName(win.filter(col("o_orderkey") % 3 === 0)
        .select((col("o_orderkey") * -1 - lit(1000000L)).as("o_orderkey"),
          col("o_orderdate"), lit("N").as("o_orderstatus"),
          lit(100.25).as("o_totalprice")))
    assertSameRows(path, expect)
  }

  test("mergeIntoAll key-prunes the MATCHED branch from the source span") {
    // layout clustered by the merge KEY: a narrow-key source must
    // rewrite only the files whose head-key footer range overlaps its
    // span — the statement-routed merge's 100 TB shape (no explicit
    // prune range, yet only a handful of files open)
    val path = Layout.tmpRoot("dmlspec_mrgspan", dir) + s"_${System.nanoTime()}"
    Scale.writeSorted(orig, path, "o_orderkey", 8)
    val before = fileHashes(path)
    val source = orig.filter(col("o_orderkey").between(100, 300))
      .withColumn("o_orderstatus", lit("K"))
    val stats = Dml.mergeIntoAll(spark, path, source,
      Seq("o_orderkey"), Seq("o_orderstatus"))
    assert(stats.nRewritten >= 1 && stats.nRewritten < stats.nFiles,
      s"matched branch must span-prune: ${stats.nRewritten}/${stats.nFiles}")
    val after = fileHashes(path)
    before.keySet.intersect(after.keySet).foreach { name =>
      assert(before(name) == after(name), s"untouched $name changed")
    }
    val expect = orig.withColumn("o_orderstatus",
      when(col("o_orderkey").between(100, 300), lit("K"))
        .otherwise(col("o_orderstatus")))
    assertSameRows(path, expect)
  }

  test("deleteUsingKeys span-prunes and removes exactly the source keys") {
    val path = Layout.tmpRoot("dmlspec_delu", dir) + s"_${System.nanoTime()}"
    Scale.writeSorted(orig, path, "o_orderkey", 8)
    val before = fileHashes(path)
    val total = spark.read.parquet(path).count()
    val source = orig.filter(col("o_orderkey").between(200, 400))
      .select(col("o_orderkey"))
    val nDel = source.count()
    val stats = Dml.deleteUsingKeys(spark, path, source, Seq("o_orderkey"))
    assert(stats.nRewritten >= 1 && stats.nRewritten < stats.nFiles,
      s"join delete must span-prune: ${stats.nRewritten}/${stats.nFiles}")
    val after = fileHashes(path)
    before.keySet.intersect(after.keySet).foreach { name =>
      assert(before(name) == after(name), s"untouched $name changed")
    }
    assert(spark.read.parquet(path).count() == total - nDel)
    assert(spark.read.parquet(path)
      .filter(col("o_orderkey").between(200, 400)).count() == 0)
  }

  test("MERGE refuses a source with duplicate keys (no silent row fan-out)") {
    // SQL MERGE errors on multiple matches; the left-join translation
    // would instead multiply matched target rows — so the precondition
    // is enforced before any file moves
    val path = freshLayout("dmlspec_dup")
    val before = fileHashes(path)
    val dupSource = orig
      .filter(col("o_orderdate") >= Tables.ts("1998-01-01") &&
        col("o_orderdate") < Tables.ts("1998-02-01"))
      .limit(4)
    val doubled = dupSource.unionByName(dupSource) // every key twice
    val e = intercept[IllegalArgumentException] {
      Dml.mergeInto(spark, path, "o_orderdate",
        Dml.dayMicros("1998-01-01"), Dml.dayMicros("1998-02-01"),
        doubled, Seq("o_orderkey"), Seq("o_orderstatus", "o_totalprice"))
    }
    assert(e.getMessage.contains("duplicate keys"), e.getMessage)
    assert(fileHashes(path) == before, "refusal must leave the layout intact")
  }

  test("MERGE insert check reads only files overlapping the source key span") {
    // key-clustered layout: each file carries a tight o_orderkey range,
    // so a narrow source span must select a strict subset of files for
    // the WHEN-NOT-MATCHED existence check (VERDICT r15 #2)
    val path = Layout.tmpRoot("dmlspec_ins", dir) + s"_${System.nanoTime()}"
    Scale.writeSorted(orig, path, "o_orderkey", 8)
    val files = Dml.layoutFiles(path)
    assert(files.size == 8)
    val keys = orig.agg(min(col("o_orderkey")), max(col("o_orderkey")))
      .head()
    val (kLo, kHi) = (keys.getLong(0), keys.getLong(1))
    val mid = kLo + (kHi - kLo) / 2
    // a span covering ~1/8 of the key range: strict subset, never empty
    val narrow = Dml.insertCheckFiles(files, "o_orderkey",
      mid, mid + (kHi - kLo) / 8)
    assert(narrow.nonEmpty && narrow.size < files.size,
      s"narrow span selected ${narrow.size}/${files.size} files")
    // a span past the key range proves full disjointness
    assert(Dml.insertCheckFiles(files, "o_orderkey",
      kHi + 1000000, kHi + 2000000).isEmpty,
      "out-of-range span must select no files")
    // and the full span selects everything (sanity)
    assert(Dml.insertCheckFiles(files, "o_orderkey", kLo, kHi).size == 8)
  }

  test("MERGE: fully-matched source appends no empty part file") {
    val path = freshLayout("dmlspec_noins")
    val nRows = spark.read.parquet(path).count()
    // every source key exists in the target: zero not-matched rows
    val source = orig.limit(20)
      .withColumn("o_orderstatus", lit("Z"))
    Dml.mergeIntoAll(spark, path, source,
      Seq("o_orderkey"), Seq("o_orderstatus"))
    assert(spark.read.parquet(path).count() == nRows,
      "no inserts: total rows unchanged")
    // the empty insert relation must not have landed a 0-row part file
    // (statless files defeat every future footer prune on the layout)
    Dml.layoutFiles(path).foreach { f =>
      assert(spark.read.parquet(f.toString).count() > 0,
        s"empty appended part file: $f")
    }
  }

  test("MERGE: a source reading FROM the target merges against the snapshot") {
    val path = freshLayout("dmlspec_self")
    // legal SQL MERGE: the source is a query over the target itself —
    // double every January price. The merge must evaluate the source
    // against the PRE-merge table even though the matched branch
    // replaces the very files the source reads.
    val source = spark.read.parquet(path)
      .filter(col("o_orderdate") >= Tables.ts("1998-01-01") &&
        col("o_orderdate") < Tables.ts("1998-02-01"))
      .select(col("o_orderkey"), col("o_orderdate"),
        col("o_orderstatus"), (col("o_totalprice") * 2).as("o_totalprice"))
    val expectJan = source.collect().toSet
    Dml.mergeIntoAll(spark, path, source,
      Seq("o_orderkey"), Seq("o_totalprice"))
    val gotJan = spark.read.parquet(path)
      .filter(col("o_orderdate") >= Tables.ts("1998-01-01") &&
        col("o_orderdate") < Tables.ts("1998-02-01")).collect().toSet
    assert(gotJan == expectJan,
      "prices must double exactly once (snapshot source, no re-read of" +
        " post-merge files)")
  }

  test("MERGE resolves key and SET names case-insensitively, like Spark SQL") {
    val path = freshLayout("dmlspec_case")
    val source = orig.limit(10)
      .select(col("o_orderkey").as("O_ORDERKEY"),
        col("o_orderdate"), lit("C").as("O_ORDERSTATUS"),
        col("o_totalprice"))
    val keys = source.select(col("O_ORDERKEY")).collect()
      .map(_.getLong(0)).toSet
    Dml.mergeIntoAll(spark, path, source,
      Seq("o_orderkey"), Seq("o_orderstatus"))
    val updated = spark.read.parquet(path)
      .filter(col("o_orderstatus") === "C").collect()
      .map(_.getLong(0)).toSet
    assert(updated == keys,
      "uppercase source columns must merge onto lowercase target columns")
  }
}
