package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Automates the verification-matrix determinism claim (SCALE.md): a
  * declared query's output may not depend on the partitioning regime.
  * Different shuffle-partition counts and input-split sizes change the
  * grouping and order of partial aggregation — exactly the degrees of
  * freedom that make naive float aggregation nondeterministic on a real
  * cluster — so running the same query under two regimes and comparing
  * row-for-row pins the canonicalization policy (exact DECIMAL/integer
  * accumulation, sequential float folds, value-based frames) as a test
  * instead of a manual matrix run. The compare is deliberately
  * order-sensitive: the driver's hash stringifies rows in output order,
  * so row order under a different regime is part of the contract.
  */
class DeterminismSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Runs `name` under a coarse regime (one-ish split, 2 reducers) and a
    * shredded one (64 KB splits, prime reducer count) and asserts
    * identical non-empty output. A query that is legitimately empty at
    * sf0.001 (e.g. p_sim_lsh: 256 hyperplane buckets over ~60 vectors —
    * the query vector's bucket can be a singleton) would make the regime
    * comparison vacuous, so empty-at-sf0.001 escalates to sf0.01, where
    * every declared query is CORRECTNESS-verified non-empty. */
  private def assertRegimeStable(name: String): Unit =
    if (runRegimes(name, dir).isEmpty) {
      val rows = runRegimes(name, "/root/testdata/sf0.01")
      assert(rows.nonEmpty, s"$name returned no rows at sf0.01 either")
    }

  /** Returns the (regime-identical) output rows of `name` over `d`. */
  private def runRegimes(name: String, d: String): Seq[String] = {
    val keys = Seq("spark.sql.shuffle.partitions",
      "spark.sql.files.maxPartitionBytes")
    val saved = keys.map(k => k -> spark.conf.get(k))
    val regimes = Seq(Seq("2", "134217728"), Seq("7", "65536"))
    try {
      val snaps = regimes.map { r =>
        keys.zip(r).foreach { case (k, v) => spark.conf.set(k, v) }
        graft.SparkEntry.queries(name)(spark, d)
          .collect().map(_.toString).toSeq
      }
      assert(snaps(0) == snaps(1),
        s"$name output depends on the partitioning regime over $d")
      snaps(0)
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  // Float-sensitive representatives outside the pipeline family, without
  // memoized intermediates (a cached subtree would be computed once and
  // shared across regimes, which defeats the comparison): money sums (t1)
  // and the bucketed range join's value-based frames.
  test("representative queries are identical across partitioning regimes") {
    // c_dml_* read MUTATED layouts (the copy-on-write rewrite runs once,
    // memoized); regime-stability here certifies the post-DML read+agg —
    // decimal sums and min/max over the rewritten + appended files —
    // never depends on how the mixed file set splits into tasks.
    Seq("t1_account_summary", "c_window_range_bucketed",
        "c_dml_rewrite", "c_dml_merge",
        // r17: the interpolated quantile is the one new float fold whose
        // result could conceivably depend on partition order — pin it
        "c_sql_duckdb_agg_fns")
      .foreach(assertRegimeStable)
  }

  // The ENTIRE pipeline family (VERDICT r8 #6): every declared p_* query —
  // dedup signatures, LSH bucketing, quantization folds, tfidf's
  // divide-then-multiply over shuffled joins, packing's per-lang running
  // sums — re-run under both regimes each build, so a future
  // order-sensitive float or split-dependent window sneaks in nowhere in
  // the family. Iterating the registry (not a hand list) means a newly
  // declared p_* query is covered the moment it exists.
  test("every p_* pipeline query is identical across partitioning regimes") {
    val family = graft.SparkEntry.queries.keys.filter(_.startsWith("p_"))
      .toSeq.sorted
    assert(family.size >= 30, s"pipeline family shrank: $family")
    family.foreach(assertRegimeStable)
  }
}
