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
  * instead of a manual matrix run. */
class DeterminismSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  // Float-sensitive representatives without memoized intermediates (a
  // cached subtree would be computed once and shared across regimes,
  // which defeats the comparison): money sums (t1), sequential float
  // folds (quantize, brute-force cosine), and the bucketed range join.
  private val names = Seq("t1_account_summary", "p_embed_quantize",
    "p_sim_bruteforce", "c_window_range_bucketed",
    // r7 additions: tfidf's divide-then-multiply over shuffled joins, and
    // the packing query's per-lang running sums (window state must not
    // depend on input split boundaries)
    "p_text_tfidf", "p_pack_sequences")

  test("outputs are identical across partitioning regimes") {
    val keys = Seq("spark.sql.shuffle.partitions",
      "spark.sql.files.maxPartitionBytes")
    val saved = keys.map(k => k -> spark.conf.get(k))
    // regime A: coarse (one-ish split, 2 reducers); regime B: shredded
    // input (64 KB splits) with a prime reducer count
    val regimes = Seq(Seq("2", "134217728"), Seq("7", "65536"))
    try {
      for (name <- names) {
        val snaps = regimes.map { r =>
          keys.zip(r).foreach { case (k, v) => spark.conf.set(k, v) }
          graft.SparkEntry.queries(name)(spark, dir)
            .collect().map(_.toString).toSeq
        }
        assert(snaps(0) == snaps(1),
          s"$name output depends on the partitioning regime")
        assert(snaps(0).nonEmpty, s"$name returned no rows at sf0.001")
      }
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
