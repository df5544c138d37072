package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The training LOOP behind `p_sim_kmeans_step`: Lloyd's algorithm is only
  * useful if iterating it improves the codebook, and that guarantee —
  * total within-cluster cost never increases across an assign/recenter
  * round — holds for EUCLIDEAN distance with mean recentering. This spec
  * runs two full iterations distributed (assignment = map-side
  * inlined-codebook argmin exactly like the declared query; the update
  * aggregate reduces to k×d rows, here 16×64, before the driver rebuilds
  * the codebook — the per-iteration driver traffic at ANY corpus size)
  * and asserts the monotonicity on real embeddings data, plus that both
  * Lloyd half-steps individually never hurt:
  *   (1) recentering: cost of the SAME assignment against the new means
  *       is <= the old cost (the mean minimizes summed squared distance);
  *   (2) reassignment: re-picking the nearest new centroid is <= keeping
  *       the old assignment.
  * Floating-point order effects are real (doubles over a shuffle), so the
  * inequalities carry a 1e-9 relative slack, far below any true
  * violation. */
class KmeansSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private val dim = 64
  private val k = 16

  /** Squared Euclidean distance to one inlined centroid (codegen fold). */
  private def distExpr(cent: Array[Double]): String = {
    val centLit = cent.mkString("array(", ", ", ")")
    s"""aggregate(zip_with(embedding, $centLit,
       |  (x, c) -> (CAST(x AS DOUBLE) - c) * (CAST(x AS DOUBLE) - c)),
       |  CAST(0 AS DOUBLE), (acc, p) -> acc + p)""".stripMargin
  }

  /** embeddings + (cent_id, cost) = nearest inlined centroid and its
    * squared distance — one map-side pass, no join/shuffle, the same
    * discipline as the declared query's assignment. */
  private def assigned(
      emb: DataFrame, cents: Seq[Array[Double]]): DataFrame = {
    val dists = cents.map(distExpr).mkString("array(", ", ", ")")
    emb
      .withColumn("d_arr", expr(dists))
      .withColumn("cost", expr("array_min(d_arr)"))
      .withColumn("cent_id",
        expr("array_position(d_arr, array_min(d_arr)) - 1"))
      .drop("d_arr")
  }

  private def totalCost(a: DataFrame): Double =
    a.agg(sum("cost")).collect()(0).getDouble(0)

  /** Mean-recenter: per-(cluster, dim) averages — the update shuffle
    * carries at most k*d rows regardless of corpus size. Clusters that
    * lost all members keep their old centroid. */
  private def recenter(
      a: DataFrame, old: Seq[Array[Double]]): Seq[Array[Double]] = {
    val rows = a
      .select(col("cent_id"), posexplode(col("embedding")))
      .groupBy("cent_id", "pos")
      .agg(avg(col("col").cast("double")).as("m"))
      .collect()
    val byId = rows.groupBy(_.getLong(0).toInt)
    (0 until k).map { c =>
      byId.get(c) match {
        case Some(rs) =>
          val m = Array.ofDim[Double](dim)
          rs.foreach(r => m(r.getInt(1)) = r.getDouble(2))
          m
        case None => old(c)
      }
    }
  }

  test("trained codebook artifact round-trips: persist == recompute") {
    // The artifact loop's keystone (VERDICT r12 #1): what
    // `Similarity.trainedCodebook` LOADS from parquet must be
    // bit-identical to what the trainer computes — quantized-integer
    // sums then the fixed two-division sequence are exact, and doubles
    // round-trip parquet exactly, so the comparison is ==, no epsilon.
    val spark0 = spark
    import org.apache.spark.sql.functions.col
    val emb = spark0.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"), col("label"))
    val rows = emb.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val seeds = rows.filter(_._1 < k).sortBy(_._1)
    assert(seeds.length == k)

    // driver-side reference trainer, TWO full Lloyd iterations — the
    // artifact's provenance since r14: cosine-argmax assignment (one-pass
    // fold, ties to the lowest centroid id — cosine_sim's documented
    // semantics), per-dim mean of floor(x*1e6) as
    // CAST(SUM AS DOUBLE) / 1e6 / n, then REASSIGN against those derived
    // double centroids and take the same means again
    def cos(a: Array[Float], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i)
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    // one Lloyd update: assign each row to the argmax-cosine centroid
    // (strict > in cent_id order = ties to lowest id, the twin of
    // array_position(cos_arr, array_max(cos_arr))), then quantized means
    def update(cents: Seq[(Long, Array[Double])])
        : Seq[(Long, Array[Double])] = {
      val assignedRef = rows.map { case (_, v) =>
        var best = 0; var bestCos = Double.NegativeInfinity
        cents.indices.foreach { j =>
          val c = cos(v, cents(j)._2)
          if (c > bestCos) { best = j; bestCos = c }
        }
        (cents(best)._1, v)
      }
      assignedRef.groupBy(_._1).toSeq.sortBy(_._1).map {
        case (cid, members) =>
          val n = members.length.toLong
          val cent = (0 until dim).map { i =>
            val s = members.map(m =>
              math.floor(m._2(i).toDouble * 1000000.0).toLong).sum
            s.toDouble / 1000000.0 / n.toDouble
          }.toArray
          (cid, cent)
      }
    }
    val it1 = update(seeds.map { case (id, v) =>
      (id, v.map(_.toDouble)) }.toSeq)
    val expected = update(it1)

    val loaded = Similarity.trainedCodebook(spark0, dir)
    assert(loaded.map(_._1) == expected.map(_._1),
      "persisted centroid ids differ from the reference trainer's")
    loaded.zip(expected).foreach { case ((id, l), (_, e)) =>
      assert(l.sameElements(e),
        s"centroid $id: persisted values differ from reference " +
          s"(first mismatch at dim ${l.zip(e).indexWhere(p => p._1 != p._2)})")
    }
    // and the artifact on disk is what the loader saw (a second read
    // can't drift: same file, memoized path)
    val reread = spark0.read
      .parquet(Similarity.trainedCodebookPath(spark0, dir))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1).toSeq
    assert(reread.map(_._1) == loaded.map(_._1) &&
      reread.zip(loaded).forall(p => p._1._2.sameElements(p._2._2)),
      "parquet re-read disagrees with the memoized load")
  }

  test("Lloyd iteration: total cost is monotonically non-increasing") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // seed codebook = the declared query's convention (leading k vectors)
    val seed: Seq[Array[Double]] = emb.filter(col("vec_id") < k)
      .orderBy("vec_id").collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray).toSeq
    assert(seed.size == k, s"need $k seed vectors, got ${seed.size}")

    val a0 = assigned(emb, seed)
    val cost0 = totalCost(a0)
    assert(cost0 > 0.0)

    // half-step 1: recenter — same assignment, new means, cost must drop
    val c1 = recenter(a0, seed)
    val costRecentered = totalCost(
      a0.withColumn("cost",
        expr(s"element_at(${c1.map(distExpr).mkString("array(", ",", ")")}," +
          " CAST(cent_id + 1 AS INT))")))
    assert(costRecentered <= cost0 * (1 + 1e-9),
      s"mean recentering increased cost: $cost0 -> $costRecentered")

    // half-step 2: reassign to the nearest NEW centroid — cost drops again
    val a1 = assigned(emb, c1)
    val cost1 = totalCost(a1)
    assert(cost1 <= costRecentered * (1 + 1e-9),
      s"reassignment increased cost: $costRecentered -> $cost1")

    // and a second full iteration keeps the guarantee (the loop composes)
    val c2 = recenter(a1, c1)
    val cost2 = totalCost(assigned(emb, c2))
    assert(cost2 <= cost1 * (1 + 1e-9),
      s"second iteration increased cost: $cost1 -> $cost2")
    // the first iteration must have made real progress on real data —
    // seed-vectors-as-centroids is far from a local optimum
    assert(cost1 < cost0 * 0.999,
      s"iteration made no measurable progress: $cost0 -> $cost1")
  }
}
