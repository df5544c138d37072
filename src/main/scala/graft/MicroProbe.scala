package graft

/** Host/stage overhead probe (optimization rounds only, guide §1): times
  * primitive plan shapes — empty job, scan-only, scan+exchange, window —
  * to establish the per-job and per-shuffle floor the declared queries sit
  * on. Not part of the driver contract.
  */
object MicroProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.Session.forHarness()
    import org.apache.spark.sql.functions._

    // `semcap <dir>`: SemClusterCap soak statistics — cluster-size
    // distribution of the trained assignment at <dir>, and how many
    // clusters the cap excludes from the pair stage (SCALE.md r21 row)
    if (args.headOption.contains("semcap")) {
      val dir = args(1)
      val rows = graft.queries.Similarity.semanticDedup(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val cap = graft.queries.Similarity.SemClusterCap
      println(s"[semcap] dir=$dir clusters=${rows.length} " +
        s"maxSize=${rows.map(_._2).max} " +
        s"overCap=${rows.count(_._2 > cap)} " +
        s"overCapSizes=${rows.filter(_._2 > cap).map(_._2).sorted.mkString(",")} " +
        s"pairsStageMembers=${rows.filter(_._2 <= cap).map(_._2).sum}")
      spark.stop()
      return
    }

    // `dmljobs <query ...>`: jobs-per-query counter (r22, VERDICT r21 #2
    // evidence) — each named declared query runs under its own job group;
    // the group's job count is the per-statement job overhead the script
    // DML routes pay. Listener-bus fed, so a short drain sleep bounds the
    // undercount on this local probe.
    if (args.headOption.contains("dmljobs")) {
      SparkEntry.queries.get("t2_service_summary").foreach { fn =>
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      args.drop(1).foreach { name =>
        val fn = SparkEntry.queries(name)
        val group = s"dmljobs_$name"
        spark.sparkContext.setJobGroup(group, name)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.clearJobGroup()
        Thread.sleep(500)
        val n = spark.sparkContext.statusTracker
          .getJobIdsForGroup(group).length
        println(f"[dmljobs] $name%-24s jobs=$n%3d sec=$sec%7.3f")
      }
      spark.stop()
      return
    }

    // `floor <query ...>`: per-query floor attribution (r22, VERDICT r21
    // #5) — times each named declared query on the harness session (AQE
    // on, the shipped configuration) and on a cloned session with AQE
    // off, isolating how much of the ~0.2–0.4 s per-query floor is AQE
    // stage re-optimization round-trips vs plain scheduling/codegen.
    // Measurement-only: the shipped session config is NOT changed.
    if (args.headOption.contains("floor")) {
      val noAqe = spark.newSession()
      noAqe.conf.set("spark.sql.adaptive.enabled", "false")
      Seq(spark -> "warmup", noAqe -> "warmup").foreach { case (s2, _) =>
        SparkEntry.queries.get("t2_service_summary").foreach { fn =>
          fn(s2, sfDir).write.format("noop").mode("overwrite").save()
        }
      }
      args.drop(1).foreach { name =>
        val fn = SparkEntry.queries(name)
        def sample(s2: org.apache.spark.sql.SparkSession): Seq[Double] =
          (1 to 5).map { _ =>
            val t = System.nanoTime()
            fn(s2, sfDir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t) / 1e9
          }
        val on = sample(spark)
        val off = sample(noAqe)
        def fmt(xs: Seq[Double]) =
          f"min=${xs.min}%6.3f med=${xs.sorted.apply(xs.size / 2)}%6.3f"
        println(f"[floor] $name%-22s aqe_on ${fmt(on)}  aqe_off ${fmt(off)}")
      }
      spark.stop()
      return
    }

    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val samples = (1 to 5).map { _ =>
        val t = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t) / 1e9
      }
      println(f"[probe] $name%-34s " +
        samples.map(s => f"$s%6.3f").mkString(" "))
    }

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    println(s"[probe] lineitem rows=${li.count()} parts=${li.rdd.getNumPartitions}")

    time("range1")(spark.range(1).toDF())
    time("range_1m_sum")(spark.range(1000000).agg(sum("id")))
    time("scan_count")(li.groupBy().count())
    time("scan_sum_double")(li.agg(sum("l_extendedprice")))
    time("scan_sum_decimal")(
      li.agg(sum(col("l_extendedprice").cast("decimal(18,2)"))))
    time("scan_groupby2")(
      li.groupBy("l_returnflag", "l_linestatus").count())
    time("scan_md5_groupby")(
      li.select(expr("conv(substring(md5(cast(cast(l_orderkey as string) as binary)),1,12),16,10)").as("h"))
        .groupBy("h").count().groupBy().count())
    time("scan_window_topk")(
      li.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("l_returnflag").orderBy(desc("l_extendedprice"))))
        .filter(col("rn") <= 5))
    spark.stop()
  }
}
