package graft

/** Optimization-round measurement harness (guide §1): for each named
  * declared query, separate the driver-side costs (DataFrame construction
  * incl. any eager script statements; analysis+optimization+physical
  * planning via explain) from execution (noop sink, guide §1.4), sample
  * execution several times, and dump `.explain("formatted")` to
  * `plans/<tag>/<name>_<suffix>.txt` for the judge's plan-claim checks.
  *
  * Not part of the driver contract — a local measurement tool only.
  * Usage: sbt "runMain graft.ExplainDump name1 name2 ..."
  * Env: SPARK_GRAFT_SF_DIR (data), SPARK_GRAFT_PLAN_TAG (default r21),
  *      SPARK_GRAFT_PLAN_SUFFIX (default "before").
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "r21")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    val spark = graft.engine.Session.forHarness()
    val dir = java.nio.file.Paths.get(s"plans/$tag")
    java.nio.file.Files.createDirectories(dir)

    // absorb session/JIT startup so the first measured query isn't cold
    SparkEntry.queries.get("t2_service_summary").foreach { fn =>
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    }

    val names =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[explain] unknown query: $name")
        case Some(fn) =>
          spark.sparkContext.setJobDescription(s"explain:$name")
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          val tBuild = (System.nanoTime() - t0) / 1e9
          val t1 = System.nanoTime()
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val tPlan = (System.nanoTime() - t1) / 1e9
          java.nio.file.Files.write(dir.resolve(s"${name}_$suffix.txt"),
            plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          val execs = (1 to 3).map { _ =>
            val t = System.nanoTime()
            df.write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t) / 1e9
          }
          // re-invoking the query function measures the full per-sample
          // cost the bench pays (scripts re-run their statements here)
          val t2 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val tFull = (System.nanoTime() - t2) / 1e9
          println(f"[explain] $name%-28s build=$tBuild%7.3f plan=$tPlan%6.3f " +
            f"exec=${execs.map(e => f"$e%6.3f").mkString(",")} full=$tFull%7.3f")
      }
    }
    spark.stop()
  }
}
