package graft

/** Interleaved probe (r22): does raising ObjectHashAggregate's
  * sort-based fallback threshold (default 128 in-memory keys) speed the
  * fused capped-pair aggregate? Measurement-only main. */
object ObjAggProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.Session.forHarness()
    val hi = spark.newSession()
    hi.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
      args.headOption.getOrElse("65536"))
    def time(label: String, s: org.apache.spark.sql.SparkSession): Unit = {
      val fn = SparkEntry.queries("p_dedup_ngram")
      val samples = (1 to 4).map { _ =>
        val t = System.nanoTime()
        fn(s, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t) / 1e9
      }
      println(f"[objagg] $label%-8s " + samples.map(x => f"$x%6.3f").mkString(" "))
    }
    time("warm128", spark); time("warmHi", hi)
    for (_ <- 1 to 2) { time("def128", spark); time("hi", hi) }
    spark.stop()
  }
}
