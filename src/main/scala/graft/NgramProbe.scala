package graft

object NgramProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.Session.forHarness()
    graft.functions.WordNgrams.register(spark)
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("ws", split(col("text"), " "))
      .filter(size(col("ws")) >= 5)
    docs.write.format("noop").mode("overwrite").save() // warm
    val hof3 = """transform(sequence(1, size(ws) - 2),
      i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1),
                     element_at(ws, i + 2)))"""
    val hof5 = "transform(sequence(1, size(ws) - 4), i -> concat_ws(' ', slice(ws, i, 5)))"
    def time(label: String, e: String): Unit = {
      val samples = (1 to 5).map { _ =>
        val t = System.nanoTime()
        docs.select(explode(expr(e)).as("sh")).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t) / 1e9
      }
      println(f"[ngramprobe] $label%-10s " + samples.map(s => f"$s%6.3f").mkString(" "))
    }
    // interleave to cancel drift
    for (_ <- 1 to 2) {
      time("hof3", hof3)
      time("native3", "graft_word_ngrams(ws, 3)")
      time("hof5", hof5)
      time("native5", "graft_word_ngrams(ws, 5)")
    }
    spark.stop()
  }
}
