package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (the A5 memoized-bootstrap
  * discipline applies to tests too). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = graft.engine.Session.builder("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      // keep managed-table tests (ScaleSpec bucketing) out of the repo tree
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
