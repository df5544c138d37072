package graft.engine

import org.scalatest.funsuite.AnyFunSuite

/** The fused PK batch check (r22): one job certifies in-batch soundness
  * AND yields the head-key span the footer prune consumes — the refusal
  * semantics and messages must be exactly those of the former
  * requireKeysSound + requireNoExistingKey pair. Plus the r22
  * stableSnapshot hardening: row-set-unstable-but-deterministic sources
  * (LIMIT, first/any_value, dropDuplicates) must pin to a snapshot. */
class PkFusedCheckSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  private def freshTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name (k BIGINT, v STRING) USING parquet")
    spark.sql(s"INSERT INTO $name VALUES (1, 'a'), (10, 'b')")
    spark.sql(s"INSERT INTO $name VALUES (100, 'c'), (110, 'd')")
  }

  test("fused check refuses in-batch duplicates with the sound message") {
    import spark.implicits._
    freshTable("pk_fused_t")
    val e = intercept[IllegalArgumentException] {
      Engine.requireSoundAbsentKeys(spark, "pk_fused_t",
        Seq((7L, "x"), (7L, "y")).toDF("k", "v"), Seq("k"), "INSERT")
    }
    assert(e.getMessage.contains("duplicate key") &&
      e.getMessage.contains("repeated within the written rows"))
  }

  test("fused check refuses NULL keys with the sound message") {
    import spark.implicits._
    freshTable("pk_fused_t2")
    val src = Seq(Some(7L), None).toDF("k")
      .withColumn("v", org.apache.spark.sql.functions.lit("x"))
    val e = intercept[IllegalArgumentException] {
      Engine.requireSoundAbsentKeys(spark, "pk_fused_t2",
        src, Seq("k"), "INSERT")
    }
    assert(e.getMessage.contains("NULL in PRIMARY KEY"))
  }

  test("fused check refuses an existing key and passes a fresh batch") {
    import spark.implicits._
    freshTable("pk_fused_t3")
    val e = intercept[IllegalArgumentException] {
      Engine.requireSoundAbsentKeys(spark, "pk_fused_t3",
        Seq((110L, "dup")).toDF("k", "v"), Seq("k"), "INSERT")
    }
    assert(e.getMessage.contains("duplicate key") &&
      e.getMessage.contains("pk_fused_t3"))
    // fresh keys sail through the pruned path; empty batches trivially
    Engine.requireSoundAbsentKeys(spark, "pk_fused_t3",
      Seq((111L, "new")).toDF("k", "v"), Seq("k"), "INSERT")
    Engine.requireSoundAbsentKeys(spark, "pk_fused_t3",
      Seq.empty[(Long, String)].toDF("k", "v"), Seq("k"), "INSERT")
  }

  test("span equals the batch's min/max and empty encodes nonEmpty=false") {
    import spark.implicits._
    val span = Engine.requireKeysSoundSpan(
      Seq(5L, 99L, 42L).toDF("k"), Seq("k"), "T", wantSpan = true)
    assert(span.contains(Engine.BatchSpan(nonEmpty = true, 5L, 99L)))
    val empty = Engine.requireKeysSoundSpan(
      Seq.empty[Long].toDF("k"), Seq("k"), "T", wantSpan = true)
    assert(empty.exists(!_.nonEmpty))
    val noSpan = Engine.requireKeysSoundSpan(
      Seq(5L).toDF("k"), Seq("k"), "T", wantSpan = false)
    assert(noSpan.isEmpty)
  }

  test("stableSnapshot pins row-set-unstable deterministic sources") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    // stable shapes pass through untouched
    assert(Engine.stableSnapshot(base) eq base)
    val filtered = base.filter("k > 1")
    assert(Engine.stableSnapshot(filtered) eq filtered)
    // LIMIT without total order, dropDuplicates, first() must pin
    def pinned(df: org.apache.spark.sql.DataFrame): Boolean =
      !(Engine.stableSnapshot(df) eq df)
    assert(pinned(base.limit(2)))
    assert(pinned(base.dropDuplicates("v")))
    assert(pinned(base.groupBy("v")
      .agg(org.apache.spark.sql.functions.first("k").as("k"))))
  }
}
