package graft.queries

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic laws of the curation transforms, pinned through ACTUAL Spark
  * evaluation (not a Scala re-implementation): the transforms live as
  * Column expression trees, so the laws must hold in the engine that runs
  * them. Inputs are ScalaCheck-generated adversarial strings, batched into
  * one DataFrame so the whole spec costs a couple of Spark jobs.
  *
  *  - Idempotence matters operationally: a pipeline stage that re-runs
  *    (retry, backfill over already-scrubbed data) must not corrupt
  *    output — <EMAIL> becoming <<EMAIL>> on the second pass is a real
  *    class of scrubber bug (replacement text re-matched by the pattern).
  *  - Completeness: after redaction, no pattern matches anything.
  */
class CurationSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  // adversarial fragments: real PII shapes, near-misses, the replacement
  // tokens themselves, regex metacharacters, quotes, unicode
  private val fragment: Gen[String] = Gen.oneOf(
    Gen.const("bob@mail7.example.com"),
    Gen.const("a.b+c_d%e@x-y.z.co"),
    Gen.const("user@@double.com"),
    Gen.const("at example dot com"),
    Gen.const("(555) 867-5309"),
    Gen.const("(55) 123-4567"),
    Gen.const("10.1.2.3"),
    Gen.const("999.999.999.9999"),
    Gen.const("v2.3"),
    Gen.const("<EMAIL>"), Gen.const("<PHONE>"), Gen.const("<IP>"),
    Gen.const("[?#].*$"), Gen.const("it's \"quoted\""),
    Gen.const("héllo wörld"),
    Gen.alphaNumStr.map(_.take(12)))

  private val piiString: Gen[String] =
    Gen.listOf(fragment).map(_.mkString(" "))

  private val urlString: Gen[String] = for {
    scheme <- Gen.oneOf("http://", "https://", "HTTPS://", "")
    www <- Gen.oneOf("www.", "WWW.", "")
    host <- Gen.oneOf("site1.example", "a-b.c", "x.y.z")
    path <- Gen.oneOf("", "/", "/Page/9", "/p/q/", "/p%20q")
    tail <- Gen.oneOf("", "?a=1&b=2", "#frag", "?q=http://nested/x")
  } yield scheme + www + host + path + tail

  private def sample(g: Gen[String], n: Int): Seq[String] =
    // deterministic (ADVICE r9): fixed per-index seeds, so a law violation
    // found once reproduces on every re-run instead of vanishing with the
    // next random draw; pureApply retries internally until the gen yields
    (0 until n).map(i =>
      g.pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(42L + i)))

  test("redactPii is idempotent and complete over adversarial strings") {
    import spark.implicits._
    val inputs = sample(piiString, 300)
    val df = inputs.toDF("s")
      .withColumn("once", Curation.redactPii(col("s")))
      .withColumn("twice", Curation.redactPii(Curation.redactPii(col("s"))))
    val bad = df.filter(col("once") =!= col("twice")).collect()
    assert(bad.isEmpty, s"redaction not idempotent on: ${bad.take(3).toSeq}")
    // completeness: nothing PII-shaped survives one pass
    val leaky = df.filter(
      Curation.redactPii(col("once")) =!= col("once")).collect()
    assert(leaky.isEmpty, s"redaction left matches: ${leaky.take(3).toSeq}")
  }

  test("canonicalUrl is idempotent over generated URLs") {
    import spark.implicits._
    val inputs = sample(urlString, 300)
    val df = inputs.toDF("u")
      .withColumn("once", Curation.canonicalUrl(col("u")))
      .withColumn("twice", Curation.canonicalUrl(Curation.canonicalUrl(col("u"))))
    val bad = df.filter(col("once") =!= col("twice")).collect()
    assert(bad.isEmpty, s"canonicalization not idempotent on: ${bad.take(3).toSeq}")
  }

  test("canonicalUrl collapses every planted disguise class") {
    import spark.implicits._
    val disguises = Seq(
      "https://Site3.example/Page/77",
      "https://site3.example/page/77/",
      "https://www.site3.example/page/77?utm_source=x",
      "http://site3.example/page/77#frag")
    val canon = disguises.toDF("u")
      .select(Curation.canonicalUrl(col("u"))).distinct().collect()
    assert(canon.length == 1, canon.toSeq)
    assert(canon.head.getString(0) == "site3.example/page/77")
  }
}
