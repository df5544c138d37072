package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The native word n-gram construction must emit exactly the strings,
  * in exactly the order, of the higher-order formulations it replaced
  * (r22): the element_at trigram spelling and the slice 5-gram
  * spelling, on every input the call sites can reach (size(ws) ≥ n —
  * all of them filter first). */
class WordNgramsSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  private val hof3 =
    """transform(sequence(1, size(ws) - 2),
      |  i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1),
      |                 element_at(ws, i + 2)))""".stripMargin
  private val hof5 =
    "transform(sequence(1, size(ws) - 4), i -> concat_ws(' ', slice(ws, i, 5)))"

  test("identical n-grams and order vs both lambda formulations") {
    import spark.implicits._
    WordNgrams.register(spark)
    val rnd = new scala.util.Random(22)
    val vocab = Seq("the", "féline", "sat", "", "on", "мат", "a", "b",
      "multi word", "x")
    val rows: Seq[Seq[String]] =
      Seq(Seq("a", "b", "c"), Seq("a", "b", "c", "d", "e")) ++
        Seq.fill(40)(Seq.fill(5 + rnd.nextInt(40))(
          vocab(rnd.nextInt(vocab.size))))
    val df = rows.toDF("ws")
    // the call sites filter size(ws) >= n before the expression — the
    // lambda formulations error below that (descending sequence →
    // slice/element_at on index 0), so compare under the same guards
    val out3 = df.where("size(ws) >= 3").selectExpr(
      "graft_word_ngrams(ws, 3) AS f3", s"($hof3) AS r3").collect()
    assert(out3.length >= 40)
    out3.foreach(r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), "trigrams"))
    val out5 = df.where("size(ws) >= 5").selectExpr(
      "graft_word_ngrams(ws, 5) AS f5", s"($hof5) AS r5").collect()
    assert(out5.length >= 40)
    out5.foreach(r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), "5-grams"))
    // interpreted path agrees with codegen (fresh expression inside a
    // higher-order lambda evaluates interpreted)
    val interp = df.where("size(ws) >= 3").selectExpr(
      s"transform(array(ws), w -> graft_word_ngrams(w, 3))[0] AS f3",
      s"($hof3) AS r3").collect()
    interp.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
    // NULL in, NULL out; shorter-than-n yields empty (call sites filter
    // to size >= n, where the lambda agrees)
    val edge = spark.sql(
      """SELECT graft_word_ngrams(IF(false, array('a'), NULL), 3),
        |       graft_word_ngrams(array('a', 'b'), 3)""".stripMargin)
      .collect()(0)
    assert(edge.isNullAt(0))
    assert(edge.getSeq[String](1).isEmpty)
  }
}
