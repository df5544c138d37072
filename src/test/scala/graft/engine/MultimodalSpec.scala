package graft.engine

import org.scalatest.funsuite.AnyFunSuite

/** Multimodal binary-column plumbing (stubbed decode — codecs absent in
  * this environment; the schema/partition/batch shape is the real one). */
class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  private def mediaDf = {
    import spark.implicits._
    Seq(
      (1L, Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 1, 2, 3)),
      (2L, Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte, 9)),
      (3L, Array[Byte](0, 1, 2, 3, 4, 5, 6, 7))
    ).toDF("id", "media").repartition(2)
  }

  test("decode adds a typed meta struct, preserves other columns") {
    val out = Multimodal.withDecodedMeta(mediaDf, "media")
    assert(out.columns.toSeq == Seq("id", "media", "meta"))
    val byId = out.selectExpr("id", "meta.format", "meta.n_bytes")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(byId(1L) == (("png", 7L)))
    assert(byId(2L) == (("jpeg", 5L)))
    assert(byId(3L) == (("bin", 8L)))
  }

  test("decode is deterministic across runs (stub discipline)") {
    val a = Multimodal.withDecodedMeta(mediaDf, "media")
      .selectExpr("id", "meta").orderBy("id").collect().toSeq
    val b = Multimodal.withDecodedMeta(mediaDf, "media")
      .selectExpr("id", "meta").orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("frame sampling yields n binary slices per row") {
    val out = Multimodal.sampleFrames(mediaDf, "media", 3)
      .selectExpr("id", "size(frames) AS n").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.values.forall(_ == 3))
  }

  test("stub embedding: dim floats in [-1,1], deterministic, ANN-ready") {
    val out = Multimodal.withStubEmbedding(mediaDf, "media", 8)
    val rows = out.selectExpr("id", "embedding").orderBy("id").collect()
    assert(rows.forall(_.getSeq[Float](1).length == 8))
    assert(rows.forall(_.getSeq[Float](1).forall(v => v >= -1f && v <= 1f)))
    val again = Multimodal.withStubEmbedding(mediaDf, "media", 8)
      .selectExpr("id", "embedding").orderBy("id").collect()
    assert(rows.map(_.getSeq[Float](1)).toSeq ==
      again.map(_.getSeq[Float](1)).toSeq)
    // distinct payloads produce distinct vectors (it's a feature, not a fill)
    assert(rows.map(_.getSeq[Float](1)).distinct.length == rows.length)
  }

  test("resize stub clamps payload size, keeps the column contract") {
    val out = Multimodal.resizeStub(mediaDf, "media", 4)
      .selectExpr("length(media) AS n").collect().map(_.getInt(0))
    assert(out.forall(_ <= 4))
  }
}
