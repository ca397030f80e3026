package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "some image-ish payload content here"),
    (2L, "a much longer payload " * 20),
    (3L, "")
  ).toDF("doc_id", "text")

  test("synthesizePayload: binary content + typed metadata struct") {
    val out = Multimodal.synthesizePayload(docs, "text", "image")
    assert(out.schema("content").dataType.typeName == "binary")
    val meta = out.select("media_meta.kind", "media_meta.width", "media_meta.height")
      .as[(String, Int, Int)].collect()
    assert(meta.forall(_._1 == "image"))
    assert(meta.forall(m => m._2 >= 1 && m._3 >= 1))
  }

  test("extractFeatures (stub decode): fixed dim, deterministic, null-safe") {
    val withPayload = Multimodal.synthesizePayload(docs, "text", "image")
    val f1 = Multimodal.extractFeatures(withPayload, "content", dim = 4)
      .select("doc_id", "features").as[(Long, Seq[Float])].collect().toMap
    val f2 = Multimodal.extractFeatures(withPayload, "content", dim = 4)
      .select("doc_id", "features").as[(Long, Seq[Float])].collect().toMap
    assert(f1 == f2) // deterministic stub
    assert(f1.values.forall(_.length == 4))
    assert(f1(1L) != f1(2L)) // payload-dependent
    // batch size must not change results — row↔feature alignment holds
    // across batch boundaries (batchSize=1 degenerates to per-row)
    val f3 = Multimodal.extractFeatures(withPayload, "content", dim = 4, batchSize = 1)
      .select("doc_id", "features").as[(Long, Seq[Float])].collect().toMap
    val f4 = Multimodal.extractFeatures(withPayload, "content", dim = 4, batchSize = 3)
      .select("doc_id", "features").as[(Long, Seq[Float])].collect().toMap
    assert(f3 == f1 && f4 == f1)
  }

  test("resize rewrites metadata dims only") {
    val out = Multimodal.resize(
      Multimodal.synthesizePayload(docs, "text", "image"), 224, 224)
      .select("media_meta.width", "media_meta.height", "media_meta.kind")
      .as[(Int, Int, String)].collect()
    assert(out.forall(r => r._1 == 224 && r._2 == 224 && r._3 == "image"))
  }

  test("sampleFrames: (id, frame_idx, bytes) contract with stride") {
    val withPayload = Multimodal.synthesizePayload(docs, "text", "video")
    val frames = Multimodal.sampleFrames(withPayload, "doc_id", "content",
      frameBytes = 16, everyN = 2)
    val byDoc = frames.groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    assert(byDoc(2L) > byDoc(1L)) // longer payload ⇒ more frames
    val idxs = frames.filter(col("doc_id") === 2L)
      .select("frame_idx").as[Int].collect().sorted
    assert(idxs.headOption.contains(0))
  }
}
