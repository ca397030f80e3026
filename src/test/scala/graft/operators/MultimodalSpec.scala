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

  test("PNG decode through extractFeatures is pixel-exact (ImageIO path)") {
    // A 2×2 image with known channel values: features[0..2] are channel
    // means / 255, exactly recoverable because PNG is lossless.
    val rgb = Array[Byte](
      10, 20, 30, 40, 50, 60,
      70, 80, 90, 100, 110, 120)
    val png = MediaCodecs.encodePng(2, 2, rgb)
    assert(MediaCodecs.isPng(png))
    val df = Seq((1L, png)).toDF("doc_id", "content")
    val feats = Multimodal.extractFeatures(df, "content", dim = 8)
      .select("features").as[Seq[Float]].collect().head
    assert(math.abs(feats(0) - (10 + 40 + 70 + 100) / 4.0f / 255f) < 1e-6)
    assert(math.abs(feats(1) - (20 + 50 + 80 + 110) / 4.0f / 255f) < 1e-6)
    assert(math.abs(feats(2) - (30 + 60 + 90 + 120) / 4.0f / 255f) < 1e-6)
  }

  test("JPEG decode through extractFeatures approximates channel means (lossy)") {
    // solid-color image: JPEG quantization error on a flat field is tiny,
    // so channel means must land within a couple of 8-bit steps
    val (r, g, b) = (200, 120, 40)
    val rgb = Array.tabulate[Byte](16 * 16 * 3) { i =>
      (i % 3 match { case 0 => r; case 1 => g; case 2 => b }).toByte
    }
    val jpg = MediaCodecs.encodeJpeg(16, 16, rgb)
    assert(MediaCodecs.isJpeg(jpg))
    val df = Seq((1L, jpg)).toDF("doc_id", "content")
    val feats = Multimodal.extractFeatures(df, "content", dim = 8)
      .select("features").as[Seq[Float]].collect().head
    assert(math.abs(feats(0) - r / 255f) < 4 / 255f, s"meanR=${feats(0)}")
    assert(math.abs(feats(1) - g / 255f) < 4 / 255f, s"meanG=${feats(1)}")
    assert(math.abs(feats(2) - b / 255f) < 4 / 255f, s"meanB=${feats(2)}")
  }

  test("undecodable compressed payload degrades to stub, not failure") {
    val broken = Array[Byte](0x89.toByte, 'P', 'N', 'G', 1, 2, 3, 4, 5)
    val df = Seq((1L, broken)).toDF("doc_id", "content")
    val feats = Multimodal.extractFeatures(df, "content", dim = 4)
      .select("features").as[Seq[Float]].collect().head
    assert(feats.length == 4) // stub features, no exception
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
