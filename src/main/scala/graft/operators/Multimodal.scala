package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with a typed metadata struct, plus decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The Spark-side shapes — schema, partition-parallel batch iteration,
  * deterministic output layout — are real and tested. The DECODE step is
  * a clearly-marked STUB (this container has no image/audio codecs): it
  * derives deterministic fake features from the raw bytes so the
  * pipeline is end-to-end runnable; swapping in a real decoder (e.g. a
  * JNI JPEG/PCM library, or `mapInArrow` to a Python worker with
  * PIL/torchaudio) changes ONLY the marked function body — the operator
  * contract, batching, and schema stay identical.
  *
  * Scale design (100 TB): payloads never shuffle — every stage is a
  * per-partition map. Feature vectors (small) are what downstream
  * joins/aggregations move.
  */
object Multimodal {

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("kind", StringType),        // "image" | "audio" | "video"
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", LongType)))

  /** Wrap a string column as a binary payload + synthesized metadata —
    * the fixture path for tests (real pipelines read payloads from
    * object-store files or parquet binary columns directly).
    */
  def synthesizePayload(df: DataFrame, srcCol: String, kind: String): DataFrame =
    df.withColumn("content", encode(col(srcCol), "UTF-8"))
      .withColumn(
        "media_meta",
        struct(
          lit(kind).as("kind"),
          (octet_length(col("content")) % 640 + 1).cast(IntegerType).as("width"),
          (octet_length(col("content")) % 480 + 1).cast(IntegerType).as("height"),
          lit(16000).as("sample_rate"),
          (octet_length(col("content")).cast(LongType) * 10L).as("duration_ms")))

  /** STUB decode + feature extraction: binary payload → `dim` float
    * features. Deterministic fake: a seeded rolling hash of the payload
    * bytes, folded per feature slot.
    *
    * REAL IMPLEMENTATION POINT: replace `fakeDecode` with an actual
    * codec call (JPEG decode → pixel stats, PCM decode → spectral
    * features, ...). Everything around it — mapPartitions batching,
    * output schema, null passthrough — is production-shaped.
    */
  def extractFeatures(
      df: DataFrame,
      contentCol: String,
      dim: Int,
      batchSize: Int = 64): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    val inSchema = df.schema
    val outSchema = inSchema.add("features", ArrayType(FloatType), nullable = true)
    val ci = inSchema.fieldIndex(contentCol)
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    // BATCHED iteration (the mapInPandas/mapInArrow batch contract): rows
    // buffer in groups of `batchSize` and the whole batch goes to the
    // decoder at once — a real implementation hands the batch to a
    // vectorized/accelerator decode; memory is bounded by batchSize
    // payloads per task, and laziness between batches is preserved
    // (grouped() pulls the next batch only when downstream asks).
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val payloads = batch.map(r =>
          if (r.isNullAt(ci)) null else r.getAs[Array[Byte]](ci))
        val feats = decodeBatch(payloads, dim)
        batch.iterator.zip(feats.iterator).map { case (r, f) =>
          Row.fromSeq(r.toSeq :+ f)
        }
      }
    }
  }

  /** Batch decoder — the real-implementation seam: ONE call per batch so
    * a vectorized decoder (GPU JPEG, batched resample) slots in without
    * touching the operator. NULL payloads pass through as NULL features,
    * preserving row alignment.
    *
    * REAL for WAV/PCM-16 (hand-rolled RIFF parser → time/frequency
    * audio features), binary PPM (P6), and JPEG/PNG (JDK `javax.imageio`
    * → the same pixel statistics, [[MediaCodecs.decodeImageIO]]). For
    * compressed audio (MP3/AAC/...) only SAMPLE synthesis is stubbed —
    * container metadata parses for real via
    * [[MediaCodecs.decodeMp3Meta]] (q130's oracle-checked byte walk);
    * the JDK ships no audio codec, so a real deployment replaces only
    * `fakeDecode`.
    */
  private def decodeBatch(
      payloads: Seq[Array[Byte]], dim: Int): Seq[Array[Float]] =
    payloads.map { p =>
      if (p == null) null
      else if (MediaCodecs.isWav(p))
        MediaCodecs.decodeWav(p)
          .map(MediaCodecs.wavFeatures(_, dim))
          .getOrElse(fakeDecode(p, dim)) // malformed → stub, not task failure
      else if (MediaCodecs.isPpm(p))
        MediaCodecs.decodePpm(p)
          .map(MediaCodecs.ppmFeatures(_, dim))
          .getOrElse(fakeDecode(p, dim))
      else if (MediaCodecs.isPng(p) || MediaCodecs.isJpeg(p))
        MediaCodecs.decodeImageIO(p)
          .map(MediaCodecs.ppmFeatures(_, dim))
          .getOrElse(fakeDecode(p, dim))
      else fakeDecode(p, dim)
    }

  /** STUB — stands in for a real media decoder of compressed formats.
    * Deterministic in the payload bytes only.
    */
  private def fakeDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Long](dim)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= bytes(i)
      h *= 0x100000001b3L
      acc(i % dim) += (h >>> 32)
      i += 1
    }
    acc.map(v => (v % 1000L) / 1000.0f)
  }

  /** "Resize": image payload stage that rewrites metadata to the target
    * dims and (STUB) truncates the payload proportionally — a real
    * implementation decodes, resamples, re-encodes; the plumbing
    * (projection shape, metadata contract) is what this pins.
    */
  def resize(df: DataFrame, targetW: Int, targetH: Int): DataFrame =
    df.withColumn(
      "media_meta",
      struct(
        col("media_meta.kind").as("kind"),
        lit(targetW).as("width"),
        lit(targetH).as("height"),
        col("media_meta.sample_rate").as("sample_rate"),
        col("media_meta.duration_ms").as("duration_ms")))

  /** Frame sampling for video payloads: emit every `everyN`-th fixed-size
    * chunk of the payload as a frame row (frame_idx, frame_bytes). A real
    * decoder yields actual frames; chunking pins the explode shape and
    * the (id, frame_idx) output contract.
    */
  def sampleFrames(
      df: DataFrame,
      idCol: String,
      contentCol: String,
      frameBytes: Int,
      everyN: Int): DataFrame =
    df.select(
      col(idCol),
      posexplode(expr(
        s"transform(sequence(0, greatest(int(octet_length($contentCol) / $frameBytes) - 1, 0), $everyN), " +
          s"i -> substring($contentCol, i * $frameBytes + 1, $frameBytes))"))
        .as(Seq("frame_idx", "frame_bytes")))
}
