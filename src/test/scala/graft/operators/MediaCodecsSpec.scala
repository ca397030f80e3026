package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.io.ByteArrayOutputStream

/** Real codec-free decode behind the multimodal seam: WAV/PCM-16 and
  * binary PPM, against HAND-BUILT byte fixtures (the WAV header below is
  * written field-by-field in the test, independently of
  * [[MediaCodecs.encodeWav]], so encoder and decoder cannot share a bug).
  */
class MediaCodecsSpec extends AnyFunSuite with SparkTestBase {

  /** 1-second 500 Hz sine, 16 kHz mono PCM-16, amplitude 0.5, half-sample
    * phase offset (so no sample lands exactly on zero and zero-crossing
    * counting is unambiguous).
    */
  private def sineSamples: Array[Short] =
    Array.tabulate(16000) { i =>
      math.round(0.5 * 32767 *
        math.sin(2 * math.Pi * 500 * (i + 0.5) / 16000)).toShort
    }

  /** WAV container written byte-by-byte (little-endian), with a gratuitous
    * LIST chunk between fmt and data to force the chunk walk.
    */
  private def handBuiltWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val bo = new ByteArrayOutputStream()
    def ascii(s: String): Unit = bo.write(s.getBytes("US-ASCII"))
    def le32(v: Int): Unit = { bo.write(v & 0xff); bo.write((v >> 8) & 0xff); bo.write((v >> 16) & 0xff); bo.write((v >> 24) & 0xff) }
    def le16(v: Int): Unit = { bo.write(v & 0xff); bo.write((v >> 8) & 0xff) }
    val dataSize = samples.length * 2
    val listPayload = "INFOgraft".getBytes("US-ASCII") // odd length: exercises word alignment
    ascii("RIFF"); le32(4 + 24 + 8 + listPayload.length + (listPayload.length & 1) + 8 + dataSize); ascii("WAVE")
    ascii("fmt "); le32(16)
    le16(1); le16(1); le32(sampleRate); le32(sampleRate * 2); le16(2); le16(16)
    ascii("LIST"); le32(listPayload.length); bo.write(listPayload); bo.write(0) // pad byte
    ascii("data"); le32(dataSize)
    samples.foreach(s => le16(s & 0xffff))
    bo.toByteArray
  }

  test("hand-built WAV decodes: sample rate, count, duration, exact samples") {
    val wav = handBuiltWav(sineSamples, 16000)
    val a = MediaCodecs.decodeWav(wav).get
    assert(a.sampleRate == 16000)
    assert(a.samples.length == 16000)
    assert(a.durationMs == 1000)
    assert(a.samples.sameElements(sineSamples))
  }

  test("audio features: RMS, zero-crossing rate, peak, Goertzel band") {
    val a = MediaCodecs.decodeWav(handBuiltWav(sineSamples, 16000)).get
    val dim = 19 // 15 bands -> centers at k*500 Hz, k=1..15
    val f = MediaCodecs.wavFeatures(a, dim)
    assert(math.abs(f(0) - 0.5 / math.sqrt(2)) < 0.002, s"rms=${f(0)}")
    assert(f(1) > 0.060 && f(1) < 0.065, s"zcr=${f(1)}") // 2*500/16000 = 0.0625
    assert(math.abs(f(2)) < 0.001, s"mean=${f(2)}")
    assert(math.abs(f(3) - 0.5) < 0.01, s"peak=${f(3)}")
    // 500 Hz = the FIRST band center: integer cycles over the window, so
    // the Goertzel magnitude is A/2 exactly (up to int16 quantization)
    assert(math.abs(f(4) - 0.25) < 0.005, s"band0=${f(4)}")
    val others = (5 until dim).map(f(_).toDouble)
    assert(others.forall(_ < 0.01), s"off-band leakage: $others")
  }

  test("encodeWav/decodeWav roundtrip is exact") {
    val s = Array.tabulate(777)(i => ((i * 2731) % 65536 - 32768).toShort)
    val a = MediaCodecs.decodeWav(MediaCodecs.encodeWav(11025, s)).get
    assert(a.sampleRate == 11025 && a.samples.sameElements(s))
  }

  test("malformed WAVs return None, never throw") {
    val good = handBuiltWav(sineSamples.take(16), 8000)
    assert(MediaCodecs.decodeWav(good).isDefined)
    assert(MediaCodecs.decodeWav(good.take(30)).isEmpty) // truncated mid-chunk
    assert(MediaCodecs.decodeWav("RIFFxxxxWAVE".getBytes).isEmpty) // no chunks
    assert(MediaCodecs.decodeWav(Array[Byte](1, 2, 3)).isEmpty)
    val stereo = good.clone
    stereo(22) = 2 // channels = 2
    assert(MediaCodecs.decodeWav(stereo).isEmpty)
  }

  test("hand-built PPM with comment decodes: dims, pixels, features") {
    val header = "P6\n# a comment\n2 2\n255\n".getBytes("US-ASCII")
    val rgb = Array[Int](255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255).map(_.toByte)
    val img = MediaCodecs.decodePpm(header ++ rgb).get
    assert(img.width == 2 && img.height == 2 && img.maxVal == 255)
    assert(img.rgb.sameElements(rgb))
    val f = MediaCodecs.ppmFeatures(img, 8) // 4 luma bins
    assert(math.abs(f(0) - 0.5) < 1e-6 && math.abs(f(1) - 0.5) < 1e-6 &&
      math.abs(f(2) - 0.5) < 1e-6)
    // lumas 0.299, 0.587, 0.114, 1.0 -> bins 1, 2, 0, 3: one pixel each
    assert((4 until 8).forall(i => math.abs(f(i) - 0.25) < 1e-6), f.toSeq)
    assert(f(3) > 0.3 && f(3) < 0.4) // stddev of those lumas = 0.335
  }

  test("malformed PPMs return None") {
    assert(MediaCodecs.decodePpm("P6\n2 2\n255\n".getBytes).isEmpty) // no pixels
    assert(MediaCodecs.decodePpm("P6\n2 2\n65535\n".getBytes).isEmpty) // 2-byte maxval
    assert(MediaCodecs.decodePpm("P3\n1 1\n255\n".getBytes).isEmpty) // ASCII variant
  }

  test("extractFeatures routes WAV and PPM payloads to REAL decode, others to stub") {
    val wav = MediaCodecs.encodeWav(16000, sineSamples)
    val ppmHeader = "P6\n1 1\n255\n".getBytes("US-ASCII")
    val ppm = ppmHeader ++ Array[Int](255, 255, 255).map(_.toByte)
    val txt = "just text".getBytes("UTF-8")
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("content", BinaryType)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1, wav), Row(2, ppm), Row(3, txt), Row(4, null)),
      schema)
    val out = Multimodal.extractFeatures(df, "content", dim = 8)
      .collect().sortBy(_.getInt(0))
    val fWav = out(0).getSeq[Float](2)
    assert(math.abs(fWav(0) - 0.5 / math.sqrt(2)) < 0.002) // real RMS
    val fPpm = out(1).getSeq[Float](2)
    assert(math.abs(fPpm(0) - 1.0) < 1e-6) // real white-pixel mean
    assert(out(2).getSeq[Float](2) != null) // stub path still works
    assert(out(3).isNullAt(2)) // null passthrough
  }

  test("decodeImageIOReused is bit-identical to decodeImageIO on PNG and " +
    "JPEG-shaped payloads, including across repeated same-thread calls") {
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 8) {
      val w = 1 + rng.nextInt(12); val h = 1 + rng.nextInt(12)
      val rgb = Array.fill(w * h * 3)(rng.nextInt(256).toByte)
      val png = MediaCodecs.encodePng(w, h, rgb)
      val a = MediaCodecs.decodeImageIO(png).get
      val b = MediaCodecs.decodeImageIOReused(png).get
      assert(a.width == b.width && a.height == b.height &&
        a.rgb.toSeq == b.rgb.toSeq, s"trial $trial")
    }
    // undecodable bytes: same None contract (falls back internally)
    assert(MediaCodecs.decodeImageIOReused(Array[Byte](1, 2, 3)).isEmpty)
    val brokenPng = MediaCodecs.encodePng(4, 4, new Array[Byte](48)).take(20)
    assert(MediaCodecs.decodeImageIOReused(brokenPng).isEmpty)
  }

  test("MP3 frame-header walk: VBR stream with ID3v2 + ID3v1 tags, exact metadata") {
    import MediaCodecs._
    // all 14 bitrate indexes, padding toggling — every frame length differs
    val frames = (1 to 14).map(i => (i, i % 3 == 0)) ++ Seq((5, false), (5, true))
    val mp3 = encodeMp3(frames, srIndex = 0, id3v2Size = 37, id3v1 = true)
    val m = decodeMp3Meta(mp3).getOrElse(fail("walk failed"))
    assert(m.sampleRate == 44100)
    assert(m.nFrames == 16)
    assert(m.durationMs == 16L * 1152 * 1000 / 44100)
    val kbps = frames.map(f => Mp3BitrateKbps(f._1))
    assert(m.avgKbps == kbps.map(_.toLong).sum / 16)
    assert(m.vbr)
    // CBR stream at 48 kHz: vbr=false, sr from the header index
    val cbr = decodeMp3Meta(encodeMp3(Seq.fill(5)((9, false)), srIndex = 1))
      .getOrElse(fail("cbr walk failed"))
    assert(cbr.sampleRate == 48000 && !cbr.vbr && cbr.avgKbps == 128)
  }

  test("MP3 walk is strict: desync, truncation, reserved index all return None") {
    import MediaCodecs._
    val good = encodeMp3(Seq((5, false), (7, true)))
    assert(decodeMp3Meta(good).isDefined)
    // truncate the last frame
    assert(decodeMp3Meta(good.dropRight(1)).isEmpty)
    // corrupt the second frame's sync byte -> mid-stream junk
    val bad = good.clone()
    val firstLen = 144000 * Mp3BitrateKbps(5) / 44100
    bad(firstLen) = 0x00
    assert(decodeMp3Meta(bad).isEmpty)
    // reserved bitrate index 15
    val resv = good.clone()
    resv(2) = ((15 << 4) | 0).toByte
    assert(decodeMp3Meta(resv).isEmpty)
    // ID3v2 size pointing past the payload
    assert(decodeMp3Meta(encodeMp3(Seq((5, false)), id3v2Size = 10).take(12)).isEmpty)
    assert(decodeMp3Meta(Array[Byte]()).isEmpty)
    assert(decodeMp3Meta(null).isEmpty)
  }
}
