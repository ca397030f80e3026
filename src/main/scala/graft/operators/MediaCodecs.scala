package graft.operators

/** Media parsing without external native libraries:
  *
  *  - WAV/PCM-16 audio (RIFF container) and binary PPM (P6) images are
  *    decoded by hand — their decode is pure byte-format arithmetic;
  *  - JPEG and PNG decode through the JDK's built-in `javax.imageio`
  *    ([[decodeImageIO]]) — real compressed-raster decode with zero new
  *    dependencies, normalized to the same [[PpmImage]] shape so every
  *    downstream feature path is format-agnostic.
  *
  * Compressed AUDIO is split: MP3 FRAME-HEADER metadata (sample rate,
  * duration, bitrate, VBR) is parsed for real by [[decodeMp3Meta]] — a
  * pure byte-walk like the RIFF parser — while SAMPLE decode (the only
  * part needing an actual codec, which the JDK ships none of) stays on
  * the stub path in [[Multimodal]].
  *
  * All parsers are defensive: malformed payloads return None rather
  * than throwing, so a corrupt row degrades to stub features instead of
  * failing the task (the quarantine philosophy of RobustSources).
  */
object MediaCodecs {

  final case class WavAudio(sampleRate: Int, samples: Array[Short]) {
    def durationMs: Long = samples.length.toLong * 1000L / sampleRate
  }

  final case class PpmImage(width: Int, height: Int, maxVal: Int, rgb: Array[Byte])

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  def isWav(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  def isPpm(b: Array[Byte]): Boolean =
    b != null && b.length >= 3 && b(0) == 'P' && b(1) == '6' &&
      (b(2) == ' ' || b(2) == '\n' || b(2) == '\t' || b(2) == '\r')

  /** Parse a RIFF/WAVE container: walk chunks, require PCM (format 1),
    * 16-bit, mono. Returns None on anything else.
    */
  def decodeWav(b: Array[Byte]): Option[WavAudio] = {
    if (!isWav(b)) return None
    var off = 12
    var sampleRate = -1
    var bitsPerSample = -1
    var channels = -1
    var fmtOk = false
    var data: Array[Short] = null
    while (off + 8 <= b.length) {
      val id = new String(b, off, 4, "US-ASCII")
      val size = le32(b, off + 4)
      if (size < 0 || off + 8 + size > b.length) return None
      id match {
        case "fmt " if size >= 16 =>
          val fmtCode = le16(b, off + 8)
          channels = le16(b, off + 10)
          sampleRate = le32(b, off + 12)
          bitsPerSample = le16(b, off + 22)
          fmtOk = fmtCode == 1 && channels == 1 && bitsPerSample == 16 &&
            sampleRate > 0
        case "data" =>
          val n = size / 2
          val s = new Array[Short](n)
          var i = 0
          while (i < n) { s(i) = le16(b, off + 8 + i * 2).toShort; i += 1 }
          data = s
        case _ => // skip unknown chunks (LIST, fact, ...)
      }
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (fmtOk && data != null) Some(WavAudio(sampleRate, data)) else None
  }

  /** Encode mono PCM-16 to a minimal RIFF/WAVE payload (test-fixture /
    * local-collection-source path; also pins the decoder via roundtrip).
    */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val out = new Array[Byte](44 + dataSize)
    def putAscii(off: Int, s: String): Unit =
      s.getBytes("US-ASCII").copyToArray(out, off)
    def put32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte
      out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def put16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    putAscii(0, "RIFF"); put32(4, 36 + dataSize); putAscii(8, "WAVE")
    putAscii(12, "fmt "); put32(16, 16)
    put16(20, 1) // PCM
    put16(22, 1) // mono
    put32(24, sampleRate)
    put32(28, sampleRate * 2) // byte rate
    put16(32, 2) // block align
    put16(34, 16) // bits/sample
    putAscii(36, "data"); put32(40, dataSize)
    var i = 0
    while (i < samples.length) {
      put16(44 + i * 2, samples(i) & 0xffff)
      i += 1
    }
    out
  }

  /** Parse binary PPM (P6): ASCII header `P6 <w> <h> <maxval>` with
    * `#` comments, then raw RGB triplets. maxval ≤ 255 only (the 2-byte
    * variant returns None).
    */
  def decodePpm(b: Array[Byte]): Option[PpmImage] = {
    if (!isPpm(b)) return None
    var off = 2
    def skipWs(): Boolean = {
      var progressed = false
      var go = true
      while (go && off < b.length) {
        val c = b(off)
        if (c == '#') { // comment to end of line
          while (off < b.length && b(off) != '\n') off += 1
          progressed = true
        } else if (c == ' ' || c == '\n' || c == '\t' || c == '\r') {
          off += 1; progressed = true
        } else go = false
      }
      progressed
    }
    def readInt(): Int = {
      var v = 0
      var any = false
      while (off < b.length && b(off) >= '0' && b(off) <= '9') {
        v = v * 10 + (b(off) - '0'); off += 1; any = true
      }
      if (any) v else -1
    }
    if (!skipWs()) return None
    val w = readInt(); skipWs()
    val h = readInt(); skipWs()
    val mv = readInt()
    if (w <= 0 || h <= 0 || mv <= 0 || mv > 255) return None
    off += 1 // exactly ONE whitespace byte after maxval per the spec
    val need = w * h * 3
    if (off + need > b.length) return None
    Some(PpmImage(w, h, mv, java.util.Arrays.copyOfRange(b, off, off + need)))
  }

  /** Encode a binary PPM (P6) payload. */
  def encodePpm(width: Int, height: Int, rgb: Array[Byte], maxVal: Int = 255): Array[Byte] = {
    require(rgb.length == width * height * 3, "rgb length must be w*h*3")
    val header = s"P6\n$width $height\n$maxVal\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + rgb.length)
    header.copyToArray(out)
    rgb.copyToArray(out, header.length)
    out
  }

  /** Container-level MP3 metadata — everything the FRAME HEADERS carry.
    * Sample DECODE (the spectral synthesis) would need a real codec and
    * stays stubbed in [[Multimodal]]; the header walk below is pure byte
    * arithmetic, exactly like the RIFF chunk walk, so duration / bitrate
    * / sample-rate / VBR detection are REAL.
    */
  final case class Mp3Meta(
      sampleRate: Int,
      nFrames: Long,
      durationMs: Long,
      avgKbps: Long,
      vbr: Boolean)

  /** MPEG-1 Layer III bitrate table, kbps by header index 1–14. */
  private[operators] val Mp3BitrateKbps: Array[Int] =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  private[operators] val Mp3SampleRates: Array[Int] = Array(44100, 48000, 32000)

  def isMp3(b: Array[Byte]): Boolean =
    b != null && b.length >= 4 &&
      (((b(0) & 0xff) == 0xff && (b(1) & 0xe0) == 0xe0) ||
        (b(0) == 'I' && b(1) == 'D' && b(2) == '3'))

  /** Walk every MPEG-1 Layer III frame header: skip a leading ID3v2 tag
    * (syncsafe size), then per frame read bitrate index / sample-rate
    * index / padding bit, advance by the Layer III frame length
    * `144000·kbps/sr + padding`, and accumulate duration (1152
    * samples/frame) and bitrate. Strict walk: any desync, reserved
    * index, or mid-stream junk (other than a trailing 128-byte ID3v1
    * tag) returns None — a wrong frame-length computation cannot
    * silently produce a partial answer, it breaks the walk and the
    * oracle hash with it.
    */
  def decodeMp3Meta(b: Array[Byte]): Option[Mp3Meta] = {
    if (!isMp3(b)) return None
    var off = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      // ID3v2: 4 syncsafe size bytes (7 bits each) after the 6-byte head
      val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      off = 10 + size
      if (off >= b.length) return None
    }
    var sampleRate = -1
    var nFrames = 0L
    var kbpsSum = 0L
    var kbpsMin = Int.MaxValue
    var kbpsMax = Int.MinValue
    while (off + 4 <= b.length) {
      if ((b(off) & 0xff) == 0xff && (b(off + 1) & 0xff) == 0xfb) {
        // sync + MPEG-1 + Layer III + no CRC
        val brIdx = (b(off + 2) & 0xf0) >>> 4
        val srIdx = (b(off + 2) & 0x0c) >>> 2
        val padding = (b(off + 2) & 0x02) >>> 1
        if (brIdx < 1 || brIdx > 14 || srIdx > 2) return None
        val sr = Mp3SampleRates(srIdx)
        if (sampleRate == -1) sampleRate = sr
        else if (sampleRate != sr) return None // sr change mid-stream: corrupt
        val kbps = Mp3BitrateKbps(brIdx)
        val frameLen = 144000 * kbps / sr + padding
        if (frameLen < 4 || off + frameLen > b.length) return None
        nFrames += 1
        kbpsSum += kbps
        if (kbps < kbpsMin) kbpsMin = kbps
        if (kbps > kbpsMax) kbpsMax = kbps
        off += frameLen
      } else if (b(off) == 'T' && off + 128 == b.length &&
          b(off + 1) == 'A' && b(off + 2) == 'G') {
        off = b.length // trailing ID3v1 tag
      } else return None
    }
    if (nFrames == 0 || off != b.length) None
    else Some(Mp3Meta(
      sampleRate,
      nFrames,
      nFrames * 1152L * 1000L / sampleRate,
      kbpsSum / nFrames,
      kbpsMin != kbpsMax))
  }

  /** Build a structurally-valid MPEG-1 Layer III stream (fixture path —
    * headers are REAL, frame payloads are zeros, which is all the
    * metadata walk can see): optional ID3v2 tag of `id3v2Size` payload
    * bytes, one frame per `(bitrateIndex, padding)` spec, optional
    * trailing ID3v1 tag. Pins [[decodeMp3Meta]] by roundtrip the way
    * [[encodeWav]] pins the RIFF parser.
    */
  def encodeMp3(
      frames: Seq[(Int, Boolean)],
      srIndex: Int = 0,
      id3v2Size: Int = 0,
      id3v1: Boolean = false): Array[Byte] = {
    require(srIndex >= 0 && srIndex <= 2, "bad sample-rate index")
    val sr = Mp3SampleRates(srIndex)
    val lens = frames.map { case (brIdx, pad) =>
      require(brIdx >= 1 && brIdx <= 14, s"bad bitrate index $brIdx")
      144000 * Mp3BitrateKbps(brIdx) / sr + (if (pad) 1 else 0)
    }
    val head = if (id3v2Size > 0) 10 + id3v2Size else 0
    val tail = if (id3v1) 128 else 0
    val out = new Array[Byte](head + lens.sum + tail)
    if (id3v2Size > 0) {
      out(0) = 'I'; out(1) = 'D'; out(2) = '3'; out(3) = 4 // v2.4
      out(6) = ((id3v2Size >> 21) & 0x7f).toByte
      out(7) = ((id3v2Size >> 14) & 0x7f).toByte
      out(8) = ((id3v2Size >> 7) & 0x7f).toByte
      out(9) = (id3v2Size & 0x7f).toByte
    }
    var off = head
    frames.zip(lens).foreach { case ((brIdx, pad), len) =>
      out(off) = 0xff.toByte
      out(off + 1) = 0xfb.toByte
      out(off + 2) =
        ((brIdx << 4) | (srIndex << 2) | (if (pad) 2 else 0)).toByte
      out(off + 3) = 0xc0.toByte // single-channel mode
      off += len
    }
    if (id3v1) { out(off) = 'T'; out(off + 1) = 'A'; out(off + 2) = 'G' }
    out
  }

  def isPng(b: Array[Byte]): Boolean =
    b != null && b.length >= 8 &&
      (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'

  def isJpeg(b: Array[Byte]): Boolean =
    b != null && b.length >= 3 &&
      (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff

  /** Decode a compressed raster (JPEG/PNG — anything the JDK's ImageIO
    * registry reads) to the common [[PpmImage]] shape. `getRGB` hands
    * back packed sRGB ints regardless of the file's internal layout
    * (palette, grayscale, BGR, alpha), so channel order is normalized
    * here once; alpha is dropped. Returns None on undecodable bytes —
    * same defensive contract as the hand-rolled parsers.
    */
  def decodeImageIO(b: Array[Byte]): Option[PpmImage] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        val rgb = new Array[Byte](w * h * 3)
        var i = 0
        while (i < w * h) {
          val p = px(i)
          rgb(i * 3) = ((p >> 16) & 0xff).toByte
          rgb(i * 3 + 1) = ((p >> 8) & 0xff).toByte
          rgb(i * 3 + 2) = (p & 0xff).toByte
          i += 1
        }
        Some(PpmImage(w, h, 255, rgb))
      }
    } catch { case _: Exception => None }

  /** [[decodeImageIO]] with the reader HOISTED out of the row loop —
    * the production spelling for per-row decode at corpus scale:
    * `ImageIO.read` re-resolves a reader from the SPI registry and
    * allocates a fresh reader + input stream per call, which is pure
    * fixed cost when a partition decodes millions of same-format
    * payloads (q151's per-doc roundtrip spent ~half its time there).
    * A thread-local reader per format (PNG/JPEG by magic bytes) is
    * reused across calls; anything else — unknown magic, reader
    * failure — falls back to the general [[decodeImageIO]] path, so
    * the contract (None on undecodable bytes, normalized RGB) is
    * identical, spec-pinned bit-equal.
    */
  def decodeImageIOReused(b: Array[Byte]): Option[PpmImage] = {
    val fmt =
      if (isPng(b)) "png"
      else if (isJpeg(b)) "jpeg"
      else return decodeImageIO(b)
    val cache = readerCache.get()
    try {
      val reader = cache.getOrElseUpdate(fmt, {
        val it = javax.imageio.ImageIO.getImageReadersByFormatName(fmt)
        if (!it.hasNext) return decodeImageIO(b)
        it.next()
      })
      // MemoryCacheImageInputStream, NOT ImageIO.createImageInputStream:
      // the factory honors ImageIO.getUseCache() (JDK default true) and
      // backs every call with a fresh TEMP FILE — one file create+write+
      // delete per decoded row, serialized on the filesystem across a
      // 32-thread local run. The payload is already a byte array in
      // memory; the disk cache buys nothing and the direct
      // memory-backed stream is bit-identical (r16 A/B: q151's decode
      // stage is where the per-row fixed cost sat).
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(b))
      try {
        reader.setInput(iis, true, true)
        val img = reader.read(0)
        if (img == null) None else Some(normalizeRgb(img))
      } finally {
        // detach the stream before closing it: a cached reader must
        // never sit on a CLOSED input between calls (r14 ADVICE — the
        // dangling reference also pins the stream's buffers for the
        // executor thread's lifetime)
        try reader.setInput(null) catch { case _: Exception => () }
        iis.close()
      }
    } catch {
      case _: Exception =>
        // a reader that threw mid-read may be in an undefined state:
        // dispose + evict so the NEXT call on this thread rebuilds a
        // fresh one instead of permanently degrading to the fallback
        cache.remove(fmt).foreach { r =>
          try r.dispose() catch { case _: Exception => () }
        }
        decodeImageIO(b)
    }
  }

  private val readerCache =
    new ThreadLocal[scala.collection.mutable.HashMap[String, javax.imageio.ImageReader]] {
      override def initialValue() =
        scala.collection.mutable.HashMap.empty[String, javax.imageio.ImageReader]
    }

  private def normalizeRgb(img: java.awt.image.BufferedImage): PpmImage = {
    val w = img.getWidth
    val h = img.getHeight
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    val rgb = new Array[Byte](w * h * 3)
    var i = 0
    while (i < w * h) {
      val p = px(i)
      rgb(i * 3) = ((p >> 16) & 0xff).toByte
      rgb(i * 3 + 1) = ((p >> 8) & 0xff).toByte
      rgb(i * 3 + 2) = (p & 0xff).toByte
      i += 1
    }
    PpmImage(w, h, 255, rgb)
  }

  private def toBufferedImage(
      width: Int, height: Int, rgb: Array[Byte]): java.awt.image.BufferedImage = {
    require(rgb.length == width * height * 3, "rgb length must be w*h*3")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < width * height) {
      val p = ((rgb(i * 3) & 0xff) << 16) |
        ((rgb(i * 3 + 1) & 0xff) << 8) | (rgb(i * 3 + 2) & 0xff)
      img.setRGB(i % width, i / width, p)
      i += 1
    }
    img
  }

  /** Encode RGB triplets as a real PNG via ImageIO (lossless, so
    * encode→decode is pixel-exact — the property q125's oracle pins).
    */
  def encodePng(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(toBufferedImage(width, height, rgb), "png", bos)
    bos.toByteArray
  }

  /** Encode RGB triplets as a real JPEG via ImageIO (lossy — roundtrip
    * is approximate; pinned by tolerance spec, not by oracle hash).
    */
  def encodeJpeg(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(toBufferedImage(width, height, rgb), "jpg", bos)
    bos.toByteArray
  }

  /** Real audio features from a decoded WAV, laid out as
    * [rms, zero-crossing rate, mean, peak, band energies...]: the first
    * 4 slots are time-domain statistics over [-1,1]-normalized samples;
    * the remaining `dim-4` slots are Goertzel band magnitudes at evenly
    * spaced frequencies in (0, sr/2), each normalized by sample count.
    */
  def wavFeatures(a: WavAudio, dim: Int): Array[Float] = {
    val n = a.samples.length
    val f = new Array[Float](dim)
    if (n == 0) return f
    var sum = 0.0; var sumSq = 0.0; var peak = 0.0; var zc = 0
    var i = 0
    while (i < n) {
      val v = a.samples(i) / 32768.0
      sum += v; sumSq += v * v
      if (math.abs(v) > peak) peak = math.abs(v)
      if (i > 0 && a.samples(i - 1).toLong * a.samples(i) < 0) zc += 1
      i += 1
    }
    f(0) = math.sqrt(sumSq / n).toFloat
    f(1) = zc.toFloat / n
    f(2) = (sum / n).toFloat
    f(3) = peak.toFloat
    val bands = dim - 4
    var k = 0
    while (k < bands) {
      // Goertzel at freq (k+1)/(bands+1) * Nyquist
      val w = math.Pi * (k + 1).toDouble / (bands + 1)
      val coeff = 2.0 * math.cos(w)
      var s0 = 0.0; var s1 = 0.0; var s2 = 0.0
      var j = 0
      while (j < n) {
        s0 = a.samples(j) / 32768.0 + coeff * s1 - s2
        s2 = s1; s1 = s0
        j += 1
      }
      val power = s1 * s1 + s2 * s2 - coeff * s1 * s2
      f(4 + k) = (math.sqrt(math.max(power, 0.0)) / n).toFloat
      k += 1
    }
    f
  }

  /** Real image features from a decoded PPM, laid out as
    * [meanR, meanG, meanB, stddev(luma), luma histogram...]: channel
    * means normalized by maxVal, then a `dim-4`-bin luminance histogram
    * (Rec.601 luma), each bin a pixel fraction.
    */
  def ppmFeatures(img: PpmImage, dim: Int): Array[Float] = {
    val f = new Array[Float](dim)
    val nPx = img.width * img.height
    if (nPx == 0) return f
    val bins = dim - 4
    val hist = new Array[Int](math.max(bins, 1))
    var sr = 0L; var sg = 0L; var sb = 0L
    var lumSum = 0.0; var lumSumSq = 0.0
    var i = 0
    while (i < nPx) {
      val r = img.rgb(i * 3) & 0xff
      val g = img.rgb(i * 3 + 1) & 0xff
      val b = img.rgb(i * 3 + 2) & 0xff
      sr += r; sg += g; sb += b
      val lum = (0.299 * r + 0.587 * g + 0.114 * b) / img.maxVal
      lumSum += lum; lumSumSq += lum * lum
      if (bins > 0) {
        val bin = math.min((lum * bins).toInt, bins - 1)
        hist(bin) += 1
      }
      i += 1
    }
    f(0) = (sr.toDouble / nPx / img.maxVal).toFloat
    f(1) = (sg.toDouble / nPx / img.maxVal).toFloat
    f(2) = (sb.toDouble / nPx / img.maxVal).toFloat
    val meanLum = lumSum / nPx
    f(3) = math.sqrt(math.max(lumSumSq / nPx - meanLum * meanLum, 0.0)).toFloat
    var k = 0
    while (k < bins) { f(4 + k) = hist(k).toFloat / nPx; k += 1 }
    f
  }
}
