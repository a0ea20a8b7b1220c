package graft.multimodal

/** Pure-JVM container parsers for the formats that need no codec
  * library: WAV (RIFF) and BMP. These make [[Multimodal.MediaDecoder.real]]
  * honest for real bytes — header math, PCM/pixel access, and
  * re-containerized audio slices — while formats that genuinely need
  * codecs keep a loud unsupported error.
  *
  * Format references are the public specs: RIFF/WAVE chunk layout
  * (little-endian id/size pairs, word-aligned), BITMAPFILEHEADER +
  * BITMAPINFOHEADER with 4-byte-padded bottom-up pixel rows.
  */
object PureJvmMedia {

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  final case class WavInfo(
      sampleRate: Int,
      channels: Int,
      bitsPerSample: Int,
      dataOffset: Int,
      dataLen: Int,
  ) {
    def blockAlign: Int = channels * (bitsPerSample / 8)
    def frames: Int = if (blockAlign == 0) 0 else dataLen / blockAlign
  }

  /** Walk the RIFF chunk list for `fmt ` and `data`. Tolerates extra
    * chunks (LIST, fact, ...) and a declared data size overrunning the
    * actual payload (truncated file → truncated data).
    */
  def parseWav(bytes: Array[Byte]): WavInfo = {
    require(bytes.length >= 44 && tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WAVE",
      s"not a RIFF/WAVE payload (${bytes.length} bytes)")
    var o = 12
    var fmt: Option[(Int, Int, Int)] = None // (sampleRate, channels, bits)
    var data: Option[(Int, Int)] = None // (offset, len)
    while (o + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(bytes, o)
      val size = le32(bytes, o + 4)
      require(size >= 0, s"negative chunk size in '$id'")
      if (id == "fmt ") {
        require(size >= 16 && o + 8 + 16 <= bytes.length, "fmt chunk too short")
        val audioFormat = le16(bytes, o + 8)
        require(audioFormat == 1 || audioFormat == 0xfffe, // PCM / extensible-PCM
          s"only PCM wav is supported, got format tag $audioFormat")
        fmt = Some((le32(bytes, o + 12), le16(bytes, o + 10), le16(bytes, o + 22)))
      } else if (id == "data") {
        data = Some((o + 8, math.min(size, bytes.length - o - 8)))
      }
      o += 8 + size + (size & 1) // chunks are word-aligned
    }
    (fmt, data) match {
      case (Some((sr, ch, bits)), Some((off, len))) =>
        require(sr > 0 && ch > 0, s"bad fmt: sampleRate=$sr channels=$ch")
        require(bits == 8 || bits == 16, s"only 8/16-bit PCM supported, got $bits")
        WavInfo(sr, ch, bits, off, len)
      case _ => throw new IllegalArgumentException("wav missing fmt or data chunk")
    }
  }

  /** PCM sample at frame f, channel-averaged, normalized to [-1, 1]. */
  private def sampleAt(bytes: Array[Byte], w: WavInfo, f: Int): Double = {
    val base = w.dataOffset + f * w.blockAlign
    var acc = 0.0
    var c = 0
    while (c < w.channels) {
      val o = base + c * (w.bitsPerSample / 8)
      acc += (if (w.bitsPerSample == 16) (le16(bytes, o).toShort).toDouble / 32768.0
              else ((bytes(o) & 0xff) - 128).toDouble / 128.0)
      c += 1
    }
    acc / w.channels
  }

  /** Block-pooled mean amplitude per embedding slot: dim blocks over the
    * frame range, each the mean of its samples. Identical PCM content ⇒
    * identical embedding (the property media near-dup needs); silence
    * pools to zeros.
    */
  def wavEmbedding(bytes: Array[Byte], w: WavInfo, dim: Int): Array[Float] = {
    val n = w.frames
    Array.tabulate(dim) { i =>
      val lo = (n.toLong * i / dim).toInt
      val hi = math.max(lo + 1, (n.toLong * (i + 1) / dim).toInt)
      if (lo >= n) 0f
      else {
        var acc = 0.0
        var f = lo
        val end = math.min(hi, n)
        while (f < end) { acc += sampleAt(bytes, w, f); f += 1 }
        (acc / (end - lo)).toFloat
      }
    }
  }

  /** Re-containerize the [startMs, endMs) PCM frame range as a
    * standalone 44-byte-header WAV — chunk rows stay valid WAV payloads
    * so downstream stages (and this parser) read them unchanged.
    */
  def sliceWav(bytes: Array[Byte], startMs: Int, endMs: Int): Array[Byte] = {
    val w = parseWav(bytes)
    val f0 = math.min(w.frames, (startMs.toLong * w.sampleRate / 1000L).toInt)
    val f1 = math.min(w.frames, (endMs.toLong * w.sampleRate / 1000L).toInt)
    val len = math.max(0, f1 - f0) * w.blockAlign
    val out = new java.io.ByteArrayOutputStream(44 + len)
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
    def ascii(s: String): Unit = out.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    ascii("RIFF"); w32(36 + len); ascii("WAVE")
    ascii("fmt "); w32(16); w16(1); w16(w.channels); w32(w.sampleRate)
    w32(w.sampleRate * w.blockAlign); w16(w.blockAlign); w16(w.bitsPerSample)
    ascii("data"); w32(len)
    out.write(bytes, w.dataOffset + f0 * w.blockAlign, len)
    out.toByteArray
  }

  final case class BmpInfo(
      width: Int,
      height: Int, // absolute; negative source height = top-down rows
      topDown: Boolean,
      bitsPerPixel: Int,
      pixelOffset: Int,
  ) {
    def rowStride: Int = ((width * bitsPerPixel + 31) / 32) * 4 // rows pad to 4 bytes
  }

  /** BITMAPFILEHEADER ("BM") + BITMAPINFOHEADER; uncompressed 8/24/32
    * bpp (BI_RGB) only — that is what "no codec needed" means for BMP.
    */
  def parseBmp(bytes: Array[Byte]): BmpInfo = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      s"not a BMP payload (${bytes.length} bytes)")
    val pixelOffset = le32(bytes, 10)
    val headerSize = le32(bytes, 14)
    require(headerSize >= 40, s"BITMAPINFOHEADER required, got header size $headerSize")
    val width = le32(bytes, 18)
    val rawH = le32(bytes, 22)
    val bpp = le16(bytes, 28)
    val compression = le32(bytes, 30)
    require(compression == 0, s"only uncompressed BI_RGB supported, got compression $compression")
    require(bpp == 8 || bpp == 24 || bpp == 32, s"only 8/24/32 bpp supported, got $bpp")
    require(width > 0 && rawH != 0, s"bad dimensions ${width}x$rawH")
    val info = BmpInfo(width, math.abs(rawH), rawH < 0, bpp, pixelOffset)
    require(pixelOffset + info.rowStride.toLong * info.height <= bytes.length,
      "pixel data truncated")
    info
  }

  /** Mean gray value of pixel (x, y) in TOP-DOWN coordinates,
    * normalized to [0, 1] — row order is normalized so the embedding is
    * a function of the image content, not the container's row
    * direction.
    */
  private def grayAt(bytes: Array[Byte], b: BmpInfo, x: Int, y: Int): Double = {
    val row = if (b.topDown) y else b.height - 1 - y
    val o = b.pixelOffset + row * b.rowStride + x * (b.bitsPerPixel / 8)
    b.bitsPerPixel match {
      case 8 => (bytes(o) & 0xff) / 255.0
      case _ => // 24/32: BGR(A) — average the three color channels
        ((bytes(o) & 0xff) + (bytes(o + 1) & 0xff) + (bytes(o + 2) & 0xff)) / 3.0 / 255.0
    }
  }

  /** Block-pooled mean gray per embedding slot: the image is split into
    * `dim` horizontal bands in top-down order, each pooled to its mean
    * gray. Identical pixels ⇒ identical embedding.
    */
  def bmpEmbedding(bytes: Array[Byte], b: BmpInfo, dim: Int): Array[Float] = {
    Array.tabulate(dim) { i =>
      val y0 = i * b.height / dim
      val y1 = math.max(y0 + 1, (i + 1) * b.height / dim)
      if (y0 >= b.height) 0f
      else {
        var acc = 0.0
        var n = 0
        var y = y0
        while (y < math.min(y1, b.height)) {
          var x = 0
          while (x < b.width) { acc += grayAt(bytes, b, x, y); n += 1; x += 1 }
          y += 1
        }
        (acc / n).toFloat
      }
    }
  }

  /** 8×8 block-pooled mean gray grid in PURE INTEGER math, 0..255 per
    * cell: per block, cell = Σ(r+g+b) div (3·pixels) — no float
    * anywhere, so a LOSSLESS re-encode of the same pixels (PNG vs BMP)
    * yields the bit-identical grid, and the perceptual hashes built on
    * it ([[Multimodal.dhash56Of]]/[[Multimodal.ahash56Of]]) cannot
    * drift across containers. Top-down row order (content, not
    * container, defines the grid).
    */
  def grayGrid64(img: java.awt.image.BufferedImage): Array[Int] = {
    val w = img.getWidth
    val h = img.getHeight
    Array.tabulate(64) { j =>
      val (gx, gy) = (j % 8, j / 8)
      val x0 = gx * w / 8; val x1 = math.max(x0 + 1, (gx + 1) * w / 8)
      val y0 = gy * h / 8; val y1 = math.max(y0 + 1, (gy + 1) * h / 8)
      var acc = 0L; var n = 0L
      var y = y0
      while (y < math.min(y1, h)) {
        var x = x0
        while (x < math.min(x1, w)) {
          val rgb = img.getRGB(x, y)
          acc += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
          n += 1
          x += 1
        }
        y += 1
      }
      if (n == 0) 0 else (acc / (3L * n)).toInt
    }
  }

  /** [[grayGrid64]] from a parsed BMP — the SAME integer math over the
    * container's raw samples (BGR sums ≡ RGB sums), so PNG and BMP
    * encodings of identical pixels produce identical grids through
    * DIFFERENT decode paths (spec-pinned).
    */
  def grayGrid64Bmp(bytes: Array[Byte], b: BmpInfo): Array[Int] = {
    def channelSum(x: Int, y: Int): Long = {
      val row = if (b.topDown) y else b.height - 1 - y
      val o = b.pixelOffset + row * b.rowStride + x * (b.bitsPerPixel / 8)
      b.bitsPerPixel match {
        case 8 => 3L * (bytes(o) & 0xff)
        case _ => ((bytes(o) & 0xff) + (bytes(o + 1) & 0xff) + (bytes(o + 2) & 0xff)).toLong
      }
    }
    Array.tabulate(64) { j =>
      val (gx, gy) = (j % 8, j / 8)
      val x0 = gx * b.width / 8; val x1 = math.max(x0 + 1, (gx + 1) * b.width / 8)
      val y0 = gy * b.height / 8; val y1 = math.max(y0 + 1, (gy + 1) * b.height / 8)
      var acc = 0L; var n = 0L
      var y = y0
      while (y < math.min(y1, b.height)) {
        var x = x0
        while (x < math.min(x1, b.width)) { acc += channelSum(x, y); n += 1; x += 1 }
        y += 1
      }
      if (n == 0) 0 else (acc / (3L * n)).toInt
    }
  }

  /** Formats `javax.imageio` decodes out of the box — compressed raster
    * containers that previously hit the loud unsupported error. The JRE
    * ships the codecs (zero new deps).
    */
  val ImageIoFormats: Set[String] = Set("jpeg", "jpg", "png", "gif")

  /** Decode a compressed raster payload via the JRE's ImageIO. Throws
    * actionably when the bytes are not a decodable image (ImageIO
    * returns null rather than throwing).
    */
  def decodeImage(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, s"ImageIO could not decode payload (${bytes.length} bytes)")
    img
  }

  /** The SAME band-pooled mean-gray embedding as [[bmpEmbedding]],
    * computed from decoded pixels: per horizontal band, mean of
    * (r+g+b)/3/255 in top-down row order, identical per-pixel double
    * math — so a LOSSLESS re-encode of the same pixels (PNG vs BMP)
    * yields the bit-identical embedding, and the media near-dup
    * cascade links the two containers.
    */
  def imageEmbedding(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
    val w = img.getWidth
    val h = img.getHeight
    Array.tabulate(dim) { i =>
      val y0 = i * h / dim
      val y1 = math.max(y0 + 1, (i + 1) * h / dim)
      if (y0 >= h) 0f
      else {
        var acc = 0.0
        var n = 0
        var y = y0
        while (y < math.min(y1, h)) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            acc += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0 / 255.0
            n += 1
            x += 1
          }
          y += 1
        }
        (acc / n).toFloat
      }
    }
  }

  /** Real resize + re-encode for ImageIO formats: bilinear scale to the
    * bounded max dimension, re-encoded in the SAME container format.
    * Returns None when ImageIO has no writer for the format (caller
    * falls back to its stub).
    */
  def resizeEncode(format: String, bytes: Array[Byte], maxDim: Int): Option[(Int, Int, Array[Byte])] = {
    val fmt = format.toLowerCase
    if (!ImageIoFormats.contains(fmt)) return None
    val img = decodeImage(bytes)
    val (w, h) = (img.getWidth, img.getHeight)
    if (math.max(w, h) <= maxDim) return Some((w, h, bytes))
    val scale = maxDim.toDouble / math.max(w, h)
    val (nw, nh) = (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
    // TYPE_INT_RGB target: jpeg writers reject alpha, and the gray
    // embedding ignores it anyway
    val scaled = new java.awt.image.BufferedImage(nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = scaled.createGraphics()
    try {
      g.setRenderingHint(
        java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, nw, nh, null)
    } finally g.dispose()
    val out = new java.io.ByteArrayOutputStream()
    val writerFmt = if (fmt == "jpg") "jpeg" else fmt
    if (!javax.imageio.ImageIO.write(scaled, writerFmt, out)) return None
    Some((nw, nh, out.toByteArray))
  }
}
