package graft.operators

import java.io.ByteArrayInputStream

/** Pure-JVM media decoding for multimodal binary columns — no external
  * codec libraries: images through the JDK's own `javax.imageio`
  * (PNG/JPEG/BMP/GIF readers ship with the JRE), WAV through a direct
  * RIFF/PCM parse. This replaces the former deterministic decode stub
  * for these formats; unrecognized payloads still flow through the
  * byte-level fallback so the pipeline never fails on foreign bytes.
  *
  * Everything here runs executor-side inside `mapPartitions` — one
  * decode per row, no driver involvement (see [[Multimodal]]).
  */
object MediaCodec {

  sealed trait Decoded
  /** Image: dimensions + per-channel means + mean luminance (0-255). */
  final case class ImageStats(width: Int, height: Int,
      meanR: Double, meanG: Double, meanB: Double, luma: Double) extends Decoded
  /** PCM audio: shape + RMS/peak (normalized) + zero-crossing rate. */
  final case class AudioStats(sampleRate: Int, channels: Int, nSamples: Int,
      rms: Double, peak: Double, zeroCrossRate: Double) extends Decoded

  /** Container sniffing by magic bytes. */
  def sniff(bytes: Array[Byte]): String =
    if (bytes == null || bytes.length < 12) "unknown"
    else if (bytes(0) == 'B' && bytes(1) == 'M') "bmp"
    else if ((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' &&
      bytes(3) == 'G') "png"
    else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) "jpeg"
    else if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F') "gif"
    else if (bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' &&
      bytes(10) == 'V' && bytes(11) == 'E') "wav"
    else "unknown"

  /** Decode an image payload (any ImageIO-supported container) to
    * channel statistics. */
  def decodeImage(bytes: Array[Byte]): Option[ImageStats] =
    try {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        var (sr, sg, sb) = (0.0, 0.0, 0.0)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xff
            sg += (rgb >> 8) & 0xff
            sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h).toDouble
        val (mr, mg, mb) = (sr / n, sg / n, sb / n)
        Some(ImageStats(w, h, mr, mg, mb,
          0.299 * mr + 0.587 * mg + 0.114 * mb))
      }
    } catch { case _: Throwable => None }

  /** 64-bit difference hash (dHash) — the standard perceptual near-dup
    * key for image pipelines: downscale to 9×8 grayscale (bilinear),
    * bit (y·8 + x) set iff gray(x,y) < gray(x+1,y). Identical under
    * uniform brightness shifts and resizes (the adjacent-difference
    * SIGNS survive both); similarity = Hamming distance of the longs. */
  def dHash(bytes: Array[Byte]): Option[Long] =
    try {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val small = new java.awt.image.BufferedImage(9, 8,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = small.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, 9, 8, null)
        g.dispose()
        def gray(x: Int, y: Int): Double = {
          val rgb = small.getRGB(x, y)
          0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
            0.114 * (rgb & 0xff)
        }
        var h = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            if (gray(x, y) < gray(x + 1, y)) h |= 1L << (y * 8 + x)
            x += 1
          }
          y += 1
        }
        Some(h)
      }
    } catch { case _: Throwable => None }

  /** Decode a RIFF/WAVE PCM-16LE payload to sample statistics (direct
    * header parse; chunk-walk to `fmt ` and `data`). */
  def decodeWav(bytes: Array[Byte]): Option[AudioStats] =
    try {
      if (sniff(bytes) != "wav") return None
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var pos = 12 // past RIFF size WAVE
      var sampleRate = 0
      var channels = 0
      var bits = 0
      var dataOff = -1
      var dataLen = 0
      while (pos + 8 <= bytes.length && (dataOff < 0 || sampleRate == 0)) {
        val id = new String(bytes, pos, 4, "US-ASCII")
        val sz = bb.getInt(pos + 4)
        id match {
          case "fmt " =>
            channels = bb.getShort(pos + 10).toInt
            sampleRate = bb.getInt(pos + 12)
            bits = bb.getShort(pos + 22).toInt
          case "data" =>
            dataOff = pos + 8
            dataLen = math.max(0, math.min(sz, bytes.length - dataOff))
          case _ =>
        }
        // Hostile/corrupt chunk sizes (negative, or so large the cursor
        // stops advancing) must terminate the walk, not spin the executor.
        if (sz < 0) pos = bytes.length
        else pos += 8 + sz + (sz & 1)
      }
      if (dataOff < 0 || sampleRate == 0 || bits != 16 || channels < 1) None
      else {
        val n = dataLen / 2
        var sumSq = 0.0
        var peak = 0.0
        var crossings = 0L
        var prevNeg = false
        var i = 0
        while (i < n) {
          val s = bb.getShort(dataOff + 2 * i) / 32768.0
          sumSq += s * s
          val a = math.abs(s)
          if (a > peak) peak = a
          val neg = s < 0
          if (i > 0 && neg != prevNeg) crossings += 1
          prevNeg = neg
          i += 1
        }
        Some(AudioStats(sampleRate, channels, n / channels,
          math.sqrt(sumSq / math.max(1, n)), peak,
          crossings.toDouble / math.max(1, n - 1)))
      }
    } catch { case _: Throwable => None }

  /** 64-bit audio fingerprint — the dHash idea in the time-frequency-
    * free form buildable without an FFT: split the PCM stream into 65
    * equal frames, bit i set iff energy(frame i) < energy(frame i+1).
    * Exactly invariant under uniform gain (energies scale by g², the
    * comparison signs survive) — the audio analog of dHash's
    * brightness invariance. Pairs via [[graft.operators.Dedup
    * .fingerprintPairs]]. */
  def audioFingerprint(bytes: Array[Byte]): Option[Long] =
    try {
      if (sniff(bytes) != "wav") return None
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var pos = 12
      var dataOff = -1
      var dataLen = 0
      while (pos + 8 <= bytes.length && dataOff < 0) {
        val id = new String(bytes, pos, 4, "US-ASCII")
        val sz = bb.getInt(pos + 4)
        if (id == "data") {
          dataOff = pos + 8
          dataLen = math.max(0, math.min(sz, bytes.length - dataOff))
        }
        if (sz < 0) pos = bytes.length
        else pos += 8 + sz + (sz & 1)
      }
      val n = dataLen / 2
      if (dataOff < 0 || n < 65) None
      else {
        val frames = 65
        val energies = new Array[Double](frames)
        var i = 0
        while (i < n) {
          val s = bb.getShort(dataOff + 2 * i).toDouble
          energies(i * frames / n) += s * s
          i += 1
        }
        var h = 0L
        var f = 0
        while (f < 64) {
          if (energies(f) < energies(f + 1)) h |= 1L << f
          f += 1
        }
        Some(h)
      }
    } catch { case _: Throwable => None }

  /** Real image resize via the JDK raster pipeline; re-encoded as PNG. */
  def resizeImage(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    try {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val out = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        Some(bos.toByteArray)
      }
    } catch { case _: Throwable => None }

  /** Minimal 24-bit uncompressed BMP encoder for a solid-color tile —
    * used by tests and oracle queries to manufacture deterministic real
    * image payloads from table data. */
  def solidBmp(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val rowSize = (w * 3 + 3) / 4 * 4
    val dataSize = rowSize * h
    val bb = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
    bb.putInt(54 + dataSize).putInt(0).putInt(54)
    bb.putInt(40).putInt(w).putInt(h)
    bb.putShort(1).putShort(24)
    bb.putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        bb.put(b.toByte).put(g.toByte).put(r.toByte)
        x += 1
      }
      var pad = rowSize - w * 3
      while (pad > 0) { bb.put(0.toByte); pad -= 1 }
      y += 1
    }
    bb.array()
  }

  /** Minimal PCM-16LE mono WAV encoder (tests/oracles). */
  def pcm16Wav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * 2).putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }
}
