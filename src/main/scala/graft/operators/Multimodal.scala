package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, and run feature
  * extraction as a partition-wise batch transform.
  *
  * Decoding is REAL for the pure-JVM formats ([[MediaCodec]]:
  * PNG/JPEG/BMP/GIF via the JDK's javax.imageio, RIFF/PCM WAV via a
  * direct parse); payloads in formats the JVM cannot decode natively
  * (e.g. compressed video) fall back to the deterministic byte-level
  * featurizer [[decodeStub]] so the pipeline never fails on foreign
  * bytes. Everything Spark-side is the production shape: the
  * (content, meta) schema, the mapPartitions batch shape (the Scala
  * analog of a Pandas-UDF-over-mapInPandas pipeline), and the
  * partitioning contract (payloads stay distributed; nothing is
  * collected to the driver).
  */
object Multimodal {

  /** Metadata carried with every binary payload. */
  val metaType: StructType = StructType(Seq(
    StructField("kind", StringType),      // image | audio | video | text
    StructField("mime", StringType),
    StructField("width", IntegerType),    // -1 when unknown / not decoded
    StructField("height", IntegerType)))

  /** Wrap a string/binary column into the canonical (content: binary,
    * meta: struct) multimodal shape. */
  def withBinary(df: DataFrame, sourceCol: String,
      kind: String = "text", mime: String = "text/plain"): DataFrame =
    df.withColumn("content", col(sourceCol).cast(BinaryType))
      .withColumn("meta", struct(
        lit(kind).as("kind"), lit(mime).as("mime"),
        lit(-1).as("width"), lit(-1).as("height")))

  /** Deterministic fake "decode": real decode would use an image/audio
    * codec here (unavailable in this container). The fake derives stable
    * pseudo-features from the bytes so downstream plumbing is testable.
    */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    if (bytes == null) return Array.empty
    val out = new Array[Float](8)
    var i = 0
    while (i < bytes.length) {
      out(i % 8) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Decode a payload to an 8-wide feature vector. Slot 0 is a format
    * tag (1 = image, 2 = audio, 0 = byte-level fallback):
    * image → [1, w, h, meanR, meanG, meanB, luma, 0];
    * audio → [2, sampleRate, channels, nSamples, rms, peak, zcr, 0];
    * unknown → [[decodeStub]] byte histogram folded to 8 floats. */
  def decodeFeatures(bytes: Array[Byte]): Array[Float] = {
    if (bytes == null) return Array.empty
    MediaCodec.sniff(bytes) match {
      case "bmp" | "png" | "jpeg" | "gif" =>
        MediaCodec.decodeImage(bytes) match {
          case Some(s) => Array(1f, s.width.toFloat, s.height.toFloat,
            s.meanR.toFloat, s.meanG.toFloat, s.meanB.toFloat,
            s.luma.toFloat, 0f)
          case None => decodeStub(bytes)
        }
      case "wav" =>
        MediaCodec.decodeWav(bytes) match {
          case Some(s) => Array(2f, s.sampleRate.toFloat, s.channels.toFloat,
            s.nSamples.toFloat, s.rms.toFloat, s.peak.toFloat,
            s.zeroCrossRate.toFloat, 0f)
          case None => decodeStub(bytes)
        }
      case _ => decodeStub(bytes)
    }
  }

  /** Partition-wise feature extraction over the binary column: the Scala
    * analog of mapInPandas — each partition is processed as a batch, the
    * decoder is instantiated once per partition (the expensive step for a
    * real codec), and rows stream through without driver involvement. */
  def extractFeatures(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("features", ArrayType(FloatType)),
      StructField("n_bytes", IntegerType)))
    val enc = Encoders.row(schema)
    df.select(col(idCol).cast(LongType).as("id"), col("content"))
      .mapPartitions { rows =>
        // per-partition decoder init would go here (real codec handle)
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("content")
          Row(r.getLong(0), decodeFeatures(bytes).toSeq,
            if (bytes == null) 0 else bytes.length)
        }
      }(enc)
  }

  /** Perceptual image hashes for the corpus: 64-bit dHash per image
    * (real decode via MediaCodec/javax.imageio — null for undecodable
    * bytes). Same mapPartitions batch shape as extractFeatures; the
    * hash is 8 bytes per image, so downstream near-dup joins
    * ([[Dedup.fingerprintPairs]]) never touch image bytes again. */
  def imageDHash(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("dhash", LongType, nullable = true)))
    val enc = Encoders.row(schema)
    df.select(col(idCol).cast(LongType).as("id"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("content")
          val h =
            if (bytes == null) None else MediaCodec.dHash(bytes)
          Row(r.getLong(0), h.map(java.lang.Long.valueOf).orNull)
        }
      }(enc)
  }

  /** Audio counterpart of [[imageDHash]]: 64-bit energy-difference
    * fingerprint per WAV payload (MediaCodec.audioFingerprint). */
  def audioFingerprints(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("afp", LongType, nullable = true)))
    val enc = Encoders.row(schema)
    df.select(col(idCol).cast(LongType).as("id"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("content")
          val h =
            if (bytes == null) None else MediaCodec.audioFingerprint(bytes)
          Row(r.getLong(0), h.map(java.lang.Long.valueOf).orNull)
        }
      }(enc)
  }

  /** Deterministic random PCM-16 WAV for a `base` id at an integer
    * `gain`: same base ⇒ exact fingerprint match (energy ratios are
    * gain-invariant), different bases ⇒ independent fingerprints. */
  def patternWav(base: Int, gain: Int): Array[Byte] = {
    val rnd = new java.util.Random(base.toLong * 1099511628211L)
    val samples = Array.tabulate(650)(_ =>
      ((rnd.nextInt(6001) - 3000) * gain).toShort)
    MediaCodec.pcm16Wav(8000, samples)
  }

  /** Length-prefixed frame container ("GFRV" magic + count + [len,
    * bytes] per frame). A stand-in for a video codec — the container
    * is trivial by design (no codec ships in this environment,
    * documented), but every FRAME is a real image that decodes through
    * javax.imageio. */
  def packFrames(frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(out)
    d.writeBytes("GFRV")
    d.writeInt(frames.size)
    frames.foreach { f => d.writeInt(f.length); d.write(f) }
    out.toByteArray
  }

  def unpackFrames(bytes: Array[Byte]): Seq[Array[Byte]] =
    try {
      if (bytes == null || bytes.length < 8 ||
        new String(bytes, 0, 4, "US-ASCII") != "GFRV") return Nil
      val d = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(bytes, 4, bytes.length - 4))
      val n = d.readInt()
      (0 until n).map { _ =>
        val len = d.readInt()
        val f = new Array[Byte](len)
        d.readFully(f)
        f
      }
    } catch { case _: Throwable => Nil }

  /** Video fingerprint: sample every `stride`-th frame, dHash each
    * (real per-frame decode), then fold temporally by BIT MAJORITY —
    * bit i of the video hash is set iff set in more than half the
    * sampled frame hashes. Inherits dHash's brightness invariance
    * frame-wise and tolerates frame drops/insertions that don't flip
    * a bit's majority. Pairs via [[Dedup.fingerprintPairs]]. */
  def videoFingerprints(df: DataFrame, idCol: String,
      stride: Int = 2): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("vfp", LongType, nullable = true)))
    val enc = Encoders.row(schema)
    df.select(col(idCol).cast(LongType).as("id"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val frames = unpackFrames(r.getAs[Array[Byte]]("content"))
          val hs = frames.zipWithIndex
            .collect { case (f, i) if i % stride == 0 => f }
            .flatMap(MediaCodec.dHash)
          val v: java.lang.Long =
            if (hs.isEmpty) null
            else {
              var h = 0L
              var bit = 0
              while (bit < 64) {
                val ones = hs.count(x => ((x >>> bit) & 1L) == 1L)
                if (ones * 2 > hs.size) h |= 1L << bit
                bit += 1
              }
              java.lang.Long.valueOf(h)
            }
          Row(r.getLong(0), v)
        }
      }(enc)
  }

  /** Deterministic 16×16 random-pattern BMP for a `base` id, shifted
    * uniformly by `brightness`: images sharing a base are exact
    * perceptual near-dups (dHash invariant under the shift), images of
    * different bases are random 64-bit-apart. Test/fixture generator
    * for the image-dedup path. */
  def patternBmp(base: Int, brightness: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rnd = new java.util.Random(base.toLong * 2654435761L)
    var y = 0
    while (y < 16) {
      var x = 0
      while (x < 16) {
        val v0 = rnd.nextInt(200)
        val v = math.min(255, v0 + brightness)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", out)
    out.toByteArray
  }

  /** Deterministic fake "resize": a real implementation would decode,
    * scale, and re-encode; the fake downsamples the byte stream so the
    * content transform + metadata update plumbing is testable. Output
    * size is proportional to target area — the property a real resize
    * also has. */
  def resizeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    if (bytes == null || bytes.isEmpty) return Array.empty
    val n = math.max(1, math.min(bytes.length, w * h / 64))
    val step = math.max(1, bytes.length / n)
    bytes.grouped(step).map(_.head).toArray
  }

  /** 1→1 batch transform: resize every payload to (w, h), updating the
    * meta struct — same mapPartitions batch shape as extractFeatures.
    * Image payloads go through the REAL raster pipeline
    * ([[MediaCodec.resizeImage]], re-encoded PNG); non-image payloads
    * fall back to the byte-downsampling stub. */
  def resize(df: DataFrame, idCol: String, w: Int, h: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("content", BinaryType),
      StructField("meta", metaType)))
    val enc = Encoders.row(schema)
    df.select(col(idCol).cast(LongType).as("id"), col("content"), col("meta"))
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("content")
          val meta = r.getStruct(2)
          val resized = MediaCodec.sniff(bytes) match {
            case "bmp" | "png" | "jpeg" | "gif" =>
              MediaCodec.resizeImage(bytes, w, h)
                .getOrElse(resizeStub(bytes, w, h))
            case _ => resizeStub(bytes, w, h)
          }
          val mime = if (MediaCodec.sniff(resized) == "png") "image/png"
            else meta.getString(1)
          Row(r.getLong(0), resized, Row(meta.getString(0), mime, w, h))
        }
      }(enc)
  }

  /** 1→N batch transform: sample every `stride`-th frame of a "video"
    * payload (fake frames = fixed-size byte windows; a real codec would
    * seek keyframes). The flatMap shape is the load-bearing part: frame
    * explosion happens executor-side, partition by partition, so a 10k×
    * row blow-up never converges on the driver — the shape a frame-
    * sampling training pipeline needs at 100 TB. */
  def frameSample(df: DataFrame, idCol: String,
      frameBytes: Int = 64, stride: Int = 4): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("frame", BinaryType)))
    val enc = Encoders.row(schema)
    df.select(col(idCol).cast(LongType).as("id"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val bytes = r.getAs[Array[Byte]]("content")
          if (bytes == null) Iterator.empty
          else bytes.grouped(frameBytes).zipWithIndex
            .filter(_._2 % stride == 0)
            .map { case (frame, i) => Row(r.getLong(0), i, frame) }
        }
      }(enc)
  }
}
