package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for the interleaved-doc
  * table: media rides as opaque `binary` payloads + typed metadata, and
  * decode/feature steps run as typed batch transforms over
  * `Dataset[MediaBatch]` rows (the Scala analog of `mapInPandas` batches).
  *
  * Image decode is REAL for the formats the JDK ships codecs for
  * (PNG/BMP/GIF/JPEG via `javax.imageio` — no external dependency), the
  * way the GDAL PNG/BMP drivers are always-available built-ins
  * (frmts/png/pngdataset.cpp). Payloads ImageIO cannot read (audio/video/
  * exotic codecs, which this container has no libraries for) fall back to
  * `decodeStub`, a deterministic fake, so the Spark-side plumbing —
  * schema, batch shape, partitioning, join-back — always runs end-to-end.
  * Reference analog: GDAL treats raster payloads as opaque blocks behind a
  * driver boundary (gcore/gdal_rasterband.h:247); the driver is the
  * swappable codec. */
object Multimodal {

  javax.imageio.ImageIO.setUseCache(false) // never spill decode to tmp files

  case class MediaRow(doc_id: Long, media_ref: String, kind: String,
                      payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, media_ref: String, kind: String,
                           n_bytes: Int, width: Int, height: Int,
                           features: Array[Float])

  /** Deterministic fake decode: "dimensions" from a rolling hash of the
    * payload, feature vector = normalized byte histogram (16 bins). A real
    * deployment swaps this for an actual codec; everything downstream
    * (schema, partitioning, joins) is unchanged. */
  def decodeStub(r: MediaRow): MediaFeatures = {
    var h = 1125899906842597L
    var i = 0
    while (i < r.payload.length) { h = 31 * h + (r.payload(i) & 0xff); i += 1 }
    val w = 16 + ((h & 0x7fffffff) % 1024).toInt
    val hgt = 16 + (((h >>> 32) & 0x7fffffff) % 1024).toInt
    val bins = new Array[Float](16)
    i = 0
    while (i < r.payload.length) { bins((r.payload(i) & 0xff) >> 4) += 1f; i += 1 }
    val n = math.max(1, r.payload.length).toFloat
    var j = 0
    while (j < 16) { bins(j) /= n; j += 1 }
    MediaFeatures(r.doc_id, r.media_ref, r.kind, r.payload.length, w, hgt, bins)
  }

  case class AudioStats(sampleRate: Int, channels: Int, nSamples: Int,
                        peak: Int, sumSq: Long, zeroCross: Int)

  /** Canonical 16-bit PCM WAV encode: the fixed 44-byte RIFF/WAVE/fmt/data
    * header + little-endian samples — the audio twin of [[grayPng]] for
    * exercising opaque-binary plumbing with a REAL container format. */
  def pcmWav(samples: Array[Short], sampleRate: Int, channels: Int = 1): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Parse a 16-bit PCM WAV payload and compute per-clip statistics in one
    * pass: peak |s|, exact Σs² (the integer RMS base), and zero crossings
    * (sign change with sign(0) treated as non-negative). Malformed headers
    * refuse loudly — an opaque payload that LOOKS like audio but is not
    * must never silently produce stats. */
  def wavStats(bytes: Array[Byte]): AudioStats = {
    require(bytes.length >= 44, s"WAV too short: ${bytes.length} bytes")
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int, want: String): Unit = {
      val got = new String(bytes, off, 4, "US-ASCII")
      require(got == want, s"bad WAV tag at $off: '$got' (want '$want')")
    }
    tag(0, "RIFF"); tag(8, "WAVE"); tag(12, "fmt "); tag(36, "data")
    val fmt = bb.getShort(20)
    require(fmt == 1, s"not PCM: format $fmt")
    val channels = bb.getShort(22).toInt
    val sampleRate = bb.getInt(24)
    val bps = bb.getShort(34)
    require(bps == 16, s"only 16-bit PCM supported: $bps")
    val dataLen = bb.getInt(40)
    // negative length would pass the truncation check via wrap-around and
    // silently return nonsense stats — refuse loudly like every other
    // malformed-container branch here
    require(dataLen >= 0, s"negative data chunk length $dataLen")
    require(44 + dataLen <= bytes.length, "truncated data chunk")
    val n = dataLen / 2
    var peak = 0; var sumSq = 0L; var zc = 0
    var prev = 0; var i = 0
    while (i < n) {
      val s = bb.getShort(44 + 2 * i).toInt
      val a = math.abs(s)
      if (a > peak) peak = a
      sumSq += s.toLong * s.toLong
      if (i > 0 && ((prev < 0 && s >= 0) || (prev >= 0 && s < 0))) zc += 1
      prev = s
      i += 1
    }
    AudioStats(sampleRate, channels, n, peak, sumSq, zc)
  }

  /** Pack image frames into one opaque video-like payload: a minimal
    * indexed container (magic, frame count, per-frame offsets, blobs) —
    * the moral equivalent of an MJPEG/fragmented-MP4 sample table, enough
    * to exercise REAL video plumbing: an index parse that reaches the
    * k-th frame without touching the others. */
  def packFrames(frames: Seq[Array[Byte]]): Array[Byte] = {
    val headerLen = 8 + 8 * frames.length
    val total = headerLen + frames.map(_.length).sum
    val bb = java.nio.ByteBuffer.allocate(total).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("GFV1".getBytes("US-ASCII")).putInt(frames.length)
    var off = headerLen
    for (f <- frames) { bb.putLong(off.toLong); off += f.length }
    frames.foreach(bb.put)
    bb.array()
  }

  /** Frame-sample a packed payload: parse the index, slice out every
    * `step`-th frame (offset arithmetic only — unsampled frames are never
    * copied or decoded). Refuses loudly on a bad container. */
  def sampleFrames(bytes: Array[Byte], step: Int): Seq[(Int, Array[Byte])] = {
    require(step >= 1, s"step $step")
    require(bytes.length >= 8 &&
      new String(bytes, 0, 4, "US-ASCII") == "GFV1", "not a GFV1 container")
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val n = bb.getInt(4)
    require(n >= 0 && 8 + 8L * n <= bytes.length, s"bad frame count $n")
    def offAt(i: Int): Long =
      if (i == n) bytes.length.toLong else bb.getLong(8 + 8 * i)
    (0 until n by step).map { i =>
      val a = offAt(i); val b = offAt(i + 1)
      require(a >= 8 + 8L * n && b <= bytes.length && a <= b, s"bad offsets for frame $i")
      (i, java.util.Arrays.copyOfRange(bytes, a.toInt, b.toInt))
    }
  }

  /** Real image decode: JDK ImageIO for PNG/BMP/GIF/JPEG; anything it
    * cannot read falls back to [[decodeStub]]. Features = 16-bin luminance
    * histogram normalized by pixel count; width/height are the decoded
    * dimensions. Single-band (grayscale) rasters are sampled directly —
    * `getRGB` would run the gray→sRGB color-space curve and destroy
    * sample exactness — multi-band images use integer BT.601 luminance
    * ((299R+587G+114B)/1000, exact for R=G=B). */
  def decode(r: MediaRow): MediaFeatures = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      catch { case _: Exception => null }
    if (img == null) decodeStub(r)
    else {
      val w = img.getWidth; val h = img.getHeight
      val bins = new Array[Float](16)
      val raster = img.getRaster
      val gray = raster.getNumBands == 1
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val lum =
            if (gray) raster.getSample(x, y, 0) & 0xff
            else {
              val rgb = img.getRGB(x, y)
              (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                (rgb & 0xff) * 114) / 1000
            }
          bins(lum >> 4) += 1f
          x += 1
        }
        y += 1
      }
      val n = math.max(1, w * h).toFloat
      var j = 0
      while (j < 16) { bins(j) /= n; j += 1 }
      MediaFeatures(r.doc_id, r.media_ref, r.kind, r.payload.length, w, h, bins)
    }
  }

  /** Deterministic grayscale PNG fixture encoder (the m03 gate and specs
    * build payloads with it; 8-bit gray PNG round-trips samples exactly). */
  def grayPng(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, f(x, y) & 0xff); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Gray-8 encode in any ImageIO-supported format ("png", "jpeg", "webp"
    * where a writer plugin exists — `gdal raster tile --format` analog).
    * Throws with the available-writers list when the JRE has no encoder
    * for the requested format, never silently substitutes. */
  def grayEncode(format: String, w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
    if (format.equalsIgnoreCase("png")) return grayPng(w, h)(f)
    val fmt = if (format.equalsIgnoreCase("jpg")) "jpeg" else format.toLowerCase
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, f(x, y) & 0xff); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    if (!javax.imageio.ImageIO.write(img, fmt, bos)) {
      val have = javax.imageio.ImageIO.getWriterFormatNames.map(_.toLowerCase)
        .distinct.sorted.mkString(", ")
      throw new IllegalArgumentException(
        s"no ImageIO writer for format '$fmt' (available: $have)")
    }
    bos.toByteArray
  }

  /** 64-bit average-hash (aHash) of a decoded image — the classic
    * perceptual fingerprint for image near-dup detection (the multimodal
    * twin of SimHash): the image is reduced to an 8×8 block grid (pixel
    * (x,y) belongs to block (x·8 div w, y·8 div h)), and bit (by·8+bx) is set iff
    * the block's pixel sum exceeds the global mean on that block's pixel
    * count (exact integer cross-multiplication bs·(w·h) > total·bn — no
    * division, engine-replayable). Luminance sampling matches [[decode]]
    * (raw gray samples for single-band images, integer BT.601 otherwise).
    * Returns [lo, hi]: bits 0..31 and 32..63 as non-negative longs, so
    * banding/hamming arithmetic never touches the sign bit. Throws on
    * undecodable payloads (refuse-loudly, as grayEncode does). */
  def aHashParts(payload: Array[Byte]): Array[Long] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, "aHashParts: payload is not a decodable image")
    val w = img.getWidth; val h = img.getHeight
    val raster = img.getRaster
    val gray = raster.getNumBands == 1
    val bs = new Array[Long](64)
    val bn = new Array[Long](64)
    var total = 0L
    var y = 0
    while (y < h) {
      val by = y * 8 / h
      var x = 0
      while (x < w) {
        val bx = x * 8 / w
        val lum =
          if (gray) raster.getSample(x, y, 0) & 0xff
          else {
            val rgb = img.getRGB(x, y)
            (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000
          }
        val b = by * 8 + bx
        bs(b) += lum; bn(b) += 1; total += lum
        x += 1
      }
      y += 1
    }
    val npix = w.toLong * h
    var lo = 0L; var hi = 0L
    var b = 0
    while (b < 64) {
      if (bs(b) * npix > total * bn(b)) {
        if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
      }
      b += 1
    }
    Array(lo, hi)
  }

  /** media table (doc_id, media_ref, kind, payload:binary) → features.
    * Runs as a typed map — one narrow stage, codegen-friendly schema on
    * both sides, no driver collect. Partitioning of the input is
    * preserved (repartition upstream by doc_id for joins back to docs). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.map(decode)
  }

  /** Batch-shaped variant: mapPartitions so a real codec can amortize
    * per-batch setup (model load, JNI init) across rows — the Scala
    * equivalent of a Pandas-UDF batch. */
  def extractFeaturesBatched(media: Dataset[MediaRow], batchSetup: () => Unit = () => ())
      : Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      batchSetup()
      rows.map(decode)
    }
  }
}
