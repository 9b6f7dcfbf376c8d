package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.CrossHash._

/** Multimodal-column plumbing for a training-data pipeline: media payloads
  * travel as opaque `binary` columns with typed metadata structs; decode /
  * feature-extract / frame-sample run batch-wise over partitions.
  *
  * Two codec tiers live here:
  *
  *  - `media_decode` is a REAL image decode: per-doc PNG/BMP payloads are
  *    generated from integer pixel rules, encoded AND decoded through
  *    `javax.imageio` (JDK-only, no new dependencies), and the emitted
  *    width/height/pixel statistics are read from the DECODED raster.
  *    Both formats are lossless, so the decoded stats equal the
  *    closed-form pattern the DuckDB oracle recomputes independently —
  *    a green row proves the actual codec round-trip, not arithmetic.
  *
  *  - `media_audio_decode` / `media_audio_windows` are REAL audio decodes:
  *    per-doc 16-bit mono PCM clips round-trip through the JDK WAV codec
  *    (`javax.sound.sampled`), and the emitted waveform statistics are
  *    computed from the DECODED frames. PCM-in-WAV is lossless, so the
  *    oracle's closed-form per-sample replay pins the codec round-trip.
  *
  *  - `media_decode_jpeg` is the LOSSY tier: payloads round-trip through
  *    the JDK JPEG codec at a pinned quality. Pixel-exact replay is
  *    impossible by design, so the oracle declares what every conformant
  *    decoder agrees on — bitstream-exact SOF header fields plus
  *    per-channel mean-error BANDS (0 iff within `JpegTolLevels` of the
  *    closed-form gradient); the tight in-JVM error bound is pinned
  *    separately in a spec.
  *
  *  - `decodeStub` remains for codecs the JDK does not ship (video and
  *    compressed audio need external libs): it derives deterministic fake
  *    dimensions from the byte content behind the same mapPartitions seam
  *    a real kernel plugs into. The driver tables carry no binary column,
  *    so the stub queries derive bytes from `documents.text` (ASCII ⇒
  *    byte i == char code i, which keeps DuckDB bit-exact).
  */
object Multimodal {

  private def docs(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.TextHashFunctions.register(spark) // codegen'd char_hash
    spark.read.parquet(s"$dir/documents.parquet")
  }

  // ---- real image decode (javax.imageio) ----------------------------------

  /** Per-doc image spec, pure integer function of doc_id: 12-24 × 12-22 px,
    * alternating PNG/BMP (both losslessly round-trippable by the JDK codecs
    * — JPEG is deliberately excluded: lossy, decoder-version-dependent). */
  def imageSpec(docId: Long): (Int, Int, String) = (
    12 + (docId % 13).toInt,
    12 + (docId % 11).toInt,
    if (docId % 2 == 0) "png" else "bmp")

  /** Deterministic pixel pattern: each channel an affine-mod-256 function of
    * (doc_id, x, y). Closed-form enough for the oracle to replay per pixel. */
  def pixelRgb(docId: Long, x: Int, y: Int): Int = {
    val r = ((docId * 7 + x * 3 + y * 5) % 256).toInt
    val g = ((docId * 11 + x * 5 + y * 7) % 256).toInt
    val b = ((docId * 13 + x * 7 + y * 3) % 256).toInt
    (r << 16) | (g << 8) | b
  }

  /** Render + encode one payload through the real JDK codec. */
  def encodeImage(docId: Long): Array[Byte] = {
    val (w, h, fmt) = imageSpec(docId)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, pixelRgb(docId, x, y)); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  /** Decoded-raster statistics. Everything except doc_id/format is read
    * from the DECODED image — width/height from the codec header, sums and
    * min/max from the pixel raster. (Encoded byte size is deliberately NOT
    * emitted: PNG deflate output can vary across encoder versions; the
    * decoded raster cannot.) */
  final case class DecodedImage(
      doc_id: Long, format: String, width: Long, height: Long,
      n_pixels: Long, r_sum: Long, g_sum: Long, b_sum: Long,
      px_min: Long, px_max: Long)

  /** The real decode kernel: bytes in, raster stats out. */
  def decodeImage(docId: Long, fmt: String, payload: Array[Byte]): DecodedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, s"imageio failed to decode doc $docId ($fmt)")
    val w = img.getWidth
    val h = img.getHeight
    var rs = 0L; var gs = 0L; var bs = 0L
    var mn = 255L; var mx = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
        rs += r; gs += g; bs += b
        val lo = math.min(r, math.min(g, b)).toLong
        val hi = math.max(r, math.max(g, b)).toLong
        if (lo < mn) mn = lo
        if (hi > mx) mx = hi
        x += 1
      }
      y += 1
    }
    DecodedImage(docId, fmt, w.toLong, h.toLong, w.toLong * h, rs, gs, bs, mn, mx)
  }

  /** Feed for the row-local codec kernels: the id column, spread to at
    * least the session's parallelism. The documents scan is a single
    * input split at bench scale (one small parquet file), so without the
    * spread every mapPartitions codec ran on ONE core while 31 idled —
    * measured 2.43 s → 0.40 s on media_decode_jpeg_variants at sf0.1. The
    * shuffle moves only the 8-byte ids; at scale, where the scan already
    * has >= parallelism splits, NO exchange is added at all (the
    * spreadSmallScan conditional — a same-width round-robin of a wide
    * scan would still pay a shuffle of the ids for nothing). */
  private def idFeed(spark: SparkSession, ids: DataFrame) = {
    import spark.implicits._
    val parts = ids.rdd.getNumPartitions
    val par = spark.sparkContext.defaultParallelism
    val longs = ids.select(col("doc_id").cast("long"))
    (if (parts < par) longs.repartition(par) else longs).as[Long]
  }

  /** Batch encode→decode over partitions: row-local CPU work, no shuffle —
    * at 100 TB this is the embarrassingly-parallel kernel shape (the
    * payloads would come off a binary column instead of the generator;
    * the decode half is identical). ImageIO's disk cache is disabled so
    * executor threads never contend on temp files. */
  def decodeImages(spark: SparkSession, ids: DataFrame): Dataset[DecodedImage] = {
    import spark.implicits._
    idFeed(spark, ids)
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { id =>
          val (_, _, fmt) = imageSpec(id)
          decodeImage(id, fmt, encodeImage(id))
        }
      }
  }

  /** Decode a doc's payload through the real codec (shared by the resize
    * and perceptual-hash kernels). */
  private def decodedRaster(docId: Long): BufferedImage = {
    val (_, _, fmt) = imageSpec(docId)
    val img = ImageIO.read(new ByteArrayInputStream(encodeImage(docId)))
    require(img != null, s"imageio failed to decode doc $docId ($fmt)")
    img
  }

  /** One output block of the REAL resize kernel: integer box-filter
    * downsample of the decoded raster to a 4×4 grid (image cropped to
    * block multiples so every block has identical pixel count and the
    * floor-divided channel means are exact integers). */
  final case class ResizedBlock(
      doc_id: Long, bx: Long, by: Long, n_px: Long,
      r_avg: Long, g_avg: Long, b_avg: Long)

  /** Box-downsample the decoded raster to GRID×GRID blocks. */
  def resizeBlocks(docId: Long, img: BufferedImage, grid: Int): Seq[ResizedBlock] = {
    val bw = img.getWidth / grid
    val bh = img.getHeight / grid
    for (by <- 0 until grid; bx <- 0 until grid) yield {
      var rs = 0L; var gs = 0L; var bs = 0L
      var y = by * bh
      while (y < (by + 1) * bh) {
        var x = bx * bw
        while (x < (bx + 1) * bw) {
          val p = img.getRGB(x, y)
          rs += (p >> 16) & 0xff; gs += (p >> 8) & 0xff; bs += p & 0xff
          x += 1
        }
        y += 1
      }
      val n = bw.toLong * bh
      ResizedBlock(docId, bx.toLong, by.toLong, n, rs / n, gs / n, bs / n)
    }
  }

  /** 60-bit average-hash from the decoded raster: crop to a 6×10 block
    * grid, per-cell integer luma sums (BT.601 weights ×1000, exact), bit
    * i set iff cell_i·60 > Σcells (equal-sized cells ⇒ the mean compare
    * is an exact integer cross-multiplication). 60 bits keep the hash a
    * positive BIGINT in both engines — the simhash60 discipline. */
  final case class PHash(doc_id: Long, phash: Long, n_ones: Long)

  val PhashGridX = 6
  val PhashGridY = 10

  def phashOf(docId: Long, img: BufferedImage): PHash = {
    val bw = img.getWidth / PhashGridX
    val bh = img.getHeight / PhashGridY
    val cells = Array.fill(PhashGridX * PhashGridY)(0L)
    var y = 0
    while (y < bh * PhashGridY) {
      var x = 0
      while (x < bw * PhashGridX) {
        val p = img.getRGB(x, y)
        val luma = 299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) + 114L * (p & 0xff)
        cells((y / bh) * PhashGridX + (x / bw)) += luma
        x += 1
      }
      y += 1
    }
    val total = cells.sum
    var hash = 0L; var ones = 0L
    var i = 0
    while (i < cells.length) {
      if (cells(i) * 60 > total) { hash |= (1L << i); ones += 1 }
      i += 1
    }
    PHash(docId, hash, ones)
  }

  /** Real resize over partitions: decode → box-filter, row-local. */
  def resizeImages(spark: SparkSession, ids: DataFrame, grid: Int = 4): Dataset[ResizedBlock] = {
    import spark.implicits._
    idFeed(spark, ids)
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.flatMap(id => resizeBlocks(id, decodedRaster(id), grid))
      }
  }

  /** Perceptual hashes over partitions: decode → aHash, row-local. */
  def phashImages(spark: SparkSession, ids: DataFrame): Dataset[PHash] = {
    import spark.implicits._
    idFeed(spark, ids)
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map(id => phashOf(id, decodedRaster(id)))
      }
  }

  // ---- lossy-codec tier: REAL JPEG decode, tolerance-banded oracle ---------

  /** Per-doc JPEG spec: 16-28 × 16-26 px. Unlike the PNG/BMP tier the
    * payload is LOSSY, so the oracle cannot replay pixels bit-exactly;
    * instead the declared semantics are (a) header fields — width, height,
    * component count, sample precision — which every conformant decoder
    * reads identically from the bitstream, and (b) per-channel mean-error
    * BANDS: |decoded_sum − true_sum| div (Tol · n_pixels), which is 0 for
    * any decoder whose mean error stays under Tol levels. The pattern is a
    * smooth wrap-free gradient (JPEG-friendly: observed mean error ≲ 1
    * level at quality 0.92; IEEE-1180-conformant IDCTs differ from each
    * other by ≤ ~1 level per pixel), so Tol = 8 absorbs both compression
    * loss and cross-decoder variance with wide margin. A spec pins the
    * much tighter in-JVM bound separately. */
  def jpegSpec(docId: Long): (Int, Int) =
    (16 + (docId % 13).toInt, 16 + (docId % 11).toInt)

  /** Mean-error tolerance in 0-255 levels for the banded oracle. */
  val JpegTolLevels = 8L

  /** Smooth, wrap-free gradient: channel values stay in [0, 155] without
    * mod-256 sawtooth edges, so JPEG block transforms track them closely.
    * Closed-form for the oracle: r = base_r + 2x, g = base_g + 2y,
    * b = base_b + x + y with bases = (doc_id · {7,11,13}) % 100. */
  def jpegRgb(docId: Long, x: Int, y: Int): Int = {
    val r = ((docId * 7) % 100).toInt + 2 * x
    val g = ((docId * 11) % 100).toInt + 2 * y
    val b = ((docId * 13) % 100).toInt + x + y
    (r << 16) | (g << 8) | b
  }

  /** Render + encode one payload through the real JDK JPEG writer at a
    * pinned quality (MODE_EXPLICIT so encoder defaults can't drift). */
  def encodeJpeg(docId: Long): Array[Byte] = {
    val (w, h) = jpegSpec(docId)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, jpegRgb(docId, x, y)); x += 1 }
      y += 1
    }
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(0.92f)
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Bitstream-exact SOF header parse (precision, height, width,
    * components) — decoder-independent by the JPEG spec: walk the marker
    * stream to the first SOF0/1/2 segment. */
  def parseSof(payload: Array[Byte]): (Int, Int, Int, Int) = {
    def u8(i: Int): Int = payload(i) & 0xff
    require(u8(0) == 0xff && u8(1) == 0xd8, "not a JPEG (missing SOI)")
    var i = 2
    while (i + 3 < payload.length) {
      require(u8(i) == 0xff, s"marker desync at byte $i")
      val marker = u8(i + 1)
      if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2)
        return (u8(i + 4), (u8(i + 5) << 8) | u8(i + 6),
          (u8(i + 7) << 8) | u8(i + 8), u8(i + 9))
      i += 2 + ((u8(i + 2) << 8) | u8(i + 3))
    }
    throw new IllegalArgumentException("no SOF marker found")
  }

  /** Decoded JPEG facts: header fields exact, channel means as tolerance
    * bands (0 = within JpegTolLevels of the closed-form truth). */
  final case class JpegDecoded(
      doc_id: Long, width: Long, height: Long,
      n_components: Long, precision: Long,
      r_band: Long, g_band: Long, b_band: Long)

  /** The real lossy decode kernel: bytes in, banded raster facts out. The
    * SOF parse and the decoder must agree on dimensions — a disagreement
    * is a corrupt payload, not a tolerance matter. */
  def decodeJpeg(docId: Long, payload: Array[Byte]): JpegDecoded = {
    val (precision, sofH, sofW, nComp) = parseSof(payload)
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, s"imageio failed to decode JPEG doc $docId")
    require(img.getWidth == sofW && img.getHeight == sofH,
      s"decoder/header dimension mismatch for doc $docId")
    val (w, h) = (img.getWidth, img.getHeight)
    var rs = 0L; var gs = 0L; var bs = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        rs += (p >> 16) & 0xff; gs += (p >> 8) & 0xff; bs += p & 0xff
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    // closed-form true sums of the wrap-free gradient
    val baseR = (docId * 7) % 100; val baseG = (docId * 11) % 100
    val baseB = (docId * 13) % 100
    val sx = w.toLong * (w - 1) / 2 // Σx per row
    val sy = h.toLong * (h - 1) / 2 // Σy per column
    val trueR = baseR * n + 2 * sx * h
    val trueG = baseG * n + 2 * sy * w
    val trueB = baseB * n + sx * h + sy * w
    JpegDecoded(docId, w.toLong, h.toLong, nComp.toLong, precision.toLong,
      math.abs(rs - trueR) / (JpegTolLevels * n),
      math.abs(gs - trueG) / (JpegTolLevels * n),
      math.abs(bs - trueB) / (JpegTolLevels * n))
  }

  /** Batch JPEG encode→decode over partitions: the same row-local kernel
    * shape as [[decodeImages]], applied to the lossy tier. */
  def decodeJpegs(spark: SparkSession, ids: DataFrame): Dataset[JpegDecoded] = {
    import spark.implicits._
    idFeed(spark, ids)
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map(id => decodeJpeg(id, encodeJpeg(id)))
      }
  }

  // ---- lossy-tier VARIANTS: progressive scan + chroma-subsampling modes ----

  /** The three encoder modes a real image corpus mixes freely:
    *  - `baseline`    — sequential DCT, the JDK default 4:2:0 chroma
    *    (luma sampled 2×2 against 1×1 chroma: SOF says so bitstream-exactly)
    *  - `progressive` — spectral-selection progressive scan script
    *    (SOF2 marker instead of SOF0 — the decoder takes a different path)
    *  - `chroma444`   — full-resolution chroma, forced through the
    *    writer's image-metadata tree (componentSpec sampling factors 1×1)
    * All three carry the SAME gradient payload, so one tolerance-banded
    * oracle covers every mode and any bitstream/decode divergence between
    * modes surfaces as a broken exact column (marker, sampling) or band. */
  val JpegVariants: Seq[String] = Seq("baseline", "progressive", "chroma444")

  /** Encode one payload in the given variant (same pinned quality). */
  def encodeJpegVariant(docId: Long, variant: String): Array[Byte] = {
    val (w, h) = jpegSpec(docId)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, jpegRgb(docId, x, y)); x += 1 }
      y += 1
    }
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(0.92f)
    if (variant == "progressive")
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val metadata =
      if (variant == "chroma444") {
        // force 1×1 sampling on every component via the metadata tree —
        // the only JDK-exposed control over chroma subsampling
        val md = writer.getDefaultImageMetadata(
          new javax.imageio.ImageTypeSpecifier(img), param)
        val fmt = "javax_imageio_jpeg_image_1.0"
        val root = md.getAsTree(fmt).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        val comps = root.getElementsByTagName("componentSpec")
        var i = 0
        while (i < comps.getLength) {
          val c = comps.item(i).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
          c.setAttribute("HsamplingFactor", "1")
          c.setAttribute("VsamplingFactor", "1")
          i += 1
        }
        md.setFromTree(fmt, root)
        md
      } else null
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, metadata), param)
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Extended SOF parse: marker code and the luma component's packed
    * sampling byte too ((H << 4) | V — 0x22 for 4:2:0, 0x11 for 4:4:4),
    * both read straight from the bitstream. */
  def parseSofExt(payload: Array[Byte]): (Int, Int, Int, Int, Int, Int) = {
    def u8(i: Int): Int = payload(i) & 0xff
    require(u8(0) == 0xff && u8(1) == 0xd8, "not a JPEG (missing SOI)")
    var i = 2
    while (i + 3 < payload.length) {
      require(u8(i) == 0xff, s"marker desync at byte $i")
      val marker = u8(i + 1)
      if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2)
        return (marker, u8(i + 4), (u8(i + 5) << 8) | u8(i + 6),
          (u8(i + 7) << 8) | u8(i + 8), u8(i + 9), u8(i + 11))
      i += 2 + ((u8(i + 2) << 8) | u8(i + 3))
    }
    throw new IllegalArgumentException("no SOF marker found")
  }

  /** One decoded variant row: marker + luma sampling exact, means banded. */
  final case class JpegVariantDecoded(
      doc_id: Long, variant: String, width: Long, height: Long,
      sof_marker: Long, y_samp: Long,
      r_band: Long, g_band: Long, b_band: Long)

  def decodeJpegVariant(docId: Long, variant: String,
      payload: Array[Byte]): JpegVariantDecoded = {
    val (marker, _, sofH, sofW, _, ySamp) = parseSofExt(payload)
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, s"imageio failed to decode $variant JPEG doc $docId")
    require(img.getWidth == sofW && img.getHeight == sofH,
      s"decoder/header dimension mismatch for doc $docId ($variant)")
    val (w, h) = (img.getWidth, img.getHeight)
    var rs = 0L; var gs = 0L; var bs = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        rs += (p >> 16) & 0xff; gs += (p >> 8) & 0xff; bs += p & 0xff
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    val baseR = (docId * 7) % 100; val baseG = (docId * 11) % 100
    val baseB = (docId * 13) % 100
    val sx = w.toLong * (w - 1) / 2
    val sy = h.toLong * (h - 1) / 2
    val trueR = baseR * n + 2 * sx * h
    val trueG = baseG * n + 2 * sy * w
    val trueB = baseB * n + sx * h + sy * w
    JpegVariantDecoded(docId, variant, w.toLong, h.toLong,
      marker.toLong, ySamp.toLong,
      math.abs(rs - trueR) / (JpegTolLevels * n),
      math.abs(gs - trueG) / (JpegTolLevels * n),
      math.abs(bs - trueB) / (JpegTolLevels * n))
  }

  /** Row-local variant sweep: every doc through all three encoder modes. */
  def decodeJpegVariants(spark: SparkSession, ids: DataFrame): Dataset[JpegVariantDecoded] = {
    import spark.implicits._
    idFeed(spark, ids)
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.flatMap(id => JpegVariants.map(v =>
          decodeJpegVariant(id, v, encodeJpegVariant(id, v))))
      }
  }

  // ---- perceptual hash across recompression (phash ∘ JPEG) -----------------

  /** Average-hash of the lossy tier: 6×10 luma-cell grid over the DECODED
    * JPEG raster (crop to cell multiples, bit i ⇔ cell sum above the
    * cropped-image mean via exact integer cross-multiply — every cell has
    * equal pixel count, so `cell · 60 > total` is the comparison). */
  def jpegPhashOfRaster(img: BufferedImage): Long = {
    val bw = img.getWidth / 6
    val bh = img.getHeight / 10
    val cells = new Array[Long](60)
    var total = 0L
    var y = 0
    while (y < bh * 10) {
      var x = 0
      while (x < bw * 6) {
        val p = img.getRGB(x, y)
        val luma = 299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) +
          114L * (p & 0xff)
        cells((y / bh) * 6 + (x / bw)) += luma
        total += luma
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var i = 0
    while (i < 60) {
      if (cells(i) * 60L > total) hash |= 1L << i
      i += 1
    }
    hash
  }

  /** Closed-form truth: the same grid over the EXACT gradient pixels. */
  def jpegPhashTrue(docId: Long): Long = {
    val (w, h) = jpegSpec(docId)
    val bw = w / 6
    val bh = h / 10
    val cells = new Array[Long](60)
    var total = 0L
    var y = 0
    while (y < bh * 10) {
      var x = 0
      while (x < bw * 6) {
        val p = jpegRgb(docId, x, y)
        val luma = 299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) +
          114L * (p & 0xff)
        cells((y / bh) * 6 + (x / bw)) += luma
        total += luma
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var i = 0
    while (i < 60) {
      if (cells(i) * 60L > total) hash |= 1L << i
      i += 1
    }
    hash
  }

  /** Hamming drift budget: recompression counts as "same image" while the
    * lossy hash stays within this many of the 60 bits — the standard
    * near-dup threshold family for 64-bit average hashes. */
  val JpegPhashTolBits = 8L

  final case class JpegPhash(doc_id: Long, phash_true: Long, dist_band: Long)

  /** The near-dup-across-recompression primitive: hash the DECODED lossy
    * raster, compare against the lossless closed-form truth. `phash_true`
    * is oracle-exact; `dist_band = hamming div JpegPhashTolBits` declares
    * that one encode→decode generation moves the perceptual hash by fewer
    * than the dup threshold — exactly the property that lets a corpus
    * dedup recompressed copies of the same image. The tight in-JVM drift
    * (empirically ≤ 2-3 bits on the gradient corpus) is pinned in a spec. */
  def jpegPhashes(spark: SparkSession, ids: DataFrame): Dataset[JpegPhash] = {
    import spark.implicits._
    idFeed(spark, ids)
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { id =>
          val img = ImageIO.read(new ByteArrayInputStream(encodeJpeg(id)))
          require(img != null, s"imageio failed to decode JPEG doc $id")
          val lossy = jpegPhashOfRaster(img)
          val truth = jpegPhashTrue(id)
          JpegPhash(id, truth,
            java.lang.Long.bitCount(lossy ^ truth).toLong / JpegPhashTolBits)
        }
      }
  }

  // ---- real audio decode (javax.sound.sampled) -----------------------------

  /** Per-doc audio spec, pure integer function of doc_id: 180-280 samples
    * of 16-bit mono PCM at 8 or 16 kHz. PCM-in-WAV is lossless, so the
    * decoded samples equal the generated ones exactly — the audio twin of
    * the PNG/BMP discipline (lossy codecs like MP3 stay behind the stub
    * seam). */
  def audioSpec(docId: Long): (Int, Int) = (
    180 + (docId % 101).toInt,
    if (docId % 2 == 0) 8000 else 16000)

  /** Deterministic waveform: sample i is an affine-mod value in
    * [-2000, 2000] — closed-form enough for the oracle to replay per
    * sample, sign-rich enough to exercise zero-crossing counting. */
  def sampleAt(docId: Long, i: Int): Int =
    ((docId * 31 + i.toLong * 7919) % 4001).toInt - 2000

  /** Render + encode one clip through the real JDK WAV writer. */
  def encodeWav(docId: Long): Array[Byte] = {
    val (n, sr) = audioSpec(docId)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = sampleAt(docId, i)
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sr.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decoded-waveform statistics — sample_rate/n_samples come from the
    * decoded header and frame stream, the rest from the decoded samples. */
  final case class DecodedAudio(
      doc_id: Long, sample_rate: Long, n_samples: Long,
      peak_abs: Long, sum_abs: Long, sum_sq: Long, zero_crossings: Long)

  /** The real decode kernel: WAV bytes in, waveform stats out. Honors the
    * DECODED format's declared endianness rather than assuming the
    * writer's. */
  def decodeWav(docId: Long, payload: Array[Byte]): DecodedAudio = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new ByteArrayInputStream(payload))
    val f = ais.getFormat
    require(f.getSampleSizeInBits == 16 && f.getChannels == 1,
      s"unexpected decoded format for doc $docId: $f")
    val bytes = ais.readAllBytes()
    ais.close()
    val n = bytes.length / 2
    val big = f.isBigEndian
    var peak = 0L; var sumAbs = 0L; var sumSq = 0L; var zc = 0L
    var prev = 0
    var i = 0
    while (i < n) {
      val b0 = bytes(2 * i) & 0xff; val b1 = bytes(2 * i + 1) & 0xff
      val s = (if (big) (b0 << 8) | b1 else (b1 << 8) | b0).toShort.toInt
      val a = math.abs(s).toLong
      if (a > peak) peak = a
      sumAbs += a
      sumSq += a * a
      if (i > 0 && prev.toLong * s < 0) zc += 1
      prev = s
      i += 1
    }
    DecodedAudio(docId, f.getSampleRate.toLong, n.toLong, peak, sumAbs, sumSq, zc)
  }

  /** Batch audio encode→decode over partitions — row-local CPU, zero
    * shuffle, the same embarrassingly-parallel kernel shape as
    * [[decodeImages]]. */
  // NOTE: the audio kernels deliberately do NOT use idFeed — the
  // per-sample WAV work is light and javax.sound's provider lookup
  // serializes across threads, so spreading the ids 32-way measured
  // SLOWER (0.95 → 1.39 s decode, 0.67 → 1.32 s windows at sf0.1) than
  // the scan's own partitioning. The image kernels (real codec CPU per
  // doc) keep the spread.
  def decodeAudio(spark: SparkSession, ids: DataFrame): Dataset[DecodedAudio] = {
    import spark.implicits._
    ids.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.map(id => decodeWav(id, encodeWav(id))))
  }

  /** One window of the framed energy profile: the clip cropped to 4 equal
    * windows (VAD/feature-frame shape), per-window energy and peak from
    * the DECODED samples. */
  final case class AudioWindow(
      doc_id: Long, win: Long, n_samp: Long, energy: Long, peak_abs: Long)

  def audioWindows(docId: Long, payload: Array[Byte]): Seq[AudioWindow] = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new ByteArrayInputStream(payload))
    val f = ais.getFormat
    val bytes = ais.readAllBytes()
    ais.close()
    val n = bytes.length / 2
    val big = f.isBigEndian
    val len = n / 4
    for (w <- 0 until 4) yield {
      var e = 0L; var peak = 0L
      var i = w * len
      while (i < (w + 1) * len) {
        val b0 = bytes(2 * i) & 0xff; val b1 = bytes(2 * i + 1) & 0xff
        val s = (if (big) (b0 << 8) | b1 else (b1 << 8) | b0).toShort.toInt
        val a = math.abs(s).toLong
        e += a * a
        if (a > peak) peak = a
        i += 1
      }
      AudioWindow(docId, w.toLong, len.toLong, e, peak)
    }
  }

  def windowAudio(spark: SparkSession, ids: DataFrame): Dataset[AudioWindow] = {
    import spark.implicits._
    ids.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.flatMap(id => audioWindows(id, encodeWav(id))))
  }

  // ---- stubbed decode (codecs the JDK does not ship) -----------------------

  /** Typed result of the (stubbed) decode step. */
  final case class MediaMeta(
      doc_id: Long, n_bytes: Int, header_code: Int, checksum: Long,
      width: Int, height: Int, format: String)

  /** Deterministic fake decode of one payload — the `???` seam where a real
    * codec (libjpeg/ffmpeg/...) would plug in. Pure function of the bytes. */
  def decodeOne(docId: Long, payload: Array[Byte]): MediaMeta = {
    var h = 0L
    payload.foreach { b => h = (h * 31 + (b & 0xff)) % P }
    MediaMeta(
      doc_id = docId,
      n_bytes = payload.length,
      header_code = if (payload.nonEmpty) payload(0) & 0xff else 0,
      checksum = h,
      width = (16 + h % 64).toInt,
      height = (16 + (h / 64) % 64).toInt,
      format = (h % 3) match { case 0 => "jpeg"; case 1 => "png"; case _ => "webp" })
  }

  /** Batch decode over partitions: one JVM-side pass per partition, rows
    * streamed — the batch shape a Pandas-UDF/`mapInPandas` decode would
    * have. Input must carry (doc_id: Long, payload: Binary). */
  def decodeStub(spark: SparkSession, withPayload: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    withPayload.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeOne(id, bytes) })
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Metadata extraction: payload envelope -> typed columns, all derived
    // from the bytes with exact integer arithmetic.
    "media_metadata" -> ((s, d) =>
      docs(s, d).selectExpr(
        "doc_id",
        // BIGINT to match DuckDB's octet_length result type
        "CAST(octet_length(encode(text, 'UTF-8')) AS BIGINT) AS n_bytes",
        "ascii(substring(text, 1, 1)) AS header_code",
        s"${charHashSpark("text")} AS checksum",
        s"CAST(16 + ${charHashSpark("text")} % 64 AS INT) AS width",
        s"CAST(16 + (${charHashSpark("text")} div 64) % 64 AS INT) AS height",
        s"CASE ${charHashSpark("text")} % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format"
      ).orderBy(asc("doc_id"))),

    // Frame sampling: every 16th byte (video-frame subsampling analogue);
    // emits the sampled "frame track" length and content hash.
    "media_frame_sample" -> ((s, d) =>
      docs(s, d).selectExpr(
        "doc_id",
        "CAST((length(text) + 15) div 16 AS BIGINT) AS n_frames",
        s"""${charHashSpark(
            "array_join(transform(sequence(1, (length(text) + 15) div 16), i -> substring(text, (i - 1) * 16 + 1, 1)), '')")}
           AS track_hash"""
      ).orderBy(asc("doc_id"))),

    // Format routing: fake-decoded format buckets -> per-format volumes
    // (the partition/routing step of a multimodal ingest job).
    "media_format_stats" -> ((s, d) =>
      docs(s, d).selectExpr("doc_id",
          "octet_length(encode(text, 'UTF-8')) AS n_bytes",
          s"CASE ${charHashSpark("text")} % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format")
        .groupBy(col("format"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_bytes")).cast("bigint").as("total_bytes"))
        .orderBy(asc("format"))),

    // Content-hash dedup census per format — the "drop byte-identical
    // images before decode" step every multimodal pipeline runs first.
    // Two map-side-combined groupBys: payloads shard by content hash (the
    // canonical exact-dedup shuffle — at 100 TB this is hash-partitioned
    // binary, nothing compares payload bytes pairwise), then the per-hash
    // groups collapse to a per-format savings report. A real pipeline uses
    // a 128-bit digest; the 30-bit stub hash stands in behind the same
    // plan shape, so `grp_bytes - keep_bytes` (not `(copies-1)·bytes`) is
    // used deliberately — it stays correct even when distinct payloads
    // collide on the hash.
    "media_dedup_report" -> ((s, d) =>
      docs(s, d).selectExpr(
          "CAST(octet_length(encode(text, 'UTF-8')) AS BIGINT) AS n_bytes",
          s"${charHashSpark("text")} AS checksum",
          s"CASE ${charHashSpark("text")} % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format")
        .groupBy(col("format"), col("checksum"))
        .agg(count(lit(1)).as("copies"),
          sum(col("n_bytes")).as("grp_bytes"),
          max(col("n_bytes")).as("keep_bytes"))
        .groupBy(col("format"))
        .agg(sum(col("copies")).as("n_payloads"),
          count(lit(1)).as("n_distinct"),
          sum(expr("copies - 1")).as("dup_docs"),
          sum(expr("grp_bytes - keep_bytes")).as("bytes_saved"))
        .selectExpr("format", "n_payloads", "n_distinct", "dup_docs",
          "(dup_docs * 10000) div n_payloads AS dup_bp", "bytes_saved")
        .orderBy(asc("format"))),

    // Resize planning: fit the fake-decoded (width, height) into a 224-max
    // box preserving aspect ratio — pure integer math (floor division), so
    // the plan an actual resampling kernel would execute is oracle-pinned
    // even though the pixel work itself lives behind the codec seam.
    "media_resize_plan" -> ((s, d) =>
      docs(s, d).selectExpr(
          "doc_id",
          s"CAST(16 + ${charHashSpark("text")} % 64 AS INT) AS width",
          s"CAST(16 + (${charHashSpark("text")} div 64) % 64 AS INT) AS height")
        .selectExpr("doc_id", "width", "height",
          "CAST(CASE WHEN width >= height THEN 224 ELSE (width * 224) div height END AS INT) AS out_w",
          "CAST(CASE WHEN width >= height THEN (height * 224) div width ELSE 224 END AS INT) AS out_h")
        .orderBy(asc("doc_id"))),

    // Feature extraction stub: 4-bucket byte-class histogram over the
    // payload bytes (the shape a real embedding/feature kernel would have:
    // one narrow scan, fixed-width integer vector out per item).
    "media_feature_extract" -> ((s, d) =>
      docs(s, d).selectExpr(
          "doc_id",
          "CAST(length(text) - length(regexp_replace(text, '[a-z]', '')) AS BIGINT) AS n_lower",
          "CAST(length(text) - length(regexp_replace(text, '[A-Z]', '')) AS BIGINT) AS n_upper",
          "CAST(length(text) - length(regexp_replace(text, '[0-9]', '')) AS BIGINT) AS n_digit",
          "CAST(length(text) AS BIGINT) AS n_total")
        .selectExpr("doc_id", "n_lower", "n_upper", "n_digit",
          "n_total - n_lower - n_upper - n_digit AS n_other")
        .orderBy(asc("doc_id"))),

    // The mapPartitions decode stub itself. The operator shape is not
    // SQL-expressible, but its stub arithmetic IS deterministic integer
    // math, so the oracle below replays it column-for-column in DuckDB.
    "media_decode_stub" -> ((s, d) => {
      val payloads = docs(s, d)
        .selectExpr("doc_id", "encode(text, 'UTF-8') AS payload")
      decodeStub(s, payloads).toDF().orderBy(asc("doc_id"))
    }),

    // REAL image decode: per-doc PNG/BMP payloads rendered from integer
    // pixel rules, pushed through javax.imageio encode AND decode, stats
    // read from the decoded raster. The oracle recomputes the same stats
    // from the closed-form pattern alone — both codecs are lossless, so
    // any decoder deviation (wrong dims, channel order, color shift)
    // breaks the hash. Row-local CPU, zero shuffle.
    "media_decode" -> ((s, d) =>
      decodeImages(s, docs(s, d).select(col("doc_id")))
        .toDF().orderBy(asc("doc_id"))),

    // REAL lossy decode (JPEG through javax.imageio): header fields are
    // bitstream-exact (SOF parse must agree with the decoder); channel
    // means are tolerance BANDS — 0 iff the decoded mean is within
    // JpegTolLevels of the closed-form gradient, the declared semantics
    // any conformant decoder satisfies. Row-local kernel like the
    // lossless tier; the tight in-JVM error bound is pinned in a spec.
    "media_decode_jpeg" -> ((s, d) =>
      decodeJpegs(s, docs(s, d).select(col("doc_id")))
        .toDF().orderBy(asc("doc_id"))),

    // Lossy-tier VARIANTS: the same gradient payload through the three
    // encoder modes a real corpus mixes (baseline 4:2:0, progressive
    // SOF2, forced-4:4:4 chroma). Marker + luma sampling byte are
    // bitstream-exact per variant; means stay tolerance-banded. One green
    // row set proves the decoder handles all three scan/sampling paths.
    "media_decode_jpeg_variants" -> ((s, d) =>
      decodeJpegVariants(s, docs(s, d).select(col("doc_id")))
        .toDF().orderBy(asc("doc_id"), asc("variant"))),

    // Perceptual hash ACROSS recompression: average-hash of the decoded
    // lossy raster vs the closed-form lossless truth. phash_true is
    // oracle-exact; dist_band = 0 declares the recompressed hash stays
    // within the near-dup threshold of the original — the property image
    // dedup at corpus scale rests on. Row-local kernel, zero shuffle.
    "media_phash_jpeg" -> ((s, d) =>
      jpegPhashes(s, docs(s, d).select(col("doc_id")))
        .toDF().orderBy(asc("doc_id"))),

    // REAL resize execution (not just the plan): decode → integer box
    // filter to a 4×4 block grid, floor-divided channel means exact by
    // construction (cropping makes every block the same size). Row-local
    // kernel; emission is exactly 16·docs rows.
    "media_resize_exec" -> ((s, d) =>
      resizeImages(s, docs(s, d).select(col("doc_id")))
        .toDF().orderBy(asc("doc_id"), asc("by"), asc("bx"))),

    // Perceptual average-hash from the DECODED raster: 6×10 luma-cell
    // grid, bit i ⇔ cell above the image mean (exact integer cross-
    // multiply), packed into a positive 60-bit BIGINT — the image twin
    // of the text simhash60. Row-local kernel, constant output per doc.
    "media_phash" -> ((s, d) =>
      phashImages(s, docs(s, d).select(col("doc_id")))
        .toDF().orderBy(asc("doc_id"))),

    // REAL audio decode: per-doc 16-bit mono PCM clips rendered from an
    // integer waveform rule, pushed through the JDK WAV writer AND reader
    // (javax.sound.sampled), stats computed from the DECODED samples. PCM
    // is lossless, so the oracle's closed-form per-sample replay matches
    // bit-exactly — a green row proves the real codec round-trip (header
    // parse, frame framing, endianness) like media_decode does for images.
    "media_audio_decode" -> ((s, d) =>
      decodeAudio(s, docs(s, d).select(col("doc_id")))
        .toDF().orderBy(asc("doc_id"))),

    // Framed energy profile from the DECODED waveform: clip cropped to 4
    // equal windows, per-window energy (Σs²) and peak — the feature-frame
    // /VAD shape every audio pipeline computes first. Row-local kernel,
    // exactly 4·docs rows out.
    "media_audio_windows" -> ((s, d) =>
      windowAudio(s, docs(s, d).select(col("doc_id")))
        .toDF().orderBy(asc("doc_id"), asc("win"))),

    // Hamming nearest neighbor for a bounded probe set over the phash
    // column: the dedup/near-dup primitive for images. The probe side is
    // 10 rows (broadcast); the corpus side is scanned once map-side and
    // reduced by min(struct(dist, nn_id)) — a combine-friendly aggregate,
    // never a corpus-sized window partition. At 100 TB: probes broadcast,
    // one narrow pass, 10-row output.
    "media_phash_nn" -> ((s, d) => {
      val hashes = phashImages(s, docs(s, d).select(col("doc_id"))).toDF()
      val probes = hashes.filter(col("doc_id") < 10)
        .select(col("doc_id").as("probe_id"), col("phash").as("probe_hash"))
      hashes.select(col("doc_id").as("nn_id"), col("phash").as("nn_hash"))
        .crossJoin(broadcast(probes))
        .filter(col("nn_id") =!= col("probe_id"))
        .withColumn("dist", expr("CAST(bit_count(probe_hash ^ nn_hash) AS BIGINT)"))
        .groupBy(col("probe_id"))
        .agg(min(struct(col("dist"), col("nn_id"))).as("m"))
        .selectExpr("probe_id", "m.nn_id AS nn_id", "m.dist AS dist")
        .orderBy(asc("probe_id"))
    })
  )

  /** Shared phash replay for the oracles: the pixel grid per doc, luma
    * cell sums, mean-compare bits, 60-bit pack — all in SQL. */
  private val PhashCte: String =
    "dims AS (SELECT doc_id, CAST((12 + doc_id % 13) // 6 AS BIGINT) AS bw, " +
    "CAST((12 + doc_id % 11) // 10 AS BIGINT) AS bh FROM documents), " +
    "pxg AS (SELECT d.doc_id, bw, bh, t.i % (bw * 6) AS x, t.i // (bw * 6) AS y " +
    "FROM dims d, unnest(range(0, bw * 6 * bh * 10)) AS t(i)), " +
    "cells AS (SELECT doc_id, (y // bh) * 6 + (x // bw) AS i, " +
    "sum(299 * ((doc_id * 7 + x * 3 + y * 5) % 256) + " +
    "587 * ((doc_id * 11 + x * 5 + y * 7) % 256) + " +
    "114 * ((doc_id * 13 + x * 7 + y * 3) % 256)) AS cell " +
    "FROM pxg GROUP BY 1, 2), " +
    "tot AS (SELECT doc_id, sum(cell) AS total FROM cells GROUP BY 1), " +
    "ph AS (SELECT c.doc_id, " +
    "CAST(sum(CASE WHEN cell * 60 > total THEN 1::BIGINT << i ELSE 0 END) AS BIGINT) AS phash, " +
    "CAST(sum(CASE WHEN cell * 60 > total THEN 1 ELSE 0 END) AS BIGINT) AS n_ones " +
    "FROM cells c JOIN tot USING (doc_id) GROUP BY c.doc_id)"

  def oracles: Map[String, String] = Map(
    "media_metadata" ->
      (s"SELECT doc_id, octet_length(encode(text)) AS n_bytes, " +
        "unicode(substring(text, 1, 1)) AS header_code, " +
        s"${charHashDuck("text")} AS checksum, " +
        s"CAST(16 + ${charHashDuck("text")} % 64 AS INT) AS width, " +
        s"CAST(16 + (${charHashDuck("text")} // 64) % 64 AS INT) AS height, " +
        s"CASE ${charHashDuck("text")} % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format " +
        "FROM documents ORDER BY doc_id"),
    "media_frame_sample" ->
      (s"SELECT doc_id, CAST((length(text) + 15) // 16 AS BIGINT) AS n_frames, " +
        s"${charHashDuck("list_aggregate(list_transform(range(1, (length(text) + 15) // 16 + 1), " +
          "i -> substring(text, (i - 1) * 16 + 1, 1)), 'string_agg', '')")} AS track_hash " +
        "FROM documents ORDER BY doc_id"),
    "media_resize_plan" ->
      (s"WITH m AS (SELECT doc_id, " +
        s"CAST(16 + ${charHashDuck("text")} % 64 AS INT) AS width, " +
        s"CAST(16 + (${charHashDuck("text")} // 64) % 64 AS INT) AS height " +
        "FROM documents) " +
        "SELECT doc_id, width, height, " +
        "CAST(CASE WHEN width >= height THEN 224 ELSE (width * 224) // height END AS INT) AS out_w, " +
        "CAST(CASE WHEN width >= height THEN (height * 224) // width ELSE 224 END AS INT) AS out_h " +
        "FROM m ORDER BY doc_id"),
    "media_feature_extract" ->
      ("WITH m AS (SELECT doc_id, " +
        "length(text) - length(regexp_replace(text, '[a-z]', '', 'g')) AS n_lower, " +
        "length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS n_upper, " +
        "length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit, " +
        "length(text) AS n_total FROM documents) " +
        "SELECT doc_id, n_lower, n_upper, n_digit, " +
        "n_total - n_lower - n_upper - n_digit AS n_other FROM m ORDER BY doc_id"),
    "media_format_stats" ->
      (s"WITH m AS (SELECT doc_id, octet_length(encode(text)) AS n_bytes, " +
        s"CASE ${charHashDuck("text")} % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format " +
        "FROM documents) " +
        "SELECT format, count(*) AS n_docs, CAST(sum(n_bytes) AS BIGINT) AS total_bytes " +
        "FROM m GROUP BY format ORDER BY format"),
    "media_dedup_report" ->
      (s"WITH m AS (SELECT CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, " +
        s"${charHashDuck("text")} AS checksum, " +
        s"CASE ${charHashDuck("text")} % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format " +
        "FROM documents), " +
        "g AS (SELECT format, checksum, count(*) AS copies, " +
        "CAST(sum(n_bytes) AS BIGINT) AS grp_bytes, max(n_bytes) AS keep_bytes " +
        "FROM m GROUP BY format, checksum) " +
        "SELECT format, CAST(sum(copies) AS BIGINT) AS n_payloads, " +
        "count(*) AS n_distinct, CAST(sum(copies - 1) AS BIGINT) AS dup_docs, " +
        "(CAST(sum(copies - 1) AS BIGINT) * 10000) // CAST(sum(copies) AS BIGINT) AS dup_bp, " +
        "CAST(sum(grp_bytes - keep_bytes) AS BIGINT) AS bytes_saved " +
        "FROM g GROUP BY format ORDER BY format"),
    // The decode seam is a mapPartitions operator, but its arithmetic is
    // deterministic integer math over the payload bytes (ASCII ⇒ byte i ==
    // char code i), so DuckDB can replay every derived column: length,
    // first byte, char-fold checksum, checksum-derived width/height/format.
    // Types follow MediaMeta exactly (n_bytes/header_code/width/height INT).
    "media_decode_stub" ->
      (s"SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes, " +
        "unicode(substring(text, 1, 1)) AS header_code, " +
        s"${charHashDuck("text")} AS checksum, " +
        s"CAST(16 + ${charHashDuck("text")} % 64 AS INT) AS width, " +
        s"CAST(16 + (${charHashDuck("text")} // 64) % 64 AS INT) AS height, " +
        s"CASE ${charHashDuck("text")} % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format " +
        "FROM documents ORDER BY doc_id"),
    // Independent replay of media_decode: the oracle NEVER touches image
    // bytes — it expands each doc's (width × height) pixel grid and
    // evaluates the affine-mod-256 pattern per channel in SQL. Spark's
    // numbers come from the decoded raster; equality proves the real
    // javax.imageio round-trip is bit-exact.
    "media_decode" ->
      ("WITH spec AS (SELECT doc_id, " +
        "CAST(12 + doc_id % 13 AS BIGINT) AS width, " +
        "CAST(12 + doc_id % 11 AS BIGINT) AS height, " +
        "CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END AS format " +
        "FROM documents), " +
        "px AS (SELECT s.doc_id, s.format, s.width, s.height, " +
        "(s.doc_id * 7 + (t.i % s.width) * 3 + (t.i // s.width) * 5) % 256 AS r, " +
        "(s.doc_id * 11 + (t.i % s.width) * 5 + (t.i // s.width) * 7) % 256 AS g, " +
        "(s.doc_id * 13 + (t.i % s.width) * 7 + (t.i // s.width) * 3) % 256 AS b " +
        "FROM spec s, unnest(range(0, s.width * s.height)) AS t(i)) " +
        "SELECT doc_id, format, width, height, count(*) AS n_pixels, " +
        "CAST(sum(r) AS BIGINT) AS r_sum, CAST(sum(g) AS BIGINT) AS g_sum, " +
        "CAST(sum(b) AS BIGINT) AS b_sum, " +
        "CAST(least(min(r), min(g), min(b)) AS BIGINT) AS px_min, " +
        "CAST(greatest(max(r), max(g), max(b)) AS BIGINT) AS px_max " +
        "FROM px GROUP BY doc_id, format, width, height ORDER BY doc_id"),
    // Tolerance-banded replay of media_decode_jpeg: the oracle declares
    // the bitstream-exact header fields closed-form and the error bands
    // as 0 (= decoded means within JpegTolLevels of the gradient truth);
    // a green row proves the real lossy round-trip landed inside the
    // declared envelope. Pixel-exact replay is impossible for a lossy
    // codec BY DESIGN — the band is the honest contract.
    "media_decode_jpeg" ->
      ("SELECT doc_id, CAST(16 + doc_id % 13 AS BIGINT) AS width, " +
        "CAST(16 + doc_id % 11 AS BIGINT) AS height, " +
        "CAST(3 AS BIGINT) AS n_components, CAST(8 AS BIGINT) AS precision, " +
        "CAST(0 AS BIGINT) AS r_band, CAST(0 AS BIGINT) AS g_band, " +
        "CAST(0 AS BIGINT) AS b_band " +
        "FROM documents ORDER BY doc_id"),

    // Variant sweep: the exact columns come straight from the declared
    // encoder modes (SOF0=192 vs SOF2=194; luma sampling byte 0x22=34 for
    // 4:2:0, 0x11=17 for forced 4:4:4); bands declare the same Tol
    // envelope as the baseline tier for every mode.
    "media_decode_jpeg_variants" ->
      ("WITH v(variant, sof_marker, y_samp) AS (VALUES " +
        "('baseline', 192, 34), ('chroma444', 192, 17), ('progressive', 194, 34)) " +
        "SELECT doc_id, variant, CAST(16 + doc_id % 13 AS BIGINT) AS width, " +
        "CAST(16 + doc_id % 11 AS BIGINT) AS height, " +
        "CAST(sof_marker AS BIGINT) AS sof_marker, CAST(y_samp AS BIGINT) AS y_samp, " +
        "CAST(0 AS BIGINT) AS r_band, CAST(0 AS BIGINT) AS g_band, " +
        "CAST(0 AS BIGINT) AS b_band " +
        "FROM documents, v ORDER BY doc_id, variant"),

    // phash-across-recompression: the truth hash replays the exact
    // gradient grid in SQL; dist_band = 0 is the declared within-dup-
    // threshold drift envelope for one encode→decode generation.
    "media_phash_jpeg" ->
      ("WITH dims AS (SELECT doc_id, CAST((16 + doc_id % 13) // 6 AS BIGINT) AS bw, " +
        "CAST((16 + doc_id % 11) // 10 AS BIGINT) AS bh FROM documents), " +
        "pxg AS (SELECT d.doc_id, bw, bh, t.i % (bw * 6) AS x, t.i // (bw * 6) AS y " +
        "FROM dims d, unnest(range(0, bw * 6 * bh * 10)) AS t(i)), " +
        "cells AS (SELECT doc_id, (y // bh) * 6 + (x // bw) AS i, " +
        "sum(299 * ((doc_id * 7) % 100 + 2 * x) + " +
        "587 * ((doc_id * 11) % 100 + 2 * y) + " +
        "114 * ((doc_id * 13) % 100 + x + y)) AS cell " +
        "FROM pxg GROUP BY 1, 2), " +
        "tot AS (SELECT doc_id, sum(cell) AS total FROM cells GROUP BY 1), " +
        "ph AS (SELECT c.doc_id, " +
        "CAST(sum(CASE WHEN cell * 60 > total THEN 1::BIGINT << i ELSE 0 END) AS BIGINT) AS phash_true " +
        "FROM cells c JOIN tot USING (doc_id) GROUP BY c.doc_id) " +
        "SELECT doc_id, phash_true, CAST(0 AS BIGINT) AS dist_band " +
        "FROM ph ORDER BY doc_id"),

    // 4×4 box-filter replay: crop to block multiples, floor-divided means
    "media_resize_exec" ->
      ("WITH dims AS (SELECT doc_id, CAST((12 + doc_id % 13) // 4 AS BIGINT) AS bw, " +
        "CAST((12 + doc_id % 11) // 4 AS BIGINT) AS bh FROM documents), " +
        "pxg AS (SELECT doc_id, bw, bh, t.i % (bw * 4) AS x, t.i // (bw * 4) AS y " +
        "FROM dims, unnest(range(0, bw * 4 * bh * 4)) AS t(i)) " +
        "SELECT doc_id, x // bw AS bx, y // bh AS by, bw * bh AS n_px, " +
        "CAST(sum((doc_id * 7 + x * 3 + y * 5) % 256) // (bw * bh) AS BIGINT) AS r_avg, " +
        "CAST(sum((doc_id * 11 + x * 5 + y * 7) % 256) // (bw * bh) AS BIGINT) AS g_avg, " +
        "CAST(sum((doc_id * 13 + x * 7 + y * 3) % 256) // (bw * bh) AS BIGINT) AS b_avg " +
        "FROM pxg GROUP BY doc_id, bx, by, bw, bh ORDER BY doc_id, by, bx"),
    "media_phash" ->
      (s"WITH $PhashCte SELECT doc_id, phash, n_ones FROM ph ORDER BY doc_id"),
    // Independent replay of media_audio_decode: the oracle NEVER touches
    // WAV bytes — it expands each doc's sample index range and evaluates
    // the affine-mod waveform per sample in SQL. Spark's numbers come from
    // the decoded frames; equality proves the real javax.sound round-trip.
    // Zero crossings avoid a window: sample i-1 is closed-form too.
    "media_audio_decode" ->
      ("WITH spec AS (SELECT doc_id, CAST(180 + doc_id % 101 AS BIGINT) AS n_samples, " +
        "CAST(CASE WHEN doc_id % 2 = 0 THEN 8000 ELSE 16000 END AS BIGINT) AS sample_rate " +
        "FROM documents), " +
        "sm AS (SELECT s.doc_id, s.sample_rate, s.n_samples, " +
        "(s.doc_id * 31 + t.i * 7919) % 4001 - 2000 AS v, " +
        "CASE WHEN t.i > 0 THEN (s.doc_id * 31 + (t.i - 1) * 7919) % 4001 - 2000 END AS pv " +
        "FROM spec s, unnest(range(0, s.n_samples)) AS t(i)) " +
        "SELECT doc_id, sample_rate, n_samples, " +
        "CAST(max(abs(v)) AS BIGINT) AS peak_abs, " +
        "CAST(sum(abs(v)) AS BIGINT) AS sum_abs, " +
        "CAST(sum(v * v) AS BIGINT) AS sum_sq, " +
        "CAST(sum(CASE WHEN pv * v < 0 THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings " +
        "FROM sm GROUP BY doc_id, sample_rate, n_samples ORDER BY doc_id"),
    "media_audio_windows" ->
      ("WITH spec AS (SELECT doc_id, CAST((180 + doc_id % 101) // 4 AS BIGINT) AS len " +
        "FROM documents), " +
        "sm AS (SELECT s.doc_id, t.i // s.len AS win, s.len, " +
        "(s.doc_id * 31 + t.i * 7919) % 4001 - 2000 AS v " +
        "FROM spec s, unnest(range(0, s.len * 4)) AS t(i)) " +
        "SELECT doc_id, win, len AS n_samp, " +
        "CAST(sum(v * v) AS BIGINT) AS energy, " +
        "CAST(max(abs(v)) AS BIGINT) AS peak_abs " +
        "FROM sm GROUP BY doc_id, win, len ORDER BY doc_id, win"),
    "media_phash_nn" ->
      (s"WITH $PhashCte, " +
        "probes AS (SELECT doc_id AS probe_id, phash AS probe_hash FROM ph WHERE doc_id < 10), " +
        "scored AS (SELECT p.probe_id, h.doc_id AS nn_id, " +
        "CAST(bit_count(xor(p.probe_hash, h.phash)) AS BIGINT) AS dist " +
        "FROM probes p, ph h WHERE h.doc_id != p.probe_id), " +
        "best AS (SELECT probe_id, nn_id, dist, " +
        "row_number() OVER (PARTITION BY probe_id ORDER BY dist, nn_id) AS rk FROM scored) " +
        "SELECT probe_id, nn_id, dist FROM best WHERE rk = 1 ORDER BY probe_id")
  )
}
