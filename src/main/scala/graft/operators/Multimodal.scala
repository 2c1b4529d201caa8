package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with a typed metadata struct alongside. The Spark-side
  * machinery — schema, partition-preserving batched decode via
  * `mapPartitions`, feature shape — is real and tested. Decode dispatch:
  * payloads whose container `javax.imageio` recognizes (PNG/BMP/GIF/JPEG —
  * all JDK built-ins, no external library) take the REAL codec path
  * ([[decodeImage]]); audio takes the real `javax.sound` RIFF/WAVE path
  * ([[audioStats]]); video takes the real ISO-BMFF box parser
  * ([[probeMp4]] — container metadata only; FRAME decode needs an
  * H.264/HEVC codec the JDK lacks, so sample payloads stay opaque bytes).
  * Anything else (arbitrary bytes) falls back to the clearly-labeled
  * deterministic stub ([[decodeStub]]) so the pipeline stays testable
  * end-to-end. Swap the fallback for a richer codec (javacv /
  * TwelveMonkeys) without touching anything else.
  *
  * Scale notes: payloads never pass through a shuffle here — decode is a
  * narrow mapPartitions, so 100 TB of media decodes at scan parallelism.
  * Feature extraction outputs (small fixed-size vectors) are what flows
  * into downstream joins/aggregations, never the raw bytes. `ImageIO`'s
  * disk-backed stream cache is disabled (in-memory streams only) so
  * executor-thread decodes never contend on temp files.
  */
object Multimodal {

  javax.imageio.ImageIO.setUseCache(false)

  final case class Asset(asset_id: Long, kind: String, payload: Array[Byte])

  /** `codec` is the container format that actually decoded the payload
    * (lowercase ImageIO format name, e.g. "png"), or "stub" for the
    * fallback path. `sum_sample` is the exact integer sum of band-0 raster
    * samples (real path) / payload bytes (stub) — an oracle-checkable
    * lossless-round-trip witness, unlike the float features.
    */
  final case class DecodedAsset(asset_id: Long, kind: String, n_bytes: Int,
                                width: Int, height: Int, features: Array[Float],
                                sum_sample: Long, codec: String)

  /** Build an asset table from any (id, string) source — the harness has no
    * binary fixture table, so payloads are the UTF-8 bytes of `textCol`.
    */
  def assetsFrom(df: DataFrame, idCol: String, textCol: String,
                 kind: String = "image"): DataFrame =
    df.select(col(idCol).as("asset_id"), lit(kind).as("kind"),
      col(textCol).cast("binary").as("payload"))

  /** 8-dim feature vector: windowed averages of `vals` (0..255 samples),
    * normalized to [0,1]. Empty input gets a zero vector (hi is clamped
    * past n when n == 0, so the unguarded loop would read vals(0)).
    */
  private def windowedMeans(vals: Array[Int]): Array[Float] = {
    val n = vals.length
    if (n == 0) Array.fill(8)(0.0f)
    else Array.tabulate(8) { k =>
      val lo = k * n / 8; val hi = math.max(lo + 1, (k + 1) * n / 8)
      var s = 0L; var i = lo
      while (i < hi) { s += vals(i); i += 1 }
      (s.toDouble / (hi - lo) / 255.0).toFloat
    }
  }

  /** Fallback for payloads no installed codec recognizes — deterministic
    * fake decode so the pipeline is testable end-to-end on non-image
    * bytes. Derives plausible, reproducible values from the bytes
    * themselves; `codec` is honestly reported as "stub".
    */
  def decodeStub(a: Asset): DecodedAsset = {
    val bytes = a.payload
    val n = bytes.length
    def at(i: Int): Int = if (n == 0) 0 else bytes(i % n) & 0xFF
    val width = 64 + (at(0) * 256 + at(1)) % 1024
    val height = 64 + (at(2) * 256 + at(3)) % 1024
    val vals = Array.tabulate(n)(i => bytes(i) & 0xFF)
    DecodedAsset(a.asset_id, a.kind, n, width, height, windowedMeans(vals),
      vals.foldLeft(0L)(_ + _), "stub")
  }

  /** REAL image decode via the JDK's `javax.imageio` (PNG/BMP/GIF/JPEG
    * readers ship with the JRE — zero external dependencies). Returns
    * None when no installed reader recognizes the container (caller falls
    * back to [[decodeStub]]). Width/height come from the decoded frame;
    * features and `sum_sample` read RAW band-0 raster samples
    * (`Raster.getSample`), not `getRGB`, so grayscale PNGs round-trip
    * exactly with no colorspace conversion — that exactness is what lets
    * `mm_decode_png` be DuckDB-oracle-checked down to the integer sum.
    */
  def decodeImage(a: Asset): Option[DecodedAsset] =
    readRaster(a).map { case (codec, w, h, vals) =>
      DecodedAsset(a.asset_id, a.kind, a.payload.length, w, h,
        windowedMeans(vals), vals.foldLeft(0L)(_ + _), codec)
    }

  /** The shared codec front door: (format name, width, height, band-0
    * raster row-major) for any container an installed ImageIO reader
    * recognizes, None otherwise.
    */
  private def readRaster(a: Asset): Option[(String, Int, Int, Array[Int])] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(a.payload))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (iis == null || !readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val codec = reader.getFormatName.toLowerCase(java.util.Locale.ROOT)
          val img = reader.read(0)
          val (w, h) = (img.getWidth, img.getHeight)
          val raster = img.getRaster
          val vals = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { vals(y * w + x) = raster.getSample(x, y, 0); x += 1 }
            y += 1
          }
          Some((codec, w, h, vals))
        } finally reader.dispose()
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Codec dispatch: real ImageIO decode when the container is
    * recognized, labeled stub otherwise.
    */
  def decodeAsset(a: Asset): DecodedAsset =
    decodeImage(a).getOrElse(decodeStub(a))

  /** Batched decode: one partition at a time, preserving partitioning —
    * the Scala analog of a pandas-UDF `mapInPandas` decode stage.
    */
  def decode(spark: SparkSession, assets: DataFrame): Dataset[DecodedAsset] = {
    import spark.implicits._
    assets.as[Asset].mapPartitions(_.map(decodeAsset))
  }

  /** Deterministic tiny grayscale PNG: width = 1 + id%8, height =
    * 1 + id%5, raster sample i (row-major) = (id*31 + i) % 256, encoded
    * with the JDK PNG writer. PNG is lossless, so [[decodeImage]] recovers
    * these exact samples — the fixture generator for the real-codec path
    * (tests and the `mm_decode_png` registered query).
    */
  def syntheticPng(id: Long): Array[Byte] = {
    val w = 1 + (id % 8).toInt
    val h = 1 + (id % 5).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, ((id * 31 + i) % 256).toInt)
        i += 1; x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Richer deterministic grayscale PNG for the perceptual-hash fixture:
    * 16–31 × 16–23 px, sample i = (id·31 + 7·i²) mod 256 — the quadratic
    * term gives every image real texture (dHash bits actually vary), and
    * ids congruent mod 256 with matching dimensions produce EXACT
    * duplicate images (lcm of the size periods divides 256), so the
    * corpus contains a sparse, known family of true near-dups instead of
    * [[syntheticPng]]'s tiny monotone ramps where everything collides.
    */
  def syntheticPngRich(id: Long): Array[Byte] = {
    val w = 16 + (id % 16).toInt
    val h = 16 + (id % 8).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, ((id * 31 + 7L * i * i) % 256).toInt)
        i += 1; x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic grayscale JPEG fixture: width = 8·(1 + id%4), height =
    * 8·(1 + id%3) (whole 8×8 DCT blocks), sample(x, y) = 16 + 2x + 2y +
    * id%64 (a smooth linear ramp, max 187 < 255 so nothing clamps),
    * encoded by the JDK JPEG writer at explicit quality 0.95. JPEG is
    * LOSSY — unlike [[syntheticPng]] the decoded samples are NOT
    * bit-identical to the generator, so the checkable contract is
    * geometry + codec dispatch (exact) plus a bounded reconstruction
    * error against [[syntheticJpegSample]] (see [[jpegRoundTrip]]).
    */
  def syntheticJpeg(id: Long): Array[Byte] = {
    val w = 8 * (1 + (id % 4).toInt)
    val h = 8 * (1 + (id % 3).toInt)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, syntheticJpegSample(id, x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(0.95f)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** The [[syntheticJpeg]] generator formula — shared by the encoder, the
    * round-trip error measurement, and the spec's hand checks.
    */
  def syntheticJpegSample(id: Long, x: Int, y: Int): Int =
    16 + 2 * x + 2 * y + (id % 64).toInt

  final case class JpegParity(asset_id: Long, codec: String, width: Long,
                              height: Long, mean_err_le_2: Boolean,
                              max_err_le_8: Boolean)

  /** Lossy-codec round-trip contract for the JPEG path: encode the
    * deterministic fixture, decode through the REAL `javax.imageio` JPEG
    * reader ([[decodeImage]] dispatch — no stub), and verify (a) codec
    * name and geometry exactly, (b) per-pixel reconstruction error
    * against the generator formula within fixed bounds (mean |err| ≤ 2,
    * max |err| ≤ 8 — far above the ≲1-unit error a 0.95-quality smooth
    * ramp actually shows, far below any real decode defect; the bounds
    * are part of the operator contract so the oracle can assert them as
    * constants). Narrow mapPartitions end-to-end — same scale shape as
    * [[decode]]: payloads never cross a shuffle.
    */
  def jpegRoundTrip(spark: SparkSession, ids: Dataset[Long]): Dataset[JpegParity] = {
    import spark.implicits._
    ids.mapPartitions(_.map { id =>
      val a = Asset(id, "image", syntheticJpeg(id))
      decodeImage(a) match {
        case None =>
          JpegParity(id, "unreadable", -1L, -1L, mean_err_le_2 = false,
            max_err_le_8 = false)
        case Some(d) =>
          // re-decode to raw samples for the error measurement (decodeImage
          // only surfaces the sum; parity needs per-pixel error)
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a.payload))
          val (w, h) = (img.getWidth, img.getHeight)
          val raster = img.getRaster
          var sumErr = 0L; var maxErr = 0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val e = math.abs(raster.getSample(x, y, 0) - syntheticJpegSample(id, x, y))
              sumErr += e; if (e > maxErr) maxErr = e
              x += 1
            }
            y += 1
          }
          JpegParity(id, d.codec, w.toLong, h.toLong,
            mean_err_le_2 = sumErr.toDouble / (w * h) <= 2.0,
            max_err_le_8 = maxErr <= 8)
      }
    })
  }

  /** Resize: recompute the decoded representation at a target geometry.
    * The stub scales the fake feature vector deterministically; a real
    * implementation re-decodes at (w, h). Same narrow-map shape as decode.
    */
  def resize(spark: SparkSession, assets: DataFrame, w: Int, h: Int): Dataset[DecodedAsset] = {
    import spark.implicits._
    assets.as[Asset].mapPartitions(_.map { a =>
      val d = decodeAsset(a)
      val sx = w.toFloat / math.max(1, d.width)
      val sy = h.toFloat / math.max(1, d.height)
      d.copy(width = w, height = h,
        features = d.features.map(f => (f * math.sqrt(sx * sy)).toFloat))
    })
  }

  final case class Frame(asset_id: Long, frame_idx: Int, offset: Int,
                         frame_checksum: Long)

  /** Frame sampling for "video" payloads: k evenly spaced byte windows,
    * each fingerprinted — one input row fans out to k frame rows (the
    * shape a real codec's keyframe sampler produces). Narrow flatMap; the
    * raw payload still never crosses a shuffle.
    */
  def sampleFrames(spark: SparkSession, assets: DataFrame, k: Int): Dataset[Frame] = {
    import spark.implicits._
    assets.as[Asset].flatMap { a =>
      val n = a.payload.length
      if (n == 0) Seq.empty
      else (0 until k).map { i =>
        val off = (i.toLong * n / k).toInt
        // long math: off + chunk can exceed Int.MaxValue for GB payloads
        val until = math.min(n.toLong, off.toLong + math.max(1, n / k)).toInt
        var h = 0xcbf29ce484222325L
        var j = off
        while (j < until) { h ^= a.payload(j) & 0xffL; h *= 0x100000001b3L; j += 1 }
        Frame(a.asset_id, i, off, h)
      }
    }
  }

  /** Pure-expression metadata extraction (no decode): byte length, content
    * checksum, header bytes. This is the cheap pre-filter that runs before
    * any expensive codec work at scale.
    */
  def metadata(assets: DataFrame): DataFrame =
    assets.select(
      col("asset_id"), col("kind"),
      octet_length(col("payload")).as("n_bytes"),
      md5(col("payload")).as("checksum"),
      (ascii(substring(col("payload").cast("string"), 1, 1)) * 256 +
        ascii(substring(col("payload").cast("string"), 2, 1))).as("header_code"))

  final case class LumaSums(asset_id: Long, width: Int, height: Int,
                            n_pixels: Long, sum_luma: Long, sum_sq: Long,
                            min_luma: Int, max_luma: Int)

  final case class HashedAsset(asset_id: Long, width: Int, height: Int,
                               dhash: Long)

  /** 56-bit difference hash over an 8×8 nearest-neighbor grid of the
    * band-0 raster: bit (r·7+c) is set iff grid(r,c) > grid(r,c+1) —
    * the classic perceptual dHash (Krawetz), integer-exact so the same
    * value falls out of any lossless decode of the same image on any
    * engine. Grid index math is plain integer division
    * (gy = r·h/8, gx = c·w/8), reproducible in ANSI SQL.
    */
  def dHash56(vals: Array[Int], w: Int, h: Int): Long = {
    if (w <= 0 || h <= 0 || vals.length < w * h) return 0L
    var hash = 0L
    var r = 0
    while (r < 8) {
      val gy = r * h / 8
      var c = 0
      while (c < 7) {
        val p0 = vals(gy * w + c * w / 8)
        val p1 = vals(gy * w + (c + 1) * w / 8)
        if (p0 > p1) hash |= 1L << (r * 7 + c)
        c += 1
      }
      r += 1
    }
    hash
  }

  /** Decode + perceptual-hash in one narrow pass: real ImageIO raster
    * when the container is recognized, payload bytes as the fake raster
    * on the stub path (same fallback contract as [[decodeAsset]]).
    * Output (asset_id, width, height, dhash) — 12 bytes of signal per
    * image; the raw payload dies inside the partition, which is the
    * whole point at 100 TB.
    */
  def decodeDHash(spark: SparkSession, assets: DataFrame): Dataset[HashedAsset] = {
    import spark.implicits._
    assets.as[Asset].mapPartitions(_.map { a =>
      readRaster(a) match {
        case Some((_, w, h, vals)) =>
          HashedAsset(a.asset_id, w, h, dHash56(vals, w, h))
        case None =>
          val vals = a.payload.map(_ & 0xFF)
          val s = decodeStub(a)
          HashedAsset(a.asset_id, s.width, s.height,
            dHash56(vals, vals.length, 1))
      }
    })
  }

  /** Exact Hamming-≤-`maxHamming` image near-duplicate pairs over dHash
    * values via band blocking: the 56-bit hash splits into four 14-bit
    * bands; any pair within Hamming distance 3 must agree EXACTLY on at
    * least one band (pigeonhole: 3 differing bits can't touch 4 bands),
    * so the band-keyed equi-self-join has guaranteed recall — no
    * all-pairs product anywhere, the same banding argument as
    * MinHash-LSH but exact rather than probabilistic.
    *
    * Scale shape: 4 rows per image into one hash-partitioned self-join
    * on (band, value); candidate dedup + popcount filter after. Skewed
    * buckets (e.g. the all-zero hash of blank images) are real-corpus
    * hotspots — cap or salt them upstream if a corpus has millions of
    * identical blanks.
    */
  def dhashNearDup(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4-band blocking is exact only for maxHamming <= 3, got $maxHamming")
    val bands = hashes.select(col("asset_id"), col("dhash"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("band"),
          shiftright(col("dhash"), i * 14).bitwiseAND(lit(0x3FFFL))
            .as("bval"))): _*)).as("b"))
      .select(col("asset_id"), col("dhash"),
        col("b.band").as("band"), col("b.bval").as("bval"))
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          col("a.asset_id") < col("b.asset_id"))
      .select(col("a.asset_id").as("id_a"), col("b.asset_id").as("id_b"),
        col("a.dhash").as("ha"), col("b.dhash").as("hb"))
      .distinct()
      .select(col("id_a"), col("id_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Per-image luma statistics from the REAL decode path: mean / std /
    * min / max over the decoded grayscale samples — the five-second
    * image-corpus health probe (a black-frame family pins mean near 0;
    * a std collapse flags synthetic flats) and the feature-extraction
    * shape every mm pipeline starts from. The codec `mapPartitions`
    * emits only EXACT integer sums (Σv, Σv² fit longs: 255²·10⁹ pixels
    * < 2⁶³); all float math happens once per image in declarative
    * closed forms, so the whole decode→stat path is engine-checkable
    * against an arithmetic oracle on the synthetic raster.
    */
  def lumaStats(spark: SparkSession, assets: DataFrame): DataFrame = {
    import spark.implicits._
    val sums = assets.as[Asset].mapPartitions(_.flatMap { a =>
      readRaster(a).map { case (_, w, h, vals) =>
        var s = 0L; var s2 = 0L; var mn = 255; var mx = 0
        var i = 0
        while (i < vals.length) {
          val v = vals(i)
          s += v; s2 += v.toLong * v
          if (v < mn) mn = v
          if (v > mx) mx = v
          i += 1
        }
        LumaSums(a.asset_id, w, h, vals.length.toLong, s, s2, mn, mx)
      }
    }).toDF()
    val nd = col("n_pixels").cast("double")
    val mean = col("sum_luma").cast("double") / nd
    sums.select(col("asset_id"), col("width"), col("height"),
      col("n_pixels"),
      graft.functions.Fns.q6(mean).as("mean_luma"),
      graft.functions.Fns.q6(
        sqrt(greatest(col("sum_sq").cast("double") / nd - mean * mean,
          lit(0.0)))).as("std_luma"),
      col("min_luma"), col("max_luma"))
  }

  final case class AudioSums(asset_id: Long, sample_rate: Int,
                             n_samples: Long, sum_s: Long, sum_sq: Long,
                             peak: Long, zero_cross: Long)

  /** Deterministic PCM WAV fixture: 16-bit signed mono at 8 kHz,
    * 64 + (id mod 64) samples, sample_i = ((id·37 + 11·i²) mod 4096) −
    * 2048 — the quadratic phase gives every clip real sign structure
    * (zero crossings vary per id), and the closed form lets the DuckDB
    * oracle recompute the exact waveform arithmetically, so the whole
    * encode→decode→stat path is hash-checked like the PNG fixtures.
    * Encoded through javax.sound.sampled.AudioSystem (the real RIFF/WAVE
    * writer), not a handcrafted header.
    */
  def syntheticWav(id: Long): Array[Byte] = {
    val n = 64 + (id % 64).toInt
    val bytes = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (((id * 37 + 11L * i * i) % 4096) - 2048).toInt
      bytes(2 * i) = (s & 0xff).toByte         // little-endian
      bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Per-clip audio statistics from the REAL decode path
    * (javax.sound.sampled — format sniff, header parse, PCM frame
    * stream): duration, RMS level, peak, DC offset, zero-crossing rate —
    * the audio-corpus health probe (a silent family pins RMS at 0, a
    * clipped one pins peak at full scale, ZCR is the crude
    * speech/music/noise discriminator every audio curation pipeline
    * computes first). Same contract as [[lumaStats]]: the codec
    * `mapPartitions` emits only EXACT integer sums (Σs² ≤ 2048²·frames —
    * longs hold hours of audio), all float math happens once per clip in
    * declarative closed forms, checkable against the arithmetic oracle
    * on the synthetic waveform. Undecodable payloads are skipped
    * (log-and-continue, the Ingest.quarantine discipline).
    */
  def audioStats(spark: SparkSession, assets: DataFrame): DataFrame = {
    import spark.implicits._
    val sums = assets.as[Asset].mapPartitions(_.flatMap { a =>
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(a.payload))
        val fmt = ais.getFormat
        val bytes = ais.readAllBytes()
        val n = bytes.length / 2
        var s = 0L; var s2 = 0L; var peak = 0L; var zc = 0L
        var prev = 0; var i = 0
        while (i < n) {
          val v = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt
          s += v; s2 += v.toLong * v
          if (math.abs(v.toLong) > peak) peak = math.abs(v.toLong)
          if (i > 0 && prev.toLong * v < 0) zc += 1
          prev = v; i += 1
        }
        Some(AudioSums(a.asset_id, fmt.getSampleRate.toInt, n.toLong,
          s, s2, peak, zc))
      } catch { case _: Exception => None }
    }).toDF()
    val nd = col("n_samples").cast("double")
    val mean = col("sum_s").cast("double") / nd
    sums.select(col("asset_id"), col("sample_rate"), col("n_samples"),
      graft.functions.Fns.q6(nd * lit(1000.0) / col("sample_rate").cast("double"))
        .as("duration_ms"),
      graft.functions.Fns.q6(sqrt(col("sum_sq").cast("double") / nd))
        .as("rms"),
      graft.functions.Fns.q6(mean).as("dc_offset"),
      col("peak"), col("zero_cross"),
      graft.functions.Fns.q6(col("zero_cross").cast("double") /
        greatest(nd - lit(1.0), lit(1.0))).as("zcr"))
  }

  // ---- video: ISO-BMFF (MP4) container probe ----

  final case class VideoProbe(asset_id: Long, n_bytes: Long, n_boxes: Int,
                              boxes: String, major_brand: String,
                              minor_version: Long, timescale: Long,
                              duration: Long, duration_sec: Double,
                              width: Int, height: Int, mdat_bytes: Long)

  /** Deterministic ISO-BMFF (MP4) fixture — genuinely VALID box
    * structure per ISO/IEC 14496-12: big-endian 32-bit size + fourcc
    * headers, `ftyp` (major/minor/compatible brands), `moov` holding a
    * real `mvhd` (timescale/duration, unity matrix) and a `trak`/`tkhd`
    * (16.16 fixed-point width/height), a `free` padding box, and an
    * `mdat` payload. Two container variants exercise the format's edge
    * paths: ids ≡ 0 (mod 5) write `mvhd` VERSION 1 (64-bit
    * creation/modification/duration), and ids ≡ 0 (mod 7) write `mdat`
    * with the size==1 LARGESIZE 64-bit header. Every field is a closed
    * form of `id` so the DuckDB oracle recomputes the expected metadata
    * arithmetically and the hash check proves the binary round-trip —
    * the [[syntheticWav]] discipline applied to video.
    *
    * What stays out of scope: FRAME decode. ISO-BMFF carries codec
    * payloads (H.264/HEVC) the JDK has no decoder for, so sample-level
    * work (`mm_frames`' byte-window fingerprints) still treats the mdat
    * as opaque — that boundary is inherent to the container/codec split,
    * not a stub: the container layer here is fully real.
    */
  def syntheticMp4(id: Long): Array[Byte] = {
    def be(vals: (Int, Long)*): Array[Byte] = {          // (byteWidth, value)*
      val bos = new java.io.ByteArrayOutputStream()
      vals.foreach { case (w, v) =>
        var i = w - 1
        while (i >= 0) { bos.write(((v >> (8 * i)) & 0xff).toInt); i -= 1 }
      }
      bos.toByteArray
    }
    def box(tp: String, body: Array[Byte], large: Boolean = false): Array[Byte] = {
      val hdr =
        if (large) be((4, 1L)) ++ tp.getBytes("US-ASCII") ++ be((8, 16L + body.length))
        else be((4, 8L + body.length)) ++ tp.getBytes("US-ASCII")
      hdr ++ body
    }
    val brands = Array("isom", "mp41", "mp42", "avc1")
    val major = brands((id % 4).toInt)
    val minor = id % 512
    val timescale = 600L * (1 + id % 4)
    val durSec = 5L + id % 120
    val duration = timescale * durSec
    val width = 160 + 16 * (id % 54).toInt
    val height = 120 + 9 * (id % 54).toInt
    val unity = be((4, 0x10000L), (4, 0L), (4, 0L), (4, 0L), (4, 0x10000L),
      (4, 0L), (4, 0L), (4, 0L), (4, 0x40000000L))
    val mvhd =
      if (id % 5 == 0)                                   // version 1: 64-bit times
        box("mvhd", be((4, 0x01000000L), (8, 0L), (8, 0L), (4, timescale),
          (8, duration), (4, 0x00010000L), (2, 0x0100L), (2, 0L), (8, 0L)) ++
          unity ++ be((4, 0L), (4, 0L), (4, 0L), (4, 0L), (4, 0L), (4, 0L), (4, 2L)))
      else
        box("mvhd", be((4, 0L), (4, 0L), (4, 0L), (4, timescale),
          (4, duration), (4, 0x00010000L), (2, 0x0100L), (2, 0L), (8, 0L)) ++
          unity ++ be((4, 0L), (4, 0L), (4, 0L), (4, 0L), (4, 0L), (4, 0L), (4, 2L)))
    val tkhd = box("tkhd", be((4, 3L), (4, 0L), (4, 0L), (4, 1L), (4, 0L),
      (4, duration), (8, 0L), (2, 0L), (2, 0L), (2, 0L), (2, 0L)) ++ unity ++
      be((4, width.toLong << 16), (4, height.toLong << 16)))
    val ftyp = box("ftyp", major.getBytes("US-ASCII") ++ be((4, minor)) ++
      "isom".getBytes("US-ASCII"))
    val moov = box("moov", mvhd ++ box("trak", tkhd))
    val free = box("free", new Array[Byte]((id % 32).toInt))
    val mdatBody = Array.tabulate((id % 100).toInt)(i =>
      ((id * 31 + i * 7) % 251).toByte)
    val mdat = box("mdat", mdatBody, large = id % 7 == 0)
    ftyp ++ moov ++ free ++ mdat
  }

  /** REAL ISO-BMFF metadata probe: walks the box tree of each payload —
    * 32-bit and largesize (size==1, 64-bit) headers, nested
    * `moov`→`mvhd` (version 0 AND 1 layouts) and `moov`→`trak`→`tkhd`
    * (16.16 fixed-point geometry) — and emits the per-asset container
    * metadata a video curation pipeline filters on BEFORE any codec
    * work: brand, movie timescale/duration, display geometry, payload
    * size. This is the cheap scan-side gate at 100 TB: a corrupt or
    * wrong-brand file dies here for the cost of reading a few hundred
    * header bytes, never reaching a decoder. Narrow `mapPartitions`
    * (payloads never shuffle); unparseable payloads are skipped
    * (log-and-continue, the Ingest.quarantine discipline).
    */
  def videoProbe(spark: SparkSession, assets: DataFrame): Dataset[VideoProbe] = {
    import spark.implicits._
    assets.as[Asset].mapPartitions(_.flatMap { a =>
      try Some(probeMp4(a.asset_id, a.payload)) catch { case _: Exception => None }
    })
  }

  /** Single-payload ISO-BMFF parse; throws on any structural violation
    * (truncated box, size under 8, trailing garbage) — [[videoProbe]]
    * turns throws into skips.
    */
  def probeMp4(id: Long, bytes: Array[Byte]): VideoProbe = {
    def u32(o: Int): Long =
      ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    def u64(o: Int): Long = (u32(o) << 32) | u32(o + 4)
    def fourcc(o: Int): String =
      new String(bytes, o, 4, "US-ASCII")
    // (type, bodyStart, bodyEnd) for each box in [from, to); validates
    // declared sizes tile the range exactly.
    def walk(from: Int, to: Int): Seq[(String, Int, Int)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
      var o = from
      while (o < to) {
        require(o + 8 <= to, s"truncated box header at $o")
        val sz32 = u32(o)
        val tp = fourcc(o + 4)
        val (bodyStart, end) =
          if (sz32 == 1L) {                              // 64-bit largesize
            require(o + 16 <= to, s"truncated largesize at $o")
            (o + 16, o + u64(o + 8))
          } else if (sz32 == 0L) (o + 8, to.toLong)      // box runs to EOF
          else (o + 8, o + sz32)
        require(end >= bodyStart && end <= to, s"box $tp overruns at $o")
        out += ((tp, bodyStart, end.toInt))
        o = end.toInt
      }
      out.toSeq
    }
    val top = walk(0, bytes.length)
    val (ftS, ftE) = top.find(_._1 == "ftyp")
      .map(b => (b._2, b._3)).getOrElse(sys.error("no ftyp"))
    require(ftE - ftS >= 8, "ftyp too short")
    val majorBrand = fourcc(ftS)
    val minorVersion = u32(ftS + 4)
    val (mvS, mvE) = top.find(_._1 == "moov")
      .map(b => (b._2, b._3)).getOrElse(sys.error("no moov"))
    val moovKids = walk(mvS, mvE)
    val (hS, _) = moovKids.find(_._1 == "mvhd")
      .map(b => (b._2, b._3)).getOrElse(sys.error("no mvhd"))
    val mvhdVersion = bytes(hS) & 0xff
    val (timescale, duration) =
      if (mvhdVersion == 1) (u32(hS + 20), u64(hS + 24))
      else (u32(hS + 12), u32(hS + 16))
    val (w, h) = moovKids.find(_._1 == "trak").map { trak =>
      val (tS, _) = walk(trak._2, trak._3).find(_._1 == "tkhd")
        .map(b => (b._2, b._3)).getOrElse(sys.error("no tkhd"))
      val tkhdVersion = bytes(tS) & 0xff
      val geomOff = if (tkhdVersion == 1) tS + 88 else tS + 76
      // 16.16 fixed point — integer part only
      ((u32(geomOff) >> 16).toInt, (u32(geomOff + 4) >> 16).toInt)
    }.getOrElse(sys.error("no trak"))
    val mdatBytes = top.find(_._1 == "mdat")
      .map(b => (b._3 - b._2).toLong).getOrElse(0L)
    VideoProbe(id, bytes.length.toLong, top.size,
      top.map(_._1).mkString(","), majorBrand, minorVersion,
      timescale, duration,
      BigDecimal(duration.toDouble / timescale)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      w, h, mdatBytes)
  }
}
