package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with a typed metadata struct alongside. The Spark-side
  * machinery — schema, partition-preserving batched decode via
  * `mapPartitions`, feature shape — is real and tested; the actual codec
  * call is STUBBED (deterministic fake) because no image/audio libraries
  * ship in this environment. Swap `decodeStub` for a real codec (e.g.
  * javacv / TwelveMonkeys) without touching anything else.
  *
  * Scale notes: payloads never pass through a shuffle here — decode is a
  * narrow mapPartitions, so 100 TB of media decodes at scan parallelism.
  * Feature extraction outputs (small fixed-size vectors) are what flows
  * into downstream joins/aggregations, never the raw bytes.
  */
object Multimodal {

  final case class Asset(asset_id: Long, kind: String, payload: Array[Byte])
  final case class DecodedAsset(asset_id: Long, kind: String, n_bytes: Int,
                                width: Int, height: Int, features: Array[Float])

  /** Build an asset table from any (id, string) source — the harness has no
    * binary fixture table, so payloads are the UTF-8 bytes of `textCol`.
    */
  def assetsFrom(df: DataFrame, idCol: String, textCol: String,
                 kind: String = "image"): DataFrame =
    df.select(col(idCol).as("asset_id"), lit(kind).as("kind"),
      col(textCol).cast("binary").as("payload"))

  /** ??? in spirit — deterministic fake decode so the pipeline is testable
    * end-to-end. A real implementation parses the container header and
    * decodes frames; this derives plausible, reproducible values from the
    * bytes themselves.
    */
  def decodeStub(a: Asset): DecodedAsset = {
    val bytes = a.payload
    val n = bytes.length
    def at(i: Int): Int = if (n == 0) 0 else bytes(i % n) & 0xFF
    val width = 64 + (at(0) * 256 + at(1)) % 1024
    val height = 64 + (at(2) * 256 + at(3)) % 1024
    // Fake 8-dim feature vector: windowed byte averages, normalized.
    // Empty payloads get a zero vector (hi is clamped past n when n == 0,
    // so the unguarded loop would read bytes(0)).
    val features =
      if (n == 0) Array.fill(8)(0.0f)
      else Array.tabulate(8) { k =>
        val lo = k * n / 8; val hi = math.max(lo + 1, (k + 1) * n / 8)
        var s = 0L; var i = lo
        while (i < hi) { s += (bytes(i) & 0xFF); i += 1 }
        (s.toDouble / (hi - lo) / 255.0).toFloat
      }
    DecodedAsset(a.asset_id, a.kind, n, width, height, features)
  }

  /** Batched decode: one partition at a time, preserving partitioning —
    * the Scala analog of a pandas-UDF `mapInPandas` decode stage.
    */
  def decode(spark: SparkSession, assets: DataFrame): Dataset[DecodedAsset] = {
    import spark.implicits._
    assets.as[Asset].mapPartitions(_.map(decodeStub))
  }

  /** Resize: recompute the decoded representation at a target geometry.
    * The stub scales the fake feature vector deterministically; a real
    * implementation re-decodes at (w, h). Same narrow-map shape as decode.
    */
  def resize(spark: SparkSession, assets: DataFrame, w: Int, h: Int): Dataset[DecodedAsset] = {
    import spark.implicits._
    assets.as[Asset].mapPartitions(_.map { a =>
      val d = decodeStub(a)
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
}
