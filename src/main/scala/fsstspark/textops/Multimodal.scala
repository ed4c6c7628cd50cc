package fsstspark.textops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in batched
  * per-partition passes (the Scala analogue of `mapInPandas`: one
  * iterator pass, per-batch amortized setup, bounded memory).
  *
  * The actual media decode is STUBBED — this container ships no
  * image/audio libraries — behind [[MediaDecoder]]: the deterministic
  * fake implementation derives "features" from byte statistics so the
  * Spark-side schema, batching, partitioning, and tests are fully real;
  * swapping in a real decoder is a one-class change.
  */
object Multimodal {

  /** What a real decoder would return for one media payload. */
  final case class MediaFeatures(
      key: String,
      media_type: String,
      n_bytes: Long,
      width: Int, // fake: derived, deterministic
      height: Int,
      channels: Int,
      mean_intensity: Double,
      feature: Array[Float] // fixed-dim embedding-like vector
  )

  /** Decoder seam. Replace with a real implementation (JNI/javacv/...)
    * without touching the pipeline. Must be deterministic per payload.
    */
  trait MediaDecoder extends Serializable {
    def decode(key: String, mediaType: String, payload: Array[Byte]): MediaFeatures
  }

  /** Deterministic fake: dimensions/intensity/feature are pure functions
    * of the payload bytes (so tests can assert exact round-trips and
    * partitioning invariance).
    */
  object FakeDecoder extends MediaDecoder {
    final val FeatureDim = 16
    def decode(key: String, mediaType: String, payload: Array[Byte]): MediaFeatures = {
      val n = if (payload == null) 0 else payload.length
      var sum = 0L
      var h = 1469598103934665603L
      var i = 0
      while (i < n) {
        sum += payload(i) & 0xff
        h = (h ^ (payload(i) & 0xff)) * 1099511628211L
        i += 1
      }
      val w = 64 + (math.abs(h % 1024)).toInt
      val feat = new Array[Float](FeatureDim)
      var f = h
      i = 0
      while (i < FeatureDim) {
        f = f * 6364136223846793005L + 1442695040888963407L
        feat(i) = (f >>> 40).toFloat / (1 << 24).toFloat - 0.5f
        i += 1
      }
      MediaFeatures(key, mediaType, n.toLong, w, (w * 3) / 4, 3,
        if (n == 0) 0.0 else sum.toDouble / n, feat)
    }
  }

  /** Batched feature extraction over an opaque binary column. One decoder
    * instance per partition (amortized setup, like a Pandas UDF's
    * per-batch model load); output is a typed Dataset ready for the ANN
    * operators ([[AnnSearch]]) or the stats pass.
    */
  def extractFeatures(
      df: DataFrame, keyCol: String, payloadCol: String, mediaType: String,
      decoder: MediaDecoder = FakeDecoder
  ): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string").as("key"), col(payloadCol).cast("binary").as("payload"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        val d = decoder // per-partition init seam
        it.map { case (k, p) => d.decode(k, mediaType, p) }
      }
  }

  /** Deterministic frame sampling for a (fake) video payload: cut the
    * byte stream into `frameBytes` windows and keep every `stride`-th —
    * the partition/batch shape of real frame extraction.
    */
  def sampleFrames(
      df: DataFrame, keyCol: String, payloadCol: String,
      frameBytes: Int = 4096, stride: Int = 10
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string").as("key"), col(payloadCol).cast("binary").as("payload"))
      .as[(String, Array[Byte])]
      .flatMap { case (k, p) =>
        if (p == null) Iterator.empty
        else {
          val nFrames = p.length / frameBytes
          Iterator.range(0, nFrames, stride).map { fi =>
            (k, fi, java.util.Arrays.copyOfRange(p, fi * frameBytes, (fi + 1) * frameBytes))
          }
        }
      }
      .toDF("key", "frame_idx", "frame")
  }
}
