package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support (SURVEY.md §7 M7): media as opaque `binary`
  * columns with a typed metadata struct, processed partition-parallel.
  *
  * Design: media bytes never leave the executor; decode/feature-extract/
  * resize/frame-sample run via `Dataset.mapPartitions` (the Scala-native
  * equivalent of PySpark's `mapInPandas` batch UDF shape — an iterator of
  * rows per partition, so a real decoder could batch onto an accelerator).
  * The actual image/audio codecs are STUBBED with deterministic fakes
  * (this container ships no media libs); the Spark-side plumbing —
  * schema, encoders, partitioning, batch iteration — is real and tested.
  *
  * At 100 TB: binary columns stay columnar in parquet (no row-group
  * bloat for metadata-only readers since parquet prunes unprojected
  * columns), and every transform below is embarrassingly parallel with
  * no shuffle.
  */
object Multimodal {

  /** Typed media metadata carried next to the bytes. */
  case class MediaMeta(kind: String, width: Int, height: Int, durationMs: Long)
  case class MediaRow(id: Long, media: Array[Byte], meta: MediaMeta)
  case class FeatureRow(id: Long, features: Array[Float])
  case class FrameRow(id: Long, frameIdx: Int, frame: Array[Byte])

  /** Pack a text column as a media table (UTF-8 bytes + metadata) — the
    * fixture-side stand-in for ingesting real image/audio blobs. */
  def packText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      encode(col(textCol), "UTF-8").as("media"),
      struct(lit("text").as("kind"), lit(0).as("width"), lit(0).as("height"),
        lit(0L).as("durationMs")).as("meta"))

  /** STUB decoder: a real implementation would decode the codec here
    * (JPEG→pixels, PCM→samples); the fake derives a deterministic `dim`-
    * float feature vector from the bytes so tests can assert exact
    * values. Runs per-partition over an iterator — the batch shape a GPU
    * decoder needs. */
  def decodeFeatures(ds: Dataset[MediaRow], dim: Int): Dataset[FeatureRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        // ---- STUB: deterministic fake decode (no media libs in env) ----
        val feats = new Array[Float](dim)
        var h = 1125899906842597L
        var i = 0
        while (i < r.media.length) { h = 31 * h + (r.media(i) & 0xff); i += 1 }
        var d = 0
        while (d < dim) {
          val z = h + (d + 1) * 0x9e3779b97f4a7c15L
          feats(d) = ((z ^ (z >>> 33)) & 0xffff).toFloat / 65535.0f
          d += 1
        }
        FeatureRow(r.id, feats)
      }
    }
  }

  /** STUB resize: truncate/zero-pad media bytes to `targetBytes` (a real
    * impl would rescale pixels); keeps schema + nullability honest. */
  def resize(ds: Dataset[MediaRow], targetBytes: Int): Dataset[MediaRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        val out = java.util.Arrays.copyOf(r.media, targetBytes)
        MediaRow(r.id, out, r.meta.copy(width = targetBytes))
      }
    }
  }

  /** STUB frame sampler: split media bytes into fixed-size chunks, one
    * output row per sampled "frame" (every `stride`-th chunk). */
  def frameSample(ds: Dataset[MediaRow], frameBytes: Int, stride: Int): Dataset[FrameRow] = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      val nChunks = (r.media.length + frameBytes - 1) / frameBytes
      (0 until nChunks by stride).map { c =>
        val from = c * frameBytes
        val until = math.min(from + frameBytes, r.media.length)
        FrameRow(r.id, c, java.util.Arrays.copyOfRange(r.media, from, until))
      }
    }
  }
}
