package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed metadata for an opaque media blob. */
final case class MediaMeta(
    width: Int, height: Int, durationMs: Long, format: String)

/** A media row: opaque `binary` content + typed metadata — the multimodal
  * column convention for the pipeline (images/audio/video travel as bytes;
  * structure lives in `meta`). */
final case class MediaFile(
    media_id: Long, kind: String, content: Array[Byte], meta: MediaMeta)

final case class MediaFeatures(media_id: Long, kind: String, features: Array[Float])

final case class Frame(media_id: Long, frame_idx: Int, content: Array[Byte])

/** Multimodal column operators: decode / feature-extract / resize /
  * frame-sample over `binary` columns.
  *
  * The Spark-side plumbing is real — schema, per-partition batched
  * processing, even partitioning by media id so one hot partition doesn't
  * serialize the decode — while the codec itself is a STUB (this
  * environment has no image/audio libraries): `decodeStub` derives a
  * deterministic feature vector from the bytes, so every op is testable
  * end-to-end and swapping in a real codec changes one function.
  *
  * At 100 TB: blobs stay in parquet binary columns (scan-pruned when a
  * query only needs `meta`), decode runs once per partition batch via
  * `mapPartitions` (JVM-side; the Python twin would be `mapInPandas` with
  * arrow batches), and `repartition(media_id)` spreads decode cost evenly.
  */
object Multimodal {

  val featureDim = 16

  /** STUB CODEC — deterministic fake standing in for a real image/audio
    * decoder (none available in this container). Real implementation:
    * decode bytes → pixels/samples → model features. The fake folds the
    * bytes into `featureDim` accumulators so output depends on every input
    * byte and is reproducible across engines and runs. */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val acc = new Array[Float](featureDim)
    var i = 0
    while (i < bytes.length) {
      acc(i % featureDim) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    if (bytes.length > 0) acc.map(_ / bytes.length) else acc
  }

  /** Batched feature extraction: one decode pass per partition, constant
    * memory per batch. `repartition` first so decode cost spreads evenly
    * across executors regardless of source file layout. */
  def extractFeatures(media: Dataset[MediaFile],
                      partitions: Int = 0): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    val even =
      if (partitions > 0) media.repartition(partitions, col("media_id"))
      else media
    even.mapPartitions { it =>
      it.grouped(64).flatMap { batch => // bounded batch shape, arrow-like
        batch.iterator.map(m =>
          MediaFeatures(m.media_id, m.kind, decodeStub(m.content)))
      }
    }
  }

  /** Resize: new blob + updated meta. The pixel work is the stub (truncate/
    * pad bytes to the target size deterministically); meta tracking and
    * schema evolution are the real contract. */
  def resize(media: Dataset[MediaFile], w: Int, h: Int): Dataset[MediaFile] = {
    import media.sparkSession.implicits._
    media.map { m =>
      val target = w * h
      val out = java.util.Arrays.copyOf(m.content, target)
      m.copy(content = out, meta = m.meta.copy(width = w, height = h))
    }
  }

  /** Frame sampling for video blobs: one output row per sampled frame,
    * frame bytes sliced deterministically from the blob (stub for a real
    * frame decoder). flatMap — no shuffle; downstream ops see frames as
    * independent rows. */
  def sampleFrames(media: Dataset[MediaFile], everyMs: Long): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val n = math.max(1, (m.meta.durationMs / math.max(1, everyMs)).toInt)
      val chunk = math.max(1, m.content.length / n)
      (0 until n).map { i =>
        val from = math.min(i * chunk, m.content.length)
        val until = math.min(from + chunk, m.content.length)
        Frame(m.media_id, i, java.util.Arrays.copyOfRange(m.content, from, until))
      }
    }
  }

  /** Metadata-only projection — must prune the binary column at the scan
    * (the reason content and meta live in separate columns). */
  def metaProfile(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("kind"), col("meta.*"))
      .groupBy("kind", "format")
      .agg(count(lit(1)).as("n"), avg("durationMs").as("avg_duration_ms"))
}
