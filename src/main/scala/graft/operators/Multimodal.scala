package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star extension): image/audio/
  * video as opaque binary columns with typed metadata, decode/
  * feature-extract as partition-batched kernels.
  *
  * The decode step itself is a STUB — no image/audio libraries exist
  * in this environment — but everything Spark-side is real: schema,
  * partitioning, batch shape (kernels consume a partition in fixed-
  * size batches exactly like an Arrow/pandas-UDF boundary would),
  * and deterministic outputs so the pipeline is testable. Swapping
  * `stubDecode` for a real JNI/Arrow decoder changes no plan shape.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String,
      payload: Array[Byte], width: Int, height: Int, n_frames: Int)
  final case class MediaFeatures(media_id: Long, kind: String,
      feature: Seq[Double], decoded_bytes: Int)
  final case class Frame(media_id: Long, frame_idx: Int, payload: Array[Byte])

  /** Deterministic fake media table derived from the documents text
    * (payload = utf-8 bytes): stands in for a real binary column. */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables(spark, dir, "documents")
      .repartition(col("doc_id"))
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        MediaRow(id, kind, text.getBytes("UTF-8"),
          width = (nChars % 64).toInt + 32, height = 32,
          n_frames = (nChars % 7).toInt + 1)
      }
  }

  /** STUB decode: byte-histogram 8-bin feature in partition batches.
    * A real decoder would do the same loop with the image lib inside
    * — the batching, schema and determinism are the contract. */
  def decodeFeatures(media: Dataset[MediaRow],
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch => // Arrow-batch-shaped boundary
        batch.map { m =>
          val hist = new Array[Double](8)
          m.payload.foreach(b => hist((b & 0xFF) / 32) += 1.0)
          val n = math.max(m.payload.length, 1)
          MediaFeatures(m.media_id, m.kind, hist.map(_ / n).toSeq,
            m.payload.length)
        }
      }
    }
  }

  /** Frame sampling for video rows: every `rate`-th frame (the MD
    * subsample O8 generalized to media). */
  def sampleFrames(media: Dataset[MediaRow], rate: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      (0 until m.n_frames).filter(_ % rate == 0).map { i =>
        val chunk = math.max(m.payload.length / math.max(m.n_frames, 1), 1)
        val from = math.min(i * chunk, m.payload.length)
        val until = math.min(from + chunk, m.payload.length)
        Frame(m.media_id, i, m.payload.slice(from, until))
      }
    }
  }

  /** Query-surface entry: decode features summary per kind. */
  def featureSummary(spark: SparkSession, dir: String): DataFrame = {
    decodeFeatures(mediaFromDocuments(spark, dir)).toDF()
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("decoded_bytes")), 4).as("avg_bytes"),
        round(avg(element_at(col("feature"), 4)), 6).as("avg_bin3"))
      .orderBy(col("kind"))
  }
}
