package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Streaming twin of the m7 curation pipeline's ingest → normalize →
  * redact → exact-dedup front (pipeline/TextPipeline stages 0–3) —
  * the shape a live corpus feed runs: documents arrive as files, each
  * micro-batch is normalized (t6), PII-redacted (t8), deduped within
  * itself, then anti-joined against the SINK's already-ingested
  * content hashes and appended.
  *
  * Dedup state is the sink table, not stream memory: at 100 TB the
  * seen-hash set cannot live in executor state (and
  * `dropDuplicates` without a watermark would try exactly that —
  * unbounded); the sink-side anti-join reads only the hash column
  * (parquet column pruning) and is idempotent under at-least-once
  * replays — re-delivered files dedup to zero appended rows, the
  * same recovery discipline as EventsStream.ingestLoop
  * (database/__init__.py:623–664's re-run-failed-rows mapped to
  * batches).
  */
object CurationStream {

  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** t6 normalization as a reusable column (same expression as
    * TextPipeline's normalize stage). */
  private def cleaned: org.apache.spark.sql.Column =
    trim(regexp_replace(regexp_replace(
      lower(col("text")), "[\\p{Cntrl}]", ""), " {2,}", " "))

  /** One micro-batch of curation: normalize, redact, in-batch dedup
    * (min doc_id per content hash — deterministic survivor),
    * sink-side anti-join, append. Package-visible so the spec can
    * drive it directly against canned batches. */
  private[graft] def curateBatch(batch: DataFrame, sinkDir: String): Unit = {
    val spark = batch.sparkSession
    val normalized = batch
      .withColumn("text", graft.queries.TextOps.redact(cleaned))
      .withColumn("content_hash", md5(col("text")))
    val inBatchKeep = normalized
      .groupBy(col("content_hash")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val batchUnique = normalized.join(inBatchKeep, Seq("doc_id"))
    val fresh =
      if (!new java.io.File(sinkDir).exists()) batchUnique
      else {
        // only the hash column is read — parquet prunes the rest
        val seen = spark.read.parquet(sinkDir).select(col("content_hash"))
        batchUnique.join(seen, Seq("content_hash"), "left_anti")
      }
    fresh
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"), col("content_hash"))
      .write.mode("append").parquet(sinkDir)
  }

  /** Start the streaming ingest: file-source stream over `srcDir`,
    * foreachBatch curation into `sinkDir`. */
  def ingestLoop(spark: SparkSession, srcDir: String, sinkDir: String,
      checkpointDir: String): StreamingQuery =
    spark.readStream.schema(documentsSchema).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        curateBatch(batch, sinkDir)
      }
      .start()
}
