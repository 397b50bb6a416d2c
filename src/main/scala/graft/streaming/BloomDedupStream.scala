package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Streaming twin of d12 (Bloom-gated incremental window dedup) —
  * the completion-watch ingestion shape (the reference polls for
  * finished compute and ingests results as they land; here documents
  * land as files and each micro-batch is screened against the corpus
  * history): the Bloom filter and the corpus window-hash relation are
  * built ONCE at stream start (`DedupOps.bloomStateOf`), every
  * micro-batch probes them (`DedupOps.bloomProbeOf`) and appends its
  * per-doc verdicts to the sink.
  *
  * Scale shape, which is the point of the twin: per-batch cost is
  * proportional to the BATCH (its window explode + the broadcast
  * filter probe); the corpus history never recomputes, never
  * reshuffles — the only history touch is the exact-verify semi-join
  * of the (tiny) flagged hash set against the checkpointed window
  * relation. Batching is invisible to the result: a doc's verdict
  * depends only on (doc, corpus), so the drained union over any
  * micro-batch partitioning equals the one-shot batch d12 output —
  * StreamingSpec asserts exactly that (the w10 drained-equality
  * discipline). */
object BloomDedupStream {

  val docsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  /** Build-once probe state over the corpus history. The window
    * relation is pinned with an eager localCheckpoint so per-batch
    * exact-verify joins re-read computed blocks instead of re-running
    * the corpus window explode (the SessionTable discipline; a
    * production deployment persists this relation — and the
    * serialized filter, CurationStream.loadBloom-style — once per
    * corpus snapshot). */
  def prepare(corpus: DataFrame, k: Int, fpp: Double)
      : (DataFrame, Option[org.apache.spark.util.sketch.BloomFilter]) = {
    // bloomStateOf pins the window relation itself since round 17 —
    // re-checkpointing here would double-persist the same blocks
    graft.queries.DedupOps.bloomStateOf(corpus, k, fpp)
  }

  /** File-source stream over `srcDir`; each micro-batch's verdicts
    * append to `sinkDir` as parquet. */
  def start(spark: SparkSession, srcDir: String, sinkDir: String,
      checkpointDir: String, corpus: DataFrame, k: Int,
      fpp: Double): StreamingQuery = {
    val (corWins, bloom) = prepare(corpus, k, fpp)
    spark.readStream.schema(docsSchema).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.queries.DedupOps.bloomProbeOf(corWins, bloom, batch, k)
          .write.mode("append").parquet(sinkDir)
      }
      .start()
  }

  /** Replay-safe sink reader: foreachBatch is at-least-once, so a
    * retried micro-batch re-appends its verdict rows; verdicts are a
    * pure function of (doc, pinned corpus state), so per-doc dedup
    * makes the drained table exact under replays (the SketchStream
    * batch_id discipline). */
  def drainedVerdicts(spark: SparkSession, sinkDir: String): DataFrame =
    spark.read.parquet(sinkDir).dropDuplicates("doc_id")
}
