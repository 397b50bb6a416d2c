package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming twin of d14 (incremental near-dup probe against a
  * materialized signature table) — the second half of the ingest
  * story beside BloomDedupStream: documents land as files, the corpus
  * HISTORY's minhash signature table is built ONCE at stream start
  * (the persisted-signature-table surface d2's scaladoc promises,
  * pinned with an eager localCheckpoint), and every micro-batch signs
  * only ITSELF and band-joins the checkpointed history for its best
  * match.
  *
  * Scale shape: per-batch cost is the batch's shingle→hash→agg pass
  * plus a band-key equi-join against the history signatures — the
  * history never recomputes, never reshuffles on anything wider than
  * its band keys. A doc's verdict depends only on (doc, history), so
  * the drained union over any micro-batch partitioning equals the
  * one-shot batch d14 output (StreamingSpec asserts the drained
  * equality). */
object MinhashProbeStream {

  /** Build-once history signature table (k/bands/shingleN must match
    * the per-batch signing below — same constants as d14). */
  def prepare(history: DataFrame, k: Int = 16, bands: Int = 2,
      shingleN: Int = 3): DataFrame =
    graft.operators.MinHash.signatures(history, "doc_id", "text",
      k = k, bands = bands, shingleN = shingleN, materialize = false)
      .localCheckpoint(true)

  /** File-source stream over `srcDir`; per-batch best-match verdicts
    * append to `sinkDir` as parquet. */
  def start(spark: SparkSession, srcDir: String, sinkDir: String,
      checkpointDir: String, history: DataFrame, k: Int = 16,
      bands: Int = 2, shingleN: Int = 3): StreamingQuery = {
    val hist = prepare(history, k, bands, shingleN)
    spark.readStream.schema(BloomDedupStream.docsSchema).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val batchSig = graft.operators.MinHash.signatures(batch,
          "doc_id", "text", k = k, bands = bands, shingleN = shingleN,
          materialize = false)
        graft.queries.DedupOps.incrementalProbeOf(batchSig, hist)
          .write.mode("append").parquet(sinkDir)
      }
      .start()
  }

  /** Replay-safe sink reader: foreachBatch is at-least-once, so a
    * retried micro-batch re-appends its verdict rows. Verdicts are a
    * pure function of (doc, history) — every copy is identical — so
    * the per-doc dedup here makes the drained table exact under any
    * number of replays (the SketchStream batch_id discipline;
    * appends stay cheap, the dedup rides the read). */
  def drainedVerdicts(spark: SparkSession, sinkDir: String): DataFrame =
    spark.read.parquet(sinkDir).dropDuplicates("doc_id")

  /** The round-9 lake-native variant: tail a VERSIONED documents
    * table through the `graftv` streaming source (version numbers as
    * checkpointed offsets — each micro-batch is exactly the docs the
    * appends since the last offset added, never a rescan) and land
    * verdicts EXACTLY-ONCE into a versioned output table via the
    * per-app txn ledger ([[graft.sources.Versioned.commitIfAbsent]]).
    * Unlike [[start]]'s parquet-append sink, no read-side dedup is
    * needed: a replayed micro-batch is refused at commit time, so
    * `Versioned.read(out)` IS the exact drained table. The lake must
    * already have ≥1 committed version (the source infers its schema
    * from the log). */
  def startOnLake(spark: SparkSession, lakePath: String, outTable: String,
      checkpointDir: String, history: DataFrame, k: Int = 16,
      bands: Int = 2, shingleN: Int = 3): StreamingQuery = {
    val hist = prepare(history, k, bands, shingleN)
    spark.readStream.format("graftv").load(lakePath)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val batchSig = graft.operators.MinHash.signatures(batch,
          "doc_id", "text", k = k, bands = bands, shingleN = shingleN,
          materialize = false)
        graft.sources.Versioned.commitIfAbsent(
          graft.queries.DedupOps.incrementalProbeOf(batchSig, hist),
          outTable, "minhash-probe", batchId)
        ()
      }
      .start()
  }
}
