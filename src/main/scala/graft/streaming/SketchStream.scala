package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Streaming twins for the SKETCH family (sk1 HLL, sk3 CMS) — the
  * mergeable-state ingestion shape that d12/d14's probe-only twins
  * don't cover: each micro-batch emits its own fixed-size REGISTER
  * DELTAS to an append sink, and the drained sketch is rebuilt by the
  * sketch's own merge law (per-bucket MAX for HLL registers, cell-wise
  * integer SUM for CMS counters). Because both merges are associative,
  * commutative and (for MAX) idempotent, the micro-batch partitioning
  * is invisible: the merged state — and therefore the deterministic
  * estimate built on it — equals the one-shot batch sketch
  * BIT-FOR-BIT, not just within an error bound. StreamingSpec asserts
  * exactly that against the sk1/sk3 batch entries (the w10
  * drained-equality discipline).
  *
  * Scale shape: per-batch cost is the batch's own token scan + one
  * vocab-bounded shuffle; what lands in the sink per batch is
  * O(registers) (≤ 4096 rows/key for HLL, ≤ 16384 for CMS) plus, for
  * sk3's pigeonhole candidate tier, the batch's (source, token)
  * support counts (vocab-bounded by Heaps' law). History is never
  * rescanned and never reshuffled — merging reads only register-sized
  * relations. This is the production shape for continuous corpus
  * statistics at 100 TB: register deltas land beside the data, the
  * estimate is a register-table query, and re-partitioning the
  * ingestion never changes a published number. */
object SketchStream {

  /** sk1's input shape: a keyed token stream. */
  val tokSchema: StructType = StructType(Seq(
    StructField("l_returnflag", StringType),
    StructField("tok", StringType)))

  /** File-source stream of (l_returnflag, tok); each micro-batch
    * appends its per-key HLL register deltas (bucket, mx) to
    * `sinkDir`. */
  def startHll(spark: SparkSession, srcDir: String, sinkDir: String,
      checkpointDir: String): StreamingQuery =
    spark.readStream.schema(tokSchema).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.DetHll
          .registers(batch, Seq("l_returnflag"), col("tok"))
          .write.mode("append").parquet(sinkDir)
      }
      .start()

  /** Merge drained HLL register deltas (per-bucket MAX — idempotent,
    * so replayed batches cannot corrupt the state either) and build
    * the deterministic estimate. Equals the batch sk1 sketch state
    * bit-for-bit. */
  def mergedHllEstimate(spark: SparkSession, sinkDir: String): DataFrame = {
    val regs = spark.read.parquet(sinkDir)
      .groupBy(col("l_returnflag"), col("bucket"))
      .agg(max(col("mx")).as("mx"))
    graft.operators.DetHll
      .estimate(regs, Seq("l_returnflag"), "approx_parts")
      .orderBy(col("l_returnflag"))
  }

  /** sk3's input shape: the documents stream. */
  val docsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("text", StringType)))

  /** File-source stream of documents; each micro-batch appends (a)
    * its CMS register deltas to `regSink` and (b) its (source, token)
    * support counts to `candSink` — both additive under SUM.
    *
    * Replay safety: foreachBatch is only at-least-once, and unlike the
    * HLL path's MAX merge a SUM merge is NOT idempotent — a micro-batch
    * replayed after a failure between the two sink writes (or before
    * the checkpoint commit) would double-count. So every sink row
    * carries its `batch_id`, and the merge side collapses replays with
    * a per-(batch_id, cell) MAX before the cross-batch SUM (a batch's
    * recompute is deterministic, so duplicate rows are identical and
    * MAX ≡ any-of). */
  def startCms(spark: SparkSession, srcDir: String, regSink: String,
      candSink: String, checkpointDir: String): StreamingQuery =
    spark.readStream.schema(docsSchema).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val toks = graft.operators.DetCms.tokensOf(batch)
        val counts = toks.groupBy(col("token"))
          .agg(count(lit(1)).as("n"))
        graft.operators.DetCms.registers(counts)
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(regSink)
        toks.groupBy(col("source"), col("token"))
          .agg(count(lit(1)).as("sn"))
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(candSink)
      }
      .start()

  /** Merge drained CMS deltas (cell-wise SUM) + support counts, then
    * run the same candidate → estimate → φ-gate pipeline as the batch
    * sk3 entry. Equals DetCms.heavyHittersOf on the union of all
    * batches bit-for-bit — including under at-least-once replays,
    * because each batch's rows are deduped on batch_id before the SUM
    * (see startCms). */
  def mergedHeavyHitters(spark: SparkSession, regSink: String,
      candSink: String, phiMicro: Long): DataFrame = {
    val regs = spark.read.parquet(regSink)
      .groupBy(col("batch_id"), col("r"), col("bucket"))
      .agg(max(col("cnt")).as("cnt"))
      .groupBy(col("r"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
    val srcCnt = spark.read.parquet(candSink)
      .groupBy(col("batch_id"), col("source"), col("token"))
      .agg(max(col("sn")).as("sn"))
      .groupBy(col("source"), col("token"))
      .agg(sum(col("sn")).as("sn"))
    val totals = srcCnt.agg(
      sum(col("sn")).as("n_mass"),
      countDistinct(col("source")).as("n_src"))
    val cand = srcCnt.crossJoin(broadcast(totals))
      .where(col("sn") * col("n_src") * lit(1000000L) >=
        lit(phiMicro) * col("n_mass"))
      .select(col("token")).distinct()
    graft.operators.DetCms.estimate(cand, regs)
      .crossJoin(broadcast(totals))
      .where(col("est_count") * lit(1000000L) >= lit(phiMicro) * col("n_mass"))
      .select(col("token"), col("est_count"))
      .orderBy(col("est_count").desc, col("token"))
  }
}
