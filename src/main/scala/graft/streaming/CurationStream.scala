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

  /** Fixed Bloom parameters: every per-batch filter is built with the
    * SAME capacity/fpp so `mergeInPlace` is legal across batches (the
    * bitset size is a function of these constants). ~1.2 MB per 10⁶
    * capacity at 1 % — at a larger deployment these become config. */
  private val BloomCapacity = 1000000L
  private val BloomFpp = 0.01

  /** One micro-batch of curation: normalize, redact, in-batch dedup
    * (min doc_id per content hash — deterministic survivor),
    * sink-side anti-join, append. Package-visible so the spec can
    * drive it directly against canned batches.
    *
    * With `bloomPath` set, a persistent Bloom filter over the sink's
    * content hashes gates the anti-join (the d12 discipline carried
    * into streaming): rows whose hash the filter does NOT contain are
    * certainly fresh — no false negatives — and skip the sink scan
    * entirely; only the flagged slice anti-joins against the sink's
    * hash column. Crash safety preserves idempotence by ORDER: the
    * filter is updated (merge + atomic rename) BEFORE the append, so
    * the invariant is bloom ⊇ sink at every instant — a crash between
    * the two leaves a false positive (verified away next run), never
    * a false negative (which would re-admit a duplicate on replay). */
  private[graft] def curateBatch(batch: DataFrame, sinkDir: String,
      bloomPath: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    val normalized = batch
      .withColumn("text", graft.queries.TextOps.redact(cleaned))
      .withColumn("content_hash", md5(col("text")))
    val inBatchKeep = normalized
      .groupBy(col("content_hash")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val batchUnique = normalized.join(inBatchKeep, Seq("doc_id"))
    val sinkExists = new java.io.File(sinkDir).exists()
    val prior = bloomPath.filter(_ => sinkExists).flatMap(loadBloom)
    val fresh =
      if (!sinkExists) batchUnique
      else prior match {
        case Some(bloom) =>
          val bc = spark.sparkContext.broadcast(bloom)
          val flaggedCol = udf((h: String) => bc.value.mightContainString(h))
            .apply(col("content_hash"))
          val seen = spark.read.parquet(sinkDir).select(col("content_hash"))
          batchUnique.where(!flaggedCol) // certainly fresh
            .unionByName(batchUnique.where(flaggedCol)
              .join(seen, Seq("content_hash"), "left_anti"))
        case None =>
          // only the hash column is read — parquet prunes the rest
          val seen = spark.read.parquet(sinkDir).select(col("content_hash"))
          batchUnique.join(seen, Seq("content_hash"), "left_anti")
      }
    // localCheckpoint: `fresh` is consumed twice below (bloom build +
    // append) and must not observe the bloom file/sink mid-update
    val pinned = fresh
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"), col("content_hash"))
      .localCheckpoint(true)
    try {
      // stat.bloomFilter NPEs on an empty relation (null agg buffer
      // in 4.x) — and an empty fresh set has nothing to merge anyway
      bloomPath.filter(_ => !pinned.isEmpty).foreach { path =>
        val add = pinned.stat.bloomFilter("content_hash",
          BloomCapacity, BloomFpp)
        prior.foreach(add.mergeInPlace)
        val tmp = java.nio.file.Paths.get(path + ".tmp")
        val out = java.nio.file.Files.newOutputStream(tmp)
        try add.writeTo(out) finally out.close()
        java.nio.file.Files.move(tmp, java.nio.file.Paths.get(path),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
      pinned.write.mode("append").parquet(sinkDir)
    } finally pinned.unpersist()
  }

  private def loadBloom(path: String):
      Option[org.apache.spark.util.sketch.BloomFilter] = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.isRegularFile(p)) None
    else {
      val in = java.nio.file.Files.newInputStream(p)
      try Some(org.apache.spark.util.sketch.BloomFilter.readFrom(in))
      finally in.close()
    }
  }

  /** Start the streaming ingest: file-source stream over `srcDir`,
    * foreachBatch curation into `sinkDir`. `bloomPath` enables the
    * persistent Bloom gate on the sink anti-join. */
  def ingestLoop(spark: SparkSession, srcDir: String, sinkDir: String,
      checkpointDir: String, bloomPath: Option[String] = None): StreamingQuery =
    spark.readStream.schema(documentsSchema).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        curateBatch(batch, sinkDir, bloomPath)
      }
      .start()
}
