package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY §2.10). The reference has no
  * watermark/window streaming — its streams are MD trajectories (S10)
  * and the DFT-results ingestion loop; both map onto file-source
  * streams here. Windowed aggregation + watermark handles the
  * trajectory/event shape; `foreachBatch` reconciliation handles
  * completed-calculation ingestion (database/__init__.py:623–664
  * recovery maps to re-running the batch on failed rows).
  */
object EventsStream {

  /** events.parquet ENGINE-FACING schema (ts = epoch-nanos long — the
    * same boundary contract as graft.Tables). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over an events dir, normalized to the nanos-
    * long `ts` contract whatever the fixture's physical type (the
    * graft.Tables discipline: TIMESTAMP(NANOS) reads as raw long via
    * nanosAsLong; TIMESTAMP(MICROS) reads as an instant — NTZ
    * inference off so unix_micros() is the raw stored integer — and
    * converts). A streaming source needs its schema up front, so the
    * physical schema is sniffed from a batch footer read; an
    * empty-at-start dir falls back to the declared nanos-long schema
    * (files that arrive later must then match it). */
  private def readEvents(spark: SparkSession, srcDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val phys = scala.util.Try(spark.read.parquet(srcDir).schema)
      .getOrElse(eventsSchema)
    val src = spark.readStream.schema(phys).parquet(srcDir)
    if (src.schema("ts").dataType == LongType) src
    else src.withColumn("ts", expr("unix_micros(ts) * 1000"))
  }

  private def withEventTime(df: DataFrame): DataFrame =
    df.withColumn("ets", timestamp_micros(expr("ts div 1000")))

  /** Hourly windowed aggregation with watermark — the streaming twin
    * of the batch `s10_hourly_events` query (results must agree when
    * the stream is drained; the spec asserts exactly that). */
  def hourlyAgg(spark: SparkSession, srcDir: String): DataFrame = {
    val src = readEvents(spark, srcDir)
    withEventTime(src)
      .withWatermark("ets", "2 hours")
      .groupBy(window(col("ets"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("hour"),
        col("event_type"), col("n"), col("sum_value"))
  }

  /** Streaming exact dedup with bounded state — the ingest-time twin
    * of the batch D1 dedup: `dropDuplicatesWithinWatermark` on the
    * record's identity key (event_id — the idempotency key for
    * at-least-once replays, the analog of D1's content hash). Plain
    * `dropDuplicates("event_id")` would NEVER evict its seen-keys
    * state (the watermark only bounds state when the event-time
    * column is part of the key set); the WithinWatermark variant
    * keys state on event_id alone but expires entries once the
    * watermark passes their event time — bounded state with identity
    * keying. Late duplicates beyond the horizon are the accepted
    * trade, exactly as in batch backfill dedup windows. Keying on
    * identity keeps the survivor deterministic: two DIFFERENT events
    * are never conflated. */
  def dedupStream(spark: SparkSession, srcDir: String,
      horizon: String = "2 hours"): DataFrame = {
    val src = readEvents(spark, srcDir)
    withEventTime(src)
      .withWatermark("ets", horizon)
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("ets"))
  }

  /** Stream-stream interval join with watermarks on BOTH unbounded
    * sides — the remaining §2.10 surface beside windowed agg, bounded
    * dedup, and custom state: each click joins the same user's
    * purchases from the preceding 60 s. State is bounded by
    * construction: both sides carry a watermark and the join
    * condition time-bounds purchase_ts against click_ts, so the
    * framework can evict click state once the purchase watermark
    * passes `click_ts` and purchase state once the click watermark
    * passes `purchase_ts + 60s` — the two conditions Structured
    * Streaming REQUIRES before it will run an inner stream-stream
    * join at all. The batch twin is the j8 range-join shape; the spec
    * drains this stream and asserts set equality with the batch
    * pairs. */
  def intervalJoin(spark: SparkSession, srcDir: String,
      horizon: String = "1 hour"): DataFrame = {
    val clicks = withEventTime(readEvents(spark, srcDir))
      .where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ets").as("click_ts"))
      .withWatermark("click_ts", horizon)
    val purchases = withEventTime(readEvents(spark, srcDir))
      .where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col("ets").as("purchase_ts"))
      .withWatermark("purchase_ts", horizon)
    clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") - expr("interval 60 seconds") &&
        col("purchase_ts") <= col("click_ts"))
      .select(col("click_id"), col("user_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"))
  }

  /** W10's STREAMING twin — gap-based sessionization via the BUILT-IN
    * `session_window` (dynamic merging session state, the idiomatic
    * Spark operator for this; `sessionCounts` below is the
    * custom-state teaching shape). Same logical aggregation as the
    * batch `Extras.sessionWindowOf` — StreamingSpec drains it and
    * asserts exact equality with the batch result. Watermark bounds
    * the session state at the horizon. */
  def sessionWindowAgg(spark: SparkSession, srcDir: String,
      horizon: String = "1 hour"): DataFrame = {
    val src = withEventTime(readEvents(spark, srcDir))
      .withWatermark("ets", horizon)
    src.groupBy(col("user_id"),
        session_window(col("ets"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("total"))
      .select(col("user_id"), unix_micros(col("sw.start")).as("s_start_us"),
        col("n_events"), col("total"))
  }

  final case class Event(event_id: Long, ts: Long, user_id: Long,
      event_type: String, value: Double)
  final case class SessionState(count: Long, sum: Double, lastTsMicros: Long)
  final case class SessionOut(user_id: Long, n_events: Long, total: Double)

  /** Stateful per-user sessionization via mapGroupsWithState
    * (KeyValueGroupedDataset custom state — the §2.10 "custom state"
    * surface; the reference's closest analog is the per-iteration
    * active-set growth, active.py:158–205). */
  def sessionCounts(spark: SparkSession, srcDir: String): Dataset[SessionOut] = {
    import spark.implicits._
    val src = readEvents(spark, srcDir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value")).as[Event]
    src.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionOut](
        GroupStateTimeout.NoTimeout) { (uid, events, state) =>
        val prev = state.getOption.getOrElse(SessionState(0L, 0.0, 0L))
        var count = prev.count
        var total = prev.sum
        var last = prev.lastTsMicros
        events.foreach { e =>
          count += 1; total += e.value
          val m = e.ts / 1000
          if (m > last) last = m
        }
        state.update(SessionState(count, total, last))
        SessionOut(uid, count, math.round(total * 10000).toDouble / 10000)
      }
  }

  /** foreachBatch ingestion pattern: drain a stream into a parquet
    * "rset" with per-batch key dedup — the calculator-results
    * connector loop (SURVEY §2.10 Spark mapping). foreachBatch is
    * at-least-once: a retried batch re-appends its (deterministic)
    * rows, so consumers read the rset through [[readRset]], which
    * restores exactly-once semantics with a per-key dedup. */
  def ingestLoop(stream: DataFrame, outPath: String, keyCol: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.dropDuplicates(keyCol).write.mode("append").parquet(outPath)
      }
      .start()

  /** Replay-safe rset reader (see [[ingestLoop]]). */
  def readRset(spark: org.apache.spark.sql.SparkSession, outPath: String,
      keyCol: String): DataFrame =
    spark.read.parquet(outPath).dropDuplicates(keyCol)
}
