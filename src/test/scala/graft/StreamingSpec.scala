package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{CurationStream, EventsStream}

class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions",
      "org.apache.spark.sql.graftx.GraftExtensions")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def stageEvents(): String = {
    val dir = Files.createTempDirectory("events_stream").toString
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      Paths.get(dir, "events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir
  }

  test("streaming hourly agg drains to the batch result (S10 twin)") {
    val dir = stageEvents()
    val q = EventsStream.hourlyAgg(spark, dir).writeStream
      .outputMode("complete").format("memory").queryName("hourly").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql(
      "SELECT hour, event_type, n, sum_value FROM hourly")
      .collect().map(_.toString).sorted
    val batch = graft.queries.Relational.s10HourlyEvents(
        spark, "/root/testdata/sf0.001")
      .collect().map(_.toString).sorted
    assert(streamed.nonEmpty)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("session_window stream drains to the batch w10 result (native session state)") {
    val dir = stageEvents()
    val q = EventsStream.sessionWindowAgg(spark, dir).writeStream
      .outputMode("complete").format("memory").queryName("sessw").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql(
      "SELECT user_id, s_start_us, n_events, total FROM sessw")
      .collect().map(_.toString).sorted
    val batch = graft.queries.Extras.w10SessionWindow(
        spark, "/root/testdata/sf0.001")
      .collect().map(_.toString).sorted
    assert(streamed.nonEmpty)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("session_window boundary: exactly-gap merges, gap+1µs splits (w3-identical)") {
    import spark.implicits._
    val gapUs = 30L * 60 * 1000 * 1000
    val ev = Seq(
      (1L, 0L, 1L, "view", 1.0),
      (2L, gapUs * 1000, 1L, "view", 2.0), // exactly gap later → MERGES
      (3L, (2 * gapUs + 1) * 1000, 1L, "view", 4.0)) // gap+1µs → splits
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = graft.queries.Extras.sessionWindowOf(ev)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got === Seq(
      (1L, 0L, 2L, 3.0),
      (1L, 2 * gapUs + 1, 1L, 4.0)))
  }

  test("stream-stream interval join drains to the batch pair set (j8 twin)") {
    val dir = stageEvents()
    val q = EventsStream.intervalJoin(spark, dir).writeStream
      .outputMode("append").format("memory").queryName("sjoin").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql("SELECT click_id, purchase_id FROM sjoin")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    // batch twin over the same fixture: purchases in [click-60s, click]
    val ev = Tables(spark, "/root/testdata/sf0.001", "events")
    val c = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("cts"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("pu"), col("ts").as("pts"))
    val batch = c.join(p, col("user_id") === col("pu") &&
        col("pts") >= col("cts") - lit(60L * 1000 * 1000 * 1000) &&
        col("pts") <= col("cts"))
      .select(col("click_id"), col("purchase_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(streamed.nonEmpty)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("stateful per-user session counts accumulate (mapGroupsWithState)") {
    val dir = stageEvents()
    val q = EventsStream.sessionCounts(spark, dir).writeStream
      .outputMode("update").format("memory").queryName("sessions").start()
    q.processAllAvailable(); q.stop()
    val got = spark.sql("SELECT * FROM sessions")
    // last update per user must match the batch per-user counts
    val latest = got.groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n_events"))
    val batch = Tables(spark, "/root/testdata/sf0.001", "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    val joined = latest.join(batch, "user_id")
      .where(col("n_events") =!= col("n"))
    assert(joined.count() === 0)
  }

  test("watermarked streaming dedup drops replayed events (D1 twin)") {
    // stage the SAME file twice: an at-least-once replay — every
    // event arrives twice and must survive exactly once
    val dir = Files.createTempDirectory("events_dup").toString
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      Paths.get(dir, "events_a.parquet"), StandardCopyOption.REPLACE_EXISTING)
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      Paths.get(dir, "events_b.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val q = EventsStream.dedupStream(spark, dir).writeStream
      .outputMode("append").format("memory").queryName("deduped").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql("SELECT event_id FROM deduped")
    val batchDistinct = Tables(spark, "/root/testdata/sf0.001", "events")
      .select("event_id").distinct().count()
    assert(streamed.count() === batchDistinct)
    // no identity key appears twice downstream
    assert(streamed.groupBy("event_id").count()
      .where(col("count") > 1).count() === 0)
  }

  test("foreachBatch ingest loop lands deduped parquet (connector shape)") {
    val dir = stageEvents()
    val out = Files.createTempDirectory("ingest_out").toString + "/rset"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stream = spark.readStream.schema(EventsStream.eventsSchema)
      .parquet(dir)
    val q = EventsStream.ingestLoop(stream, out, "event_id")
    q.processAllAvailable(); q.stop()
    val n = spark.read.parquet(out).count()
    val expected = Tables(spark, "/root/testdata/sf0.001", "events").count()
    assert(n === expected)
  }

  test("streaming curation ingest: normalize + dedup against the sink (m7 twin)") {
    import spark.implicits._
    val src = Files.createTempDirectory("cur_src").toString
    val sink = Files.createTempDirectory("cur_sink").toString + "/corpus"
    val ckpt = Files.createTempDirectory("cur_ckpt").toString
    Files.copy(Paths.get("/root/testdata/sf0.001/documents.parquet"),
      Paths.get(src, "batch1.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val q = CurationStream.ingestLoop(spark, src, sink, ckpt)
    q.processAllAvailable()
    // batch twin of stages 0–3: distinct md5(redacted normalized text)
    val norm = graft.queries.TextOps.redact(trim(regexp_replace(regexp_replace(
      lower(col("text")), "[\\p{Cntrl}]", ""), " {2,}", " ")))
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val expected1 = docs.select(md5(norm)).distinct().count()
    assert(spark.read.parquet(sink).count() === expected1)

    // batch 2: re-deliveries of existing docs (new ids, same text)
    // plus genuinely new docs
    val dupes = docs.limit(5)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"))
    val newDocs = Seq(
      (2000001L, "a genuinely new streaming document", "en", "stream", 34L),
      (2000002L, "another fresh document from the stream", "en", "stream", 38L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // the flat file-source glob wants FILES in src, not nested dirs:
    // write to a scratch dir, then move the part file in
    def deliver(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("cur_batch").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, Paths.get(src, name),
        StandardCopyOption.REPLACE_EXISTING)
    }
    deliver(dupes.unionByName(newDocs), "batch2.parquet")
    q.processAllAvailable()
    val afterBatch2 = spark.read.parquet(sink)
    assert(afterBatch2.count() === expected1 + 2,
      "re-delivered texts must dedup against the sink; new docs append")
    // survivors are unique by content hash
    assert(afterBatch2.groupBy("content_hash").count()
      .where(col("count") > 1).count() === 0)

    // replay: the same content under a new file name appends nothing
    deliver(dupes.unionByName(newDocs), "batch2_replay.parquet")
    q.processAllAvailable(); q.stop()
    assert(spark.read.parquet(sink).count() === expected1 + 2)
  }

  test("bloom-gated curation: fresh admits, replays block, crash order is safe") {
    import spark.implicits._
    val sink = Files.createTempDirectory("bloom_sink").toString + "/corpus"
    val bloom = Files.createTempDirectory("bloom_state").toString + "/seen.bloom"
    def batchDf(rows: Seq[(Long, String)]) = rows.map { case (id, t) =>
      (id, t, "en", "stream", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")

    // batch 1 bootstraps sink and filter
    CurationStream.curateBatch(
      batchDf(Seq(1L -> "alpha doc", 2L -> "beta doc")), sink, Some(bloom))
    assert(spark.read.parquet(sink).count() === 2)
    assert(Files.isRegularFile(Paths.get(bloom)))

    // batch 2: one replayed text under a new id + one fresh doc
    CurationStream.curateBatch(
      batchDf(Seq(3L -> "alpha doc", 4L -> "gamma doc")), sink, Some(bloom))
    val after2 = spark.read.parquet(sink)
    assert(after2.count() === 3)
    assert(after2.groupBy("content_hash").count()
      .where(col("count") > 1).count() === 0)

    // full replay of batch 2 appends nothing
    CurationStream.curateBatch(
      batchDf(Seq(3L -> "alpha doc", 4L -> "gamma doc")), sink, Some(bloom))
    assert(spark.read.parquet(sink).count() === 3)

    // crash order: put a hash in the BLOOM that is not in the sink
    // (a batch ran against another sink sharing the filter — same
    // state as dying between the filter write and the append). The
    // resulting false positive must be verified away, not drop the row.
    val scratch = Files.createTempDirectory("bloom_scratch").toString + "/corpus"
    CurationStream.curateBatch(
      batchDf(Seq(9L -> "delta doc")), scratch, Some(bloom))
    CurationStream.curateBatch(
      batchDf(Seq(10L -> "delta doc")), sink, Some(bloom))
    assert(spark.read.parquet(sink).count() === 4,
      "a bloom hit without a sink row is a false positive and must still append")
  }

  test("d12 bloom dedup stream drains to the batch verdicts (completion-watch twin)") {
    // the d12 fixture split at sf0.001: corpus = doc_id % 89 != 0,
    // incoming = the % 89 slice, landed as THREE separate files so the
    // stream sees multiple micro-batches
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val isNew = pmod(col("doc_id"), lit(89)) === 0
    val corpus = docs.where(!isNew)
    val incoming = docs.where(isNew)

    val src = Files.createTempDirectory("bloom_src").toString
    val sink = Files.createTempDirectory("bloom_sink").toString + "/verdicts"
    val ckpt = Files.createTempDirectory("bloom_ckpt").toString
    incoming.where(pmod(col("doc_id"), lit(3)) === 0)
      .write.parquet(s"$src/b0")
    incoming.where(pmod(col("doc_id"), lit(3)) === 1)
      .write.parquet(s"$src/b1")
    incoming.where(pmod(col("doc_id"), lit(3)) === 2)
      .write.parquet(s"$src/b2")
    // the file source walks the dir tree; each subdir's file is its
    // own input file, so maxFilesPerTrigger=1 forces 3 micro-batches
    val q = graft.streaming.BloomDedupStream.start(
      spark, s"$src/*", sink, ckpt, corpus, k = 20, fpp = 0.01)
    q.processAllAvailable(); q.stop()

    val streamed = spark.read.parquet(sink)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).sortBy(_._1).toSeq
    val batch = graft.queries.DedupOps
      .bloomDedupOf(corpus, incoming, k = 20, fpp = 0.01)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).sortBy(_._1).toSeq
    assert(streamed === batch,
      "drained per-doc verdicts must equal the one-shot batch d12 output")
    assert(streamed.nonEmpty && streamed.exists(_._4),
      "fixture sanity: the incoming slice contains at least one dup")

    // at-least-once replay: re-appended verdict rows must dedup away
    spark.read.parquet(sink).limit(3).write.mode("append").parquet(sink)
    val replayed = graft.streaming.BloomDedupStream
      .drainedVerdicts(spark, sink)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).sortBy(_._1).toSeq
    assert(replayed === batch,
      "a replayed micro-batch must not duplicate drained verdicts")
  }

  test("sk1 HLL register stream drains to the batch sketch bit-for-bit") {
    // keyed token stream split into 3 micro-batches; merged per-bucket
    // MAX registers must rebuild the exact batch sketch state AND
    // estimate (max is associative + idempotent, so the partitioning
    // is invisible)
    val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .select(col("l_returnflag"), col("l_partkey").cast("string").as("tok"))
    val src = Files.createTempDirectory("hll_src").toString
    val sink = Files.createTempDirectory("hll_sink").toString + "/regs"
    val ckpt = Files.createTempDirectory("hll_ckpt").toString
    (0 to 2).foreach { i =>
      li.where(pmod(col("tok").cast("long"), lit(3)) === i)
        .write.parquet(s"$src/b$i")
    }
    val q = graft.streaming.SketchStream.startHll(spark, s"$src/*", sink, ckpt)
    q.processAllAvailable(); q.stop()

    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val streamed = canon(
      graft.streaming.SketchStream.mergedHllEstimate(spark, sink))
    val batch = canon(graft.operators.DetHll.estimate(
      graft.operators.DetHll.registers(li, Seq("l_returnflag"), col("tok")),
      Seq("l_returnflag"), "approx_parts").orderBy(col("l_returnflag")))
    assert(streamed === batch,
      "merged register deltas must equal the one-shot batch HLL sketch")
    assert(streamed.nonEmpty && streamed.forall(_._2 > 0))
  }

  test("sk3 CMS register stream drains to the batch heavy hitters bit-for-bit") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val src = Files.createTempDirectory("cms_src").toString
    val regSink = Files.createTempDirectory("cms_regs").toString + "/regs"
    val candSink = Files.createTempDirectory("cms_cand").toString + "/cand"
    val ckpt = Files.createTempDirectory("cms_ckpt").toString
    (0 to 2).foreach { i =>
      docs.where(pmod(col("doc_id"), lit(3)) === i)
        .write.parquet(s"$src/b$i")
    }
    val q = graft.streaming.SketchStream.startCms(
      spark, s"$src/*", regSink, candSink, ckpt)
    q.processAllAvailable(); q.stop()

    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(r => (-r._2, r._1))
      .toSeq
    val streamed = canon(graft.streaming.SketchStream
      .mergedHeavyHitters(spark, regSink, candSink, 10000L))
    val batch = canon(
      graft.operators.DetCms.heavyHittersOf(docs, 10000L))
    assert(streamed === batch,
      "summed register deltas must equal the one-shot batch CMS output")
    assert(streamed.nonEmpty,
      "fixture sanity: the corpus has at least one 1%-support token")

    // at-least-once replay: re-append one batch's sink rows verbatim
    // (what a foreachBatch retry after a crash between the two sink
    // writes does) — the batch_id dedup must keep the merge unchanged
    val reg0 = spark.read.parquet(regSink)
    val replayId = reg0.agg(min(col("batch_id"))).collect()(0).getLong(0)
    reg0.where(col("batch_id") === replayId)
      .write.mode("append").parquet(regSink)
    val cand0 = spark.read.parquet(candSink)
    cand0.where(col("batch_id") === replayId)
      .write.mode("append").parquet(candSink)
    val replayed = canon(graft.streaming.SketchStream
      .mergedHeavyHitters(spark, regSink, candSink, 10000L))
    assert(replayed === batch,
      "a replayed micro-batch must not double-count CMS cells")
  }

  test("d14 minhash probe stream drains to the batch verdicts (signature-table twin)") {
    // the d14 fixture split at sf0.001: history = doc_id % 10 != 0,
    // incoming = the % 10 slice, landed as three files
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val isNew = pmod(col("doc_id"), lit(10)) === 0
    val history = docs.where(!isNew)
    val incoming = docs.where(isNew)

    val src = Files.createTempDirectory("mh_src").toString
    val sink = Files.createTempDirectory("mh_sink").toString + "/verdicts"
    val ckpt = Files.createTempDirectory("mh_ckpt").toString
    (0 to 2).foreach { i =>
      incoming.where(pmod(col("doc_id"), lit(3)) === i)
        .write.parquet(s"$src/b$i")
    }
    val q = graft.streaming.MinhashProbeStream.start(
      spark, s"$src/*", sink, ckpt, history)
    q.processAllAvailable(); q.stop()

    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e9), r.getBoolean(3)))
      .sortBy(_._1).toSeq
    val streamed = canon(spark.read.parquet(sink))
    val batch = canon(SparkEntry.queries("d14_incremental_minhash")(
      spark, "/root/testdata/sf0.001"))
    assert(streamed === batch,
      "drained per-doc best matches must equal the one-shot batch d14 output")
    assert(streamed.exists(_._4),
      "fixture sanity: the incoming slice contains at least one near-dup")

    // at-least-once replay: re-append a slice of verdict rows verbatim
    // (a foreachBatch retry) — drainedVerdicts must stay exact
    val some = spark.read.parquet(sink).limit(5)
    some.write.mode("append").parquet(sink)
    assert(canon(graft.streaming.MinhashProbeStream
      .drainedVerdicts(spark, sink)) === batch,
      "a replayed micro-batch must not duplicate drained verdicts")
  }
}
