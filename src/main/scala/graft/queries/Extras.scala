package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.WeightedMean

/** Second wave of oracle-checked operators: custom typed aggregation
  * (A6), small-dim broadcast lookups (K1 vegard), semi-structured
  * JSON extraction, and window lag analytics.
  */
object Extras {

  /** A6 `quantities` with a registry aggregator: weighted mean price
    * by quantity per return flag via a custom typed Aggregator
    * (map-side partial agg — one shuffle of (sum, weight) pairs). */
  def a6WeightedMean(s: SparkSession, dir: String): DataFrame = {
    val wm = udaf(WeightedMean)
    Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(round(wm(col("l_extendedprice"), col("l_quantity")), 4)
        .as("wavg_price"))
  }

  /** K1 vegard: concentration-weighted lattice parameter from a
    * broadcast `latpars` dimension (reference: matdb/data.py:19–40).
    * The lookup table is a broadcast literal — at 100 TB the alloy
    * table is the big side and never shuffles. */
  def k1Vegard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val latpars = Seq(("Ag", 4.09), ("Pd", 3.89), ("Cu", 3.615))
      .toDF("el", "latpar")
    val alloys = Seq(
      ("AgPd50", "Ag", 0.5), ("AgPd50", "Pd", 0.5),
      ("AgCu25", "Ag", 0.75), ("AgCu25", "Cu", 0.25),
      ("PdCu50", "Pd", 0.5), ("PdCu50", "Cu", 0.5))
      .toDF("alloy", "el", "conc")
    alloys.join(broadcast(latpars), "el")
      .groupBy(col("alloy"))
      .agg(round(sum(col("conc") * col("latpar")), 6).as("a0"))
  }

  /** Semi-structured extraction: events.props is a JSON string —
    * pull `$.k` and aggregate (the open-schema params spill surface
    * of §1.2 exercised relationally). */
  def x1JsonProps(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        (sum(col("k")).cast("double") / count(col("k"))).as("avg_k"))
      .orderBy(col("event_type"))

  /** Window lag: average per-user inter-event value delta by type
    * (the Spark-native analytics surface; deterministic ordering by
    * (user_id, ts, event_id)). */
  def w2LagDelta(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables(s, dir, "events")
      .withColumn("prev", lag(col("value"), 1).over(w))
      .where(col("prev").isNotNull)
      .withColumn("delta", col("value") - col("prev"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(avg(col("delta")), 6).as("avg_delta"))
  }

  /** W9 event-type transition matrix: first-order Markov transition
    * counts and probabilities over per-user event sequences (the
    * behavioral-analytics twin of t11's bigram LM — "what follows
    * what"). One user_id-keyed sort-window for the lag, then the
    * corpus collapses into a |types|²-sized relation; the per-row
    * probability normalizes within the prev_type row via a window
    * over that tiny relation. Probabilities are integer ppm so the
    * DuckDB compare is exact. */
  def w9Transitions(s: SparkSession, dir: String): DataFrame =
    transitionsOf(Tables(s, dir, "events"))

  /** The w9 kernel over an arbitrary (user_id, ts, event_id,
    * event_type) relation — spec-testable with hand sequences. */
  def transitionsOf(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val counts = events
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .where(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val wp = Window.partitionBy(col("prev_type"))
    counts
      .withColumn("row_tot", sum(col("n")).over(wp))
      .select(col("prev_type"), col("event_type").as("next_type"), col("n"),
        round(col("n") * lit(1e6) / col("row_tot"), 0).cast("long")
          .as("p_ppm"))
  }

  /** W10 gap-based sessionization via the BUILT-IN `session_window`
    * (w3 computes the same sessions with the lag/cumsum idiom; this
    * surface is the native operator, and the one whose STREAMING twin
    * — `EventsStream.sessionWindowAgg`, identical aggregation under a
    * watermark — runs unchanged on an unbounded stream; StreamingSpec
    * asserts drained equality). Session identity is exposed as the
    * window START (min event ts, epoch micros) rather than w3's
    * ordinal, which is what makes the output join-able across batch
    * and stream. Boundary semantics: session windows are INCLUSIVE of
    * the gap endpoint — an event exactly gap after its predecessor
    * MERGES (spec-pinned), identical to w3's >-split lag idiom, and
    * the oracle mirrors >. One user_id shuffle; session merging is
    * group-local. */
  def w10SessionWindow(s: SparkSession, dir: String): DataFrame =
    sessionWindowOf(Tables(s, dir, "events"))

  /** The w10 kernel over an arbitrary (user_id, ts-nanos, value)
    * relation — shared by the batch query and the streaming twin's
    * drained-equality spec. */
  def sessionWindowOf(events: DataFrame): DataFrame =
    events
      .withColumn("ets", timestamp_micros(expr("ts div 1000")))
      .groupBy(col("user_id"),
        session_window(col("ets"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("total"))
      .select(col("user_id"), unix_micros(col("sw.start")).as("s_start_us"),
        col("n_events"), col("total"))
      .orderBy(col("user_id"), col("s_start_us"))

  /** W11 engaged time — per-user UNION of fixed attention windows:
    * each event opens a half-open interval [ts, ts+5 min); overlapping
    * intervals merge; output is interval count and total engaged
    * time. This is the "time actually spent" metric session counts
    * over-estimate (w3/w10 span idle gaps inside a session; the
    * interval union doesn't) — and the same running-max span-merge
    * arithmetic d15 applies to duplicate text spans, applied to time.
    * One user_id sort-window (running max of interval ends marks
    * merge starts), then two keyed aggs. Nanos are multiples of
    * 1000, so engaged_us is exact in both engines. */
  def w11EngagedTime(s: SparkSession, dir: String): DataFrame =
    engagedTimeOf(Tables(s, dir, "events"), windowSecs = 300L)

  /** The w11 kernel over an arbitrary (user_id, ts-nanos, event_id)
    * relation — spec-testable with hand interval layouts. */
  def engagedTimeOf(events: DataFrame, windowSecs: Long): DataFrame = {
    val winNs = windowSecs * 1000000000L
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val marked = events
      .withColumn("prev_end",
        max(col("ts") + lit(winNs))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("is_new",
        when(col("prev_end").isNull || col("ts") >= col("prev_end"), 1)
          .otherwise(0))
    marked
      .withColumn("grp", sum(col("is_new")).over(w))
      .groupBy(col("user_id"), col("grp"))
      .agg(min(col("ts")).as("s"), max(col("ts") + lit(winNs)).as("e"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_intervals"),
        (sum(col("e") - col("s")) / lit(1000L)).cast("long").as("engaged_us"))
  }

  /** O6/O7 deterministic "random" sample: rank by a keyed digest —
    * engine-independent, unlike rand(seed) (the reference persists
    * shuffle ids for exactly this reason; a content-keyed rank IS the
    * persisted id). */
  def o6Sample(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "part")
      .withColumn("rk", md5(concat_ws(":", lit(42), col("p_partkey"))))
      .orderBy(col("rk"))
      .limit(20)
      .select(col("p_partkey"), col("p_name"), col("rk"))
      .orderBy(col("rk"))

  /** A9 ingest progress / readiness roll-up (utility.py:257–270
    * linecount, md.py:121–140 — file-based progress probes become
    * ingest-status columns in a table-native engine): per-source
    * record and byte tallies with a readiness gate. */
  def a9IngestProgress(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars"),
        min(col("doc_id")).as("first_id"),
        max(col("doc_id")).as("last_id"))
      .withColumn("ready", col("n_docs") >= 100)
      .orderBy(col("source"))

  /** O7 stratified deterministic sample: a fixed rate PER STRATUM
    * (language), ranked by a seeded content digest so the sample is
    * engine-independent and replayable — the curation pattern for
    * balancing a training mix across languages/sources. Strata counts
    * come from a window aggregate, so one shuffle on the stratum key;
    * stratum cardinality (languages) is bounded, so the window
    * partitions stay healthy at any corpus size. */
  def o7StratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("rk"), col("doc_id"))
    Tables(s, dir, "documents")
      .withColumn("rk", md5(concat_ws(":", lit(42), col("doc_id"))))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n_stratum",
        count(lit(1)).over(Window.partitionBy(col("lang"))))
      .where(col("rn") <= ceil(col("n_stratum") * 0.2))
      .select(col("lang"), col("doc_id"), col("rn"))
  }

  /** J7 as-of join — the classic time-series operator Spark has no
    * native form for (DuckDB/kdb/pandas merge_asof do): each left
    * event picks the most recent right event at-or-before its
    * timestamp, per key. Composed from existing operators, no custom
    * plan needed: tag both sides, union, and take
    * `last(right-payload, ignoreNulls)` over a window PARTITIONED BY
    * KEY ordered by (ts, side) — right sorts before left at equal ts,
    * so ties match (l.ts >= r.ts semantics). One shuffle on the key,
    * no range join, no cartesian; the window never degenerates to a
    * single partition. Right side is pre-aggregated to unique
    * (key, ts) so the survivor is deterministic. */
  def j7AsofJoin(s: SparkSession, dir: String): DataFrame = {
    // µs resolution on both engines: DuckDB's TIMESTAMP is µs-precision,
    // so the raw nano longs truncate identically on both sides
    val ev = Tables(s, dir, "events")
      .withColumn("ts", expr("ts div 1000"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.where(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("value")).as("p_value"))
    val l = clicks
      .withColumn("side", lit(1))
      .withColumn("p_value", lit(null).cast("double"))
    val r = purchases
      .withColumn("side", lit(0))
      .withColumn("event_id", lit(null).cast("long"))
    val cols = Seq("user_id", "ts", "side", "event_id", "p_value")
    val u = l.select(cols.map(col): _*).unionByName(r.select(cols.map(col): _*))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ONE last() over a struct, not two independent windows: with two,
    // a matched purchase row whose p_value is null would split the
    // answer (prior_ts from the latest row, prior_value from an older
    // non-null one) — ASOF semantics take both fields from the same
    // matched row, nulls included.
    u.withColumn("prior",
        last(when(col("side") === 0, struct(col("ts").as("ts"),
          col("p_value").as("p_value"))), ignoreNulls = true).over(w))
      .where(col("side") === 1)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("prior")("ts").as("prior_ts"),
        col("prior")("p_value").as("prior_value"))
  }

  /** J8 range join — interval predicates (|ts_a − ts_b| ≤ W) that a
    * naive planner turns into a cartesian + filter. The scale shape:
    * BIN both sides to W-wide buckets and equi-join each left bucket
    * to its right bucket and the two neighbors (any pair within W
    * spans at most adjacent buckets), then apply the exact interval
    * filter. The shuffle key is the bucket id, candidate volume is
    * O(pairs-within-2W) — never N². Here: error events paired with
    * purchase events within 60 s (cross-user incident correlation). */
  def j8RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val winUs = 60L * 1000 * 1000 // 60 s in µs (µs parity with DuckDB)
    val ev = Tables(s, dir, "events").withColumn("ts", expr("ts div 1000"))
    val errors = ev.where(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("ts").as("err_ts"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("ts").as("p_ts"))
    val b = expr(s"err_ts div $winUs")
    val l = errors.withColumn("bucket",
      explode(array(b - 1, b, b + 1)))
    val r = purchases.withColumn("bucket", expr(s"p_ts div $winUs"))
    l.join(r, "bucket")
      .where(abs(col("err_ts") - col("p_ts")) <= winUs)
      .select(col("err_id"), col("p_id"),
        (col("p_ts") - col("err_ts")).as("delta_us"))
      .distinct()
  }

  /** J9 nearest-event join — `merge_asof(direction='nearest')`, the
    * third member of the time-join family (j7 = backward as-of, j8 =
    * all pairs in range): each error event joins the SINGLE nearest
    * purchase by the same user within ±5 min, ties broken toward the
    * earlier purchase then the smaller id (total order ⇒ one
    * deterministic winner). Spark has no native nearest-join; the
    * shape is j8's tolerance-bucketed equi-join (each probe explodes
    * into its bucket ±1 — never a cross join, never a global sort)
    * feeding a per-probe argmin window keyed by err_id. At any scale
    * the shuffle keys are (user_id, bucket) and err_id — both real
    * keys, no SinglePartition anywhere. */
  def j9NearestJoin(s: SparkSession, dir: String): DataFrame =
    nearestJoinOf(Tables(s, dir, "events"), 300L * 1000 * 1000)

  /** The j9 kernel over an arbitrary (user_id, event_id, ts-in-nanos,
    * event_type) relation; `tolUs` = ± tolerance in µs. Errors with
    * no purchase inside the tolerance are dropped (inner nearest
    * join, merge_asof's default). */
  def nearestJoinOf(events: DataFrame, tolUs: Long): DataFrame = {
    val ev = events.withColumn("ts", expr("ts div 1000"))
    val errors = ev.where(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("err_id"),
        col("ts").as("err_ts"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
        col("ts").as("p_ts"))
    val b = expr(s"err_ts div $tolUs")
    val l = errors.withColumn("bucket", explode(array(b - 1, b, b + 1)))
    val r = purchases.withColumn("bucket", expr(s"p_ts div $tolUs"))
    // no distinct: only the probe side explodes (3 buckets) and each
    // purchase occupies exactly ONE bucket, so a given (error,
    // purchase) pair matches exactly once — in the purchase's bucket
    val cand = l.join(r, Seq("user_id", "bucket"))
      .where(abs(col("err_ts") - col("p_ts")) <= tolUs)
      .select(col("user_id"), col("err_id"), col("err_ts"),
        col("p_id"), col("p_ts"))
    val w = Window.partitionBy(col("err_id"))
      .orderBy(abs(col("p_ts") - col("err_ts")), col("p_ts"), col("p_id"))
    cand.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("err_id"), col("user_id"), col("p_id"),
        (col("p_ts") - col("err_ts")).as("delta_us"))
  }

  /** Gap-based sessionization (30-min inactivity), fully relational —
    * the batch twin of the streaming stateful session surface
    * (§2.10): new-session flags via lag, session ids via running sum,
    * then per-session rollup. */
  def w3Sessionize(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapNs = 30L * 60 * 1000 * 1000 * 1000
    Tables(s, dir, "events")
      .withColumn("new_s",
        when(col("ts") - lag(col("ts"), 1).over(w) > gapNs, 1)
          .when(lag(col("ts"), 1).over(w).isNull, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_s")).over(w))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("total"))
  }

  /** W4 funnel analysis — ordered-sequence conversion over the event
    * stream (view → click within 7 days → purchase within 7 days of
    * the click; the product-analytics twin of w3's sessionization):
    * per-user first qualifying timestamp per stage, each stage
    * anchored strictly after the previous one. Three aggregations
    * all keyed on user_id — the same shuffle key throughout, so on a
    * cluster the exchanges co-locate; each stage's anchor table is
    * user-cardinality-sized (AQE broadcasts it here). Output is the
    * stage-count funnel. */
  def w4Funnel(s: SparkSession, dir: String): DataFrame =
    funnelOf(Tables(s, dir, "events"))

  /** The w4 kernel over an arbitrary (user_id, ts, event_type)
    * relation — spec-testable with constructed stage sequences. */
  def funnelOf(ev: DataFrame): DataFrame = {
    val winNs = 7L * 24 * 3600 * 1000 * 1000 * 1000
    val v = ev.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("tv"))
    val c = ev.where(col("event_type") === "click")
      .join(v, "user_id")
      .where(col("ts") > col("tv") && col("ts") <= col("tv") + winNs)
      .groupBy(col("user_id")).agg(min(col("ts")).as("tc"))
    val p = ev.where(col("event_type") === "purchase")
      .join(c, "user_id")
      .where(col("ts") > col("tc") && col("ts") <= col("tc") + winNs)
      .groupBy(col("user_id")).agg(min(col("ts")).as("tp"))
    def n(df: DataFrame, stage: String) =
      df.agg(count(lit(1)).as("n_users")).withColumn("stage", lit(stage))
    n(v, "1_view").unionByName(n(c, "2_click"))
      .unionByName(n(p, "3_purchase"))
      .select(col("stage"), col("n_users"))
  }

  /** W5 cohort retention — the growth-analytics rollup beside w4's
    * funnel: cohort = the calendar day of a user's first event; the
    * cohort's offset-k row counts members active k days later, with
    * the retained fraction against the cohort's own day-0 size. Two
    * shuffles on real keys — a user_id window for the cohort day and
    * a (cohort_day, day_offset) aggregate; the first-value window
    * runs over the tiny cohort×offset aggregate. countDistinct
    * absorbs duplicate user-days, so no pre-distinct pass (and its
    * extra shuffle) is needed. */
  def w5Retention(s: SparkSession, dir: String): DataFrame =
    retentionOf(Tables(s, dir, "events"))

  /** The w5 kernel over an arbitrary (user_id, ts-in-nanos) relation
    * — spec-testable with constructed activity patterns. */
  def retentionOf(ev: DataFrame): DataFrame = {
    val dayNs = 86400L * 1000 * 1000 * 1000
    val byUser = Window.partitionBy(col("user_id"))
    val counts = ev
      .select(col("user_id"), expr(s"ts div $dayNs").as("day"))
      .withColumn("cohort_day", min(col("day")).over(byUser))
      .groupBy(col("cohort_day"),
        (col("day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
    // offset 0 always exists (each member's first day), so first()
    // over the ordered window is the cohort's day-0 size
    val byCohort = Window.partitionBy(col("cohort_day"))
      .orderBy(col("day_offset"))
    counts
      .withColumn("retention", round(
        col("n_users").cast("double") / first(col("n_users")).over(byCohort),
        6))
  }

  /** W6 rate-spike anomaly detection — the ops-analytics layer above
    * s10's hourly rollup: per (event_type, hour) counts, each hour
    * z-scored against its TRAILING 24 elapsed hours (a RANGE window
    * on the integer hour id, so calendar gaps shrink the baseline
    * instead of silently stretching it; the current hour is excluded)
    * and flagged at z ≥ 3.
    *
    * Scale shape: the corpus-sized scan collapses in the first hourly
    * aggregation; every window after that runs on the TIME-bounded
    * (event_type × hours) relation — cardinality set by the clock,
    * not the corpus — partitioned by event_type, so there is no
    * corpus-sized window and no SinglePartition exchange at any
    * scale. Mean/std/z round to 6 decimals for cross-engine float
    * parity (the repo's standard discipline). */
  def w6Anomaly(s: SparkSession, dir: String): DataFrame =
    anomalyOf(Tables(s, dir, "events"))

  /** W7 SLIDING-window rates — the overlapping-window primitive s10's
    * tumbling buckets don't cover (Spark's `window(ts, size, slide)`
    * with size 2 h / slide 1 h: every event lands in exactly two
    * windows). This is the rolling-rate view an ops dashboard and a
    * streaming pipeline both key on, and under Structured Streaming
    * the IDENTICAL expression runs with a watermark (the s10
    * discipline). Scale shape: the explode-to-2-windows doubles the
    * pre-aggregation stream (a constant factor, map-side combined),
    * then the corpus collapses in the (window, event_type) partial
    * agg — no corpus-sized window function anywhere. The DuckDB
    * oracle derives each event's two window starts by floor-division
    * arithmetic — engine-exact because the fixture's timestamps are
    * whole microseconds. */
  def w7SlidingWindow(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .withColumn("ets", timestamp_micros(expr("ts div 1000")))
      .groupBy(window(col("ets"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("win_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("win_start"), col("event_type"))

  /** The w6 kernel over an arbitrary (event_type, ts-in-nanos)
    * relation — spec-testable with a planted spike. */
  def anomalyOf(ev: DataFrame): DataFrame = {
    val hourNs = 3600L * 1000 * 1000 * 1000
    // FLOOR division in exact integer arithmetic: Spark's `div`
    // truncates toward zero while DuckDB's `//` floors, so a plain
    // `div` would bucket pre-1970 timestamps differently on each
    // engine. pmod is non-negative, so (ts − pmod) is an exact
    // multiple of hourNs and `div` on it equals floor for any sign —
    // no float round-trip (nanos exceed 2^53).
    val hourId = expr(s"(ts - pmod(ts, $hourNs)) div $hourNs")
    val hourly = ev
      .select(col("event_type"), hourId.as("hour_id"))
      .groupBy(col("event_type"), col("hour_id"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour_id"))
      .rangeBetween(-24, -1)
    val z = (col("n") - col("mean_24")) /
      when(col("std_24") =!= 0, col("std_24"))
    hourly
      .withColumn("mean_24", avg(col("n")).over(w))
      .withColumn("std_24", stddev_samp(col("n")).over(w))
      .select(col("event_type"), col("hour_id"), col("n"),
        round(col("mean_24"), 6).as("mean_24"),
        round(col("std_24"), 6).as("std_24"),
        round(z, 6).as("z"),
        coalesce(z >= 3, lit(false)).as("is_spike"))
  }

  /** Exact interpolated quantiles (A-family; Spark `percentile` and
    * DuckDB `quantile_cont` both linear-interpolate over the sorted
    * values → identical on identical inputs, rounded for the last-bit
    * interpolation arithmetic).
    *
    * SMALL-SF ORACLE TWIN ONLY: exact `percentile` buffers EVERY value
    * of the group in the aggregation buffer, so a hot group at 100 TB
    * holds billions of doubles and OOMs the executor. Production code
    * must use [[a9QuantilesGk]] (or the oracle-checkable
    * [[a9QuantilesDet]]). */
  def a9Quantiles(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        round(expr("percentile(o_totalprice, 0.25)"), 4).as("q25"),
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("q50"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("q90"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))

  /** A10 per-group winsorization — the outlier-clipping feature-prep
    * step (clip to [p01, p99] within each group) that precedes
    * normalization in a training-feature pipeline. Scale shape: the
    * per-group fences are a GROUP-COUNT-sized aggregate broadcast
    * back onto the corpus scan (AQE broadcasts it), clipping is one
    * codegen map, and the audited output re-aggregates per group — so
    * the corpus crosses the wire once however large the groups are.
    * Fences here use the exact `percentile` (the a9 oracle-twin
    * caveat applies: production would compute fences with
    * `approx_percentile` — same plan shape, sketch-sized buffers).
    * Determinism: fences round to 6 decimals BEFORE clipping in both
    * engines (one correctly-rounded double op), clipped sums ride
    * the decimal-cast discipline. */
  def a10Winsorize(s: SparkSession, dir: String): DataFrame = {
    // ONE corpus pass for both aggregates (round 16): the fences
    // percentile and the clip/audit aggregate each re-scanned lineitem
    // before; projecting the two needed columns and repartitioning on
    // the high-cardinality order key gives both consumers the SAME
    // exchange (runtime-reused), spreads the percentile partials and
    // the decimal sums across cores (the fixture scan is 3 splits),
    // and shuffles 17 bytes/row instead of re-reading the table.
    val li = Tables(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_orderkey"))
      .repartition(col("l_orderkey"))
      .select(col("l_returnflag"), col("l_extendedprice"))
    val fences = li.groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_extendedprice, 0.01)"), 6).as("lo"),
        round(expr("percentile(l_extendedprice, 0.99)"), 6).as("hi"))
    li.join(broadcast(fences), "l_returnflag")
      .withColumn("clipped",
        when(col("l_extendedprice") < col("lo"), col("lo"))
          .when(col("l_extendedprice") > col("hi"), col("hi"))
          .otherwise(col("l_extendedprice")))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum((col("l_extendedprice") < col("lo")).cast("long")).as("n_lo"),
        sum((col("l_extendedprice") > col("hi")).cast("long")).as("n_hi"),
        sum(col("clipped").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast("double").as("sum_clipped"))
  }

  /** Production-scale quantiles tier: `approx_percentile` keeps a
    * FIXED-SIZE mergeable sketch (Greenwald–Khanna, one per group and
    * partition, merged map-side) instead of buffering the group's
    * values, so per-group memory is O(accuracy · log n) no matter how
    * many rows the group holds — the plan that survives a hot
    * o_orderpriority group with billions of rows. accuracy=10000
    * bounds the rank error at n/10000 (≤0.01 % of the group);
    * OperatorsSpec ("approx quantiles stay within the sketch error
    * bound of exact") asserts the observed relative error vs the
    * exact result, sk1-style. Engine-specific sketch state → this
    * tier is spec-checked; the `a9_quantiles_approx` ENTRY runs the
    * oracle-checkable deterministic twin (a9QuantilesDet) since r8. */
  def a9QuantilesGk(s: SparkSession, dir: String,
      accuracy: Int = 10000): DataFrame =
    Tables(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        expr(s"approx_percentile(o_totalprice, array(0.25, 0.5, 0.9), $accuracy)")
          .as("qs"),
        count(lit(1)).as("n"))
      .select(col("o_orderpriority"),
        round(col("qs")(0), 4).as("q25"),
        round(col("qs")(1), 4).as("q50"),
        round(col("qs")(2), 4).as("q90"),
        col("n"))
      .orderBy(col("o_orderpriority"))

  /** A9 approximate quantiles, oracle-green since r8 via the
    * deterministic bottom-k sample sketch
    * (operators/DetQuantiles.scala — md5-keyed KMV sample, exact
    * integer rank arithmetic, no interpolation): the hash-level
    * oracle twin of the GK tier above, same group key, same output
    * schema. */
  def a9QuantilesDet(s: SparkSession, dir: String): DataFrame =
    graft.operators.DetQuantiles.quantiles(
      Tables(s, dir, "orders"), "o_orderpriority", "o_totalprice",
      col("o_orderkey"))

  /** W8 time-weighted average (irregular time series): each user's
    * event values weighted by how long they were "in effect" (until
    * the next event) — the correct mean for unevenly sampled signals
    * (a plain avg over-weights bursts). One lead() window and one agg
    * on the SAME user_id key: the corpus shuffles once. */
  def w8TimeWeighted(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables(s, dir, "events") // ts = epoch nanos (LongType, see Tables)
      .withColumn("next_ts", lead(col("ts"), 1).over(w))
      .where(col("next_ts").isNotNull)
      .withColumn("dt", (col("next_ts") - col("ts")).cast("double") / lit(1e9))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_intervals"),
        round(sum(col("value") * col("dt")) / sum(col("dt")), 4).as("twa_value"))
      .where(col("twa_value").isNotNull)
  }

  /** Z1 Z-order (Morton) layout audit (operators.ZOrder): normalize
    * (o_custkey, order-day) to the 16-bit grid, interleave to a
    * 32-bit z-value, and report per-bucket (top-6 z bits = an 8×8
    * spatial tile) min/max extents of BOTH dimensions. The payoff the
    * stats make visible: every bucket is tight in every interleaved
    * dimension at once, so file-level min/max pruning works for
    * predicates on either column — a single-column sort gives that
    * for its leading column only. The dim-range normalization is one
    * O(1)-row agg broadcast onto the scan; the z-value itself is
    * stateless codegen bit arithmetic. */
  def z1ZorderLayout(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
      .select(col("o_custkey"),
        datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("day"))
    val stats = o.agg(
      min(col("o_custkey")).as("min_ck"), max(col("o_custkey")).as("max_ck"),
      min(col("day")).as("min_day"), max(col("day")).as("max_day"))
    val scaled = o.crossJoin(broadcast(stats)) // 1-row dim-stats broadcast
      .withColumn("x", floor((col("o_custkey") - col("min_ck")).cast("double")
        * lit(65535.0) / greatest(col("max_ck") - col("min_ck"), lit(1L)).cast("double")))
      .withColumn("y", floor((col("day") - col("min_day")).cast("double")
        * lit(65535.0) / greatest(col("max_day") - col("min_day"), lit(1L)).cast("double")))
    scaled
      .withColumn("z", graft.operators.ZOrder.zValue(col("x"), col("y")))
      .withColumn("bucket", shiftrightunsigned(col("z"), 26).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("o_custkey")).as("min_ck"), max(col("o_custkey")).as("max_ck"),
        min(col("day")).as("min_day"), max(col("day")).as("max_day"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w8_time_weighted" -> (w8TimeWeighted _),
    "z1_zorder_layout" -> (z1ZorderLayout _),
    "a9_quantiles" -> (a9Quantiles _),
    "a10_winsorize" -> (a10Winsorize _),
    "a9_quantiles_approx" -> (a9QuantilesDet _),
    "o6_sample" -> (o6Sample _),
    "o7_stratified_sample" -> (o7StratifiedSample _),
    "a9_ingest_progress" -> (a9IngestProgress _),
    "j7_asof_join" -> (j7AsofJoin _),
    "j8_range_join" -> (j8RangeJoin _),
    "j9_nearest_join" -> (j9NearestJoin _),
    "w3_sessionize" -> (w3Sessionize _),
    "w4_funnel" -> (w4Funnel _),
    "w5_retention" -> (w5Retention _),
    "w6_anomaly" -> (w6Anomaly _),
    "w7_sliding_window" -> (w7SlidingWindow _),
    "w9_transitions" -> (w9Transitions _),
    "w10_session_window" -> (w10SessionWindow _),
    "w11_engaged_time" -> (w11EngagedTime _),
    "a6_weighted_mean" -> (a6WeightedMean _),
    "k1_vegard" -> (k1Vegard _),
    "x1_json_props" -> (x1JsonProps _),
    "w2_lag_delta" -> (w2LagDelta _),
    "m7_curation" ->
      ((s: SparkSession, d: String) => graft.pipeline.TextPipeline.run(s, d)),
  )

  val oracle: Map[String, String] = Map(
    // w8: same lead-window / weighted-ratio arithmetic; dt in seconds
    // from micros here vs nanos on the Spark side — the true quotients
    // are identical reals, so IEEE division rounds them identically.
    "w8_time_weighted" ->
      """WITH e AS (
        | SELECT user_id, event_id, epoch_us(ts) AS tus, value FROM events),
        |i AS (
        | SELECT user_id, value,
        |  (lead(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id)
        |    - tus) / 1000000.0 AS dt
        | FROM e)
        |SELECT user_id, COUNT(*) AS n_intervals,
        | ROUND(SUM(value * dt) / SUM(dt), 4) AS twa_value
        |FROM i WHERE dt IS NOT NULL
        |GROUP BY user_id
        |HAVING ROUND(SUM(value * dt) / SUM(dt), 4) IS NOT NULL
        |ORDER BY user_id""".stripMargin,
    // z1: the same normalize → magic-number interleave → bucket stats,
    // spelled as shift/mask CTE stages.
    "z1_zorder_layout" ->
      """WITH d AS (
        | SELECT o_custkey,
        |  date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day
        | FROM orders),
        |st AS (
        | SELECT MIN(o_custkey) AS min_ck, MAX(o_custkey) AS max_ck,
        |        MIN(day) AS min_day, MAX(day) AS max_day FROM d),
        |n AS (
        | SELECT o_custkey, day,
        |  CAST(FLOOR((o_custkey - min_ck) * 65535.0
        |    / GREATEST(max_ck - min_ck, 1)) AS BIGINT) AS x,
        |  CAST(FLOOR((day - min_day) * 65535.0
        |    / GREATEST(max_day - min_day, 1)) AS BIGINT) AS y
        | FROM d CROSS JOIN st),
        |s1 AS (SELECT o_custkey, day,
        |  (x | (x << 8)) & 16711935 AS xa, (y | (y << 8)) & 16711935 AS ya FROM n),
        |s2 AS (SELECT o_custkey, day,
        |  (xa | (xa << 4)) & 252645135 AS xb, (ya | (ya << 4)) & 252645135 AS yb FROM s1),
        |s3 AS (SELECT o_custkey, day,
        |  (xb | (xb << 2)) & 858993459 AS xc, (yb | (yb << 2)) & 858993459 AS yc FROM s2),
        |s4 AS (SELECT o_custkey, day,
        |  (xc | (xc << 1)) & 1431655765 AS xd, (yc | (yc << 1)) & 1431655765 AS yd FROM s3),
        |z AS (SELECT o_custkey, day, (xd | (yd << 1)) AS z FROM s4)
        |SELECT CAST(z >> 26 AS BIGINT) AS bucket, COUNT(*) AS n,
        | MIN(o_custkey) AS min_ck, MAX(o_custkey) AS max_ck,
        | MIN(day) AS min_day, MAX(day) AS max_day
        |FROM z GROUP BY 1 ORDER BY bucket""".stripMargin,
    // M7 audit-table oracle: each curation stage re-expressed in SQL
    // over the PREVIOUS stage's survivors (normalize = t6's transform,
    // dedup keepers = min doc_id per hash, decontaminate = d8's gram
    // overlap, sample = o7's keyed-digest rank); the split rows are
    // pure arithmetic in the surviving count (Splits.assign bucket
    // sizes depend only on N), guarded to drop empty buckets exactly
    // like the Spark groupBy does.
    "m7_curation" ->
      s"""WITH norm AS (
         | SELECT doc_id, lang,
         |  trim(regexp_replace(regexp_replace(lower(text),
         |    '[[:cntrl:]]', '', 'g'), ' {2,}', ' ', 'g')) AS text
         | FROM documents),
         |red AS (
         | SELECT doc_id, lang,
         |  regexp_replace(regexp_replace(regexp_replace(text,
         |   '${TextOps.emailRe}', '<EMAIL>', 'g'),
         |   '${TextOps.ipRe}', '<IP>', 'g'),
         |   '${TextOps.phoneRe}', '<PHONE>', 'g') AS text
         | FROM norm),
         |dx AS (SELECT MIN(doc_id) AS doc_id FROM red GROUP BY md5(text)),
         |d1c AS (SELECT n.* FROM red n JOIN dx USING (doc_id)),
         |ds AS ${DedupOps.simhashKeepersSql("d1c")},
         |d3c AS (SELECT c.* FROM d1c c JOIN ds USING (doc_id)),
         |g AS (
         | SELECT doc_id, lang, doc_id % 97 = 0 AS is_bench,
         |  CASE WHEN len(string_split(text, ' ')) >= 8 THEN
         |   list_distinct([array_to_string(string_split(text, ' ')[i:i+7], ' ')
         |    for i in range(1, len(string_split(text, ' ')) - 6)])
         |  ELSE [] END AS grams
         | FROM d3c),
         |bg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE is_bench),
         |cont AS (SELECT DISTINCT doc_id FROM
         |  (SELECT doc_id, unnest(grams) AS gram FROM g WHERE NOT is_bench) cg
         |  JOIN bg USING (gram)),
         |dec AS (SELECT doc_id, lang FROM g
         |  WHERE NOT is_bench AND doc_id NOT IN (SELECT doc_id FROM cont)),
         |r AS (
         | SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY lang
         |    ORDER BY md5('42:' || doc_id), doc_id) AS rn,
         |  COUNT(*) OVER (PARTITION BY lang) AS ns
         | FROM dec),
         |samp AS (SELECT doc_id FROM r WHERE rn <= CEIL(ns * 0.5)),
         |n5 AS (SELECT COUNT(*)::BIGINT AS n FROM samp),
         |sp AS (
         | SELECT bucket, n FROM (
         |  SELECT 'train' AS bucket, CEIL(0.8 * n)::BIGINT AS n FROM n5
         |  UNION ALL
         |  SELECT 'holdout', CEIL(0.8 * (n - CEIL(0.8 * n)))::BIGINT FROM n5
         |  UNION ALL
         |  SELECT 'super',
         |   (n - CEIL(0.8 * n) - CEIL(0.8 * (n - CEIL(0.8 * n))))::BIGINT FROM n5)
         | WHERE n > 0),
         |stages AS (
         | SELECT 0::BIGINT AS stage_idx, 'ingest' AS stage,
         |   (SELECT COUNT(*) FROM documents)::BIGINT AS n_docs
         | UNION ALL SELECT 1, 'normalize', (SELECT COUNT(*) FROM norm)
         | UNION ALL SELECT 2, 'redact', (SELECT COUNT(*) FROM red)
         | UNION ALL SELECT 3, 'dedup_exact', (SELECT COUNT(*) FROM d1c)
         | UNION ALL SELECT 4, 'dedup_simhash', (SELECT COUNT(*) FROM d3c)
         | UNION ALL SELECT 5, 'decontaminate', (SELECT COUNT(*) FROM dec)
         | UNION ALL SELECT 6, 'stratified_sample', (SELECT COUNT(*) FROM samp)
         | UNION ALL
         | SELECT (6 + ROW_NUMBER() OVER (ORDER BY bucket))::BIGINT,
         |   'split:' || bucket, n FROM sp)
         |SELECT stage_idx, stage, n_docs FROM stages ORDER BY stage_idx""".stripMargin,
    // fences round to 6 decimals BEFORE clipping in both engines;
    // clipped sums ride the decimal-cast discipline
    "a10_winsorize" ->
      """WITH f AS (
        | SELECT l_returnflag,
        |  ROUND(QUANTILE_CONT(l_extendedprice, 0.01), 6) AS lo,
        |  ROUND(QUANTILE_CONT(l_extendedprice, 0.99), 6) AS hi
        | FROM lineitem GROUP BY 1)
        |SELECT l.l_returnflag, COUNT(*) AS n,
        | SUM((l.l_extendedprice < f.lo)::BIGINT)::BIGINT AS n_lo,
        | SUM((l.l_extendedprice > f.hi)::BIGINT)::BIGINT AS n_hi,
        | CAST(SUM(CAST(CASE WHEN l.l_extendedprice < f.lo THEN f.lo
        |   WHEN l.l_extendedprice > f.hi THEN f.hi
        |   ELSE l.l_extendedprice END AS DECIMAL(18,6))) AS DOUBLE)
        |   AS sum_clipped
        |FROM lineitem l JOIN f USING (l_returnflag)
        |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin,
    "a9_quantiles" ->
      """SELECT o_orderpriority,
        | ROUND(QUANTILE_CONT(o_totalprice, 0.25), 4) AS q25,
        | ROUND(QUANTILE_CONT(o_totalprice, 0.5), 4) AS q50,
        | ROUND(QUANTILE_CONT(o_totalprice, 0.9), 4) AS q90,
        | COUNT(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "a9_quantiles_approx" -> graft.operators.DetQuantiles.oracleSql(
      "orders", "o_orderpriority", "o_totalprice", "o_orderkey"),
    "o6_sample" ->
      """SELECT p_partkey, p_name, md5('42:' || p_partkey) AS rk
        |FROM part ORDER BY rk LIMIT 20""".stripMargin,
    // the oracle is DuckDB's NATIVE ASOF LEFT JOIN — an independent
    // implementation of the same semantics (ts compared as raw nanos)
    "j7_asof_join" ->
      """WITH l AS (
        | SELECT event_id, user_id, epoch_us(ts) AS ts
        | FROM events WHERE event_type = 'click'),
        |r AS (
        | SELECT user_id, epoch_us(ts) AS ts, MAX(value) AS p_value
        | FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT l.event_id, l.user_id, l.ts,
        | r.ts AS prior_ts, r.p_value AS prior_value
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,
    // j9: plain tolerance join + per-probe argmin — the Spark side's
    // bucketed candidates and window must pick the identical winner
    "j9_nearest_join" ->
      """WITH e AS (
        | SELECT user_id, event_id AS err_id, epoch_us(ts) AS err_ts
        | FROM events WHERE event_type = 'error'),
        |p AS (
        | SELECT user_id, event_id AS p_id, epoch_us(ts) AS p_ts
        | FROM events WHERE event_type = 'purchase'),
        |cand AS (
        | SELECT e.user_id, e.err_id, e.err_ts, p.p_id, p.p_ts
        | FROM e JOIN p USING (user_id)
        | WHERE ABS(e.err_ts - p.p_ts) <= 300000000),
        |r AS (
        | SELECT *, ROW_NUMBER() OVER (PARTITION BY err_id
        |   ORDER BY ABS(p_ts - err_ts), p_ts, p_id) AS rn
        | FROM cand)
        |SELECT err_id, user_id, p_id, (p_ts - err_ts) AS delta_us
        |FROM r WHERE rn = 1 ORDER BY err_id""".stripMargin,
    // oracle: plain inequality join — DuckDB plans it as IEJoin; the
    // Spark side's bucketed equi-join must produce the identical pairs
    "j8_range_join" ->
      """WITH e AS (
        | SELECT event_id AS err_id, epoch_us(ts) AS err_ts
        | FROM events WHERE event_type = 'error'),
        |p AS (
        | SELECT event_id AS p_id, epoch_us(ts) AS p_ts
        | FROM events WHERE event_type = 'purchase')
        |SELECT e.err_id, p.p_id, p.p_ts - e.err_ts AS delta_us
        |FROM e JOIN p ON ABS(e.err_ts - p.p_ts) <= 60000000
        |ORDER BY err_id, p_id""".stripMargin,
    "a9_ingest_progress" ->
      """SELECT source, COUNT(*) AS n_docs, SUM(n_chars)::BIGINT AS n_chars,
        | MIN(doc_id) AS first_id, MAX(doc_id) AS last_id,
        | COUNT(*) >= 100 AS ready
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "o7_stratified_sample" ->
      """WITH r AS (
        | SELECT lang, doc_id, md5('42:' || doc_id) AS rk,
        |  ROW_NUMBER() OVER (PARTITION BY lang ORDER BY md5('42:' || doc_id), doc_id) AS rn,
        |  COUNT(*) OVER (PARTITION BY lang) AS n_stratum
        | FROM documents)
        |SELECT lang, doc_id, rn FROM r
        |WHERE rn <= CEIL(n_stratum * 0.2)
        |ORDER BY lang, rn""".stripMargin,
    "w4_funnel" ->
      """WITH v AS (
        | SELECT user_id, MIN(ts) AS tv FROM events
        | WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        | SELECT e.user_id, MIN(e.ts) AS tc
        | FROM events e JOIN v USING (user_id)
        | WHERE e.event_type = 'click' AND e.ts > v.tv
        |   AND e.ts <= v.tv + INTERVAL 7 DAY
        | GROUP BY e.user_id),
        |p AS (
        | SELECT e.user_id, MIN(e.ts) AS tp
        | FROM events e JOIN c USING (user_id)
        | WHERE e.event_type = 'purchase' AND e.ts > c.tc
        |   AND e.ts <= c.tc + INTERVAL 7 DAY
        | GROUP BY e.user_id)
        |SELECT '1_view' AS stage, COUNT(*)::BIGINT AS n_users FROM v
        |UNION ALL SELECT '2_click', COUNT(*)::BIGINT FROM c
        |UNION ALL SELECT '3_purchase', COUNT(*)::BIGINT FROM p
        |ORDER BY stage""".stripMargin,
    // days computed by integer-dividing the raw epoch clock (nanos on
    // the Spark side, micros here) — identical floors for positive ts
    "w5_retention" ->
      """WITH ud AS (
        | SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        |f AS (
        | SELECT user_id, day,
        |  MIN(day) OVER (PARTITION BY user_id) AS cohort_day FROM ud),
        |r AS (
        | SELECT cohort_day, day - cohort_day AS day_offset,
        |  COUNT(DISTINCT user_id)::BIGINT AS n_users
        | FROM f GROUP BY 1, 2)
        |SELECT cohort_day, day_offset, n_users,
        | ROUND(n_users::DOUBLE / FIRST_VALUE(n_users) OVER (
        |   PARTITION BY cohort_day ORDER BY day_offset), 6) AS retention
        |FROM r ORDER BY cohort_day, day_offset""".stripMargin,
    "w3_sessionize" ->
      """WITH g AS (
        | SELECT user_id, ts, event_id, value,
        |  CASE WHEN LAG(ts) OVER w IS NULL THEN 1
        |       WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE THEN 1
        |       ELSE 0 END AS new_s
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        | SELECT user_id, value,
        |  CAST(SUM(new_s) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS BIGINT) AS session_id
        | FROM g)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        | ROUND(SUM(value), 4) AS total
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    // w6: same trailing-24h RANGE window over the integer hour id;
    // DuckDB reads ts as TIMESTAMP_NS, so the id comes from epoch_ns
    // each event's two 2h/1h sliding windows derived by floor-division
    // arithmetic (exact: fixture timestamps are whole microseconds)
    "w7_sliding_window" ->
      """WITH e AS (
        | SELECT epoch_us(ts) AS us, event_type, value FROM events),
        |w AS (
        | SELECT ((us // 3600000000) - off) * 3600000000 AS ws,
        |  event_type, value
        | FROM e CROSS JOIN (VALUES (0), (1)) AS o(off))
        |SELECT STRFTIME(make_timestamp(ws), '%Y-%m-%d %H:%M') AS win_start,
        | event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
        |FROM w GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    "w6_anomaly" ->
      """WITH h AS (
        | SELECT event_type, epoch_ns(ts) // 3600000000000 AS hour_id,
        |  COUNT(*)::BIGINT AS n
        | FROM events GROUP BY 1, 2),
        |zz AS (
        | SELECT event_type, hour_id, n,
        |  AVG(n) OVER w AS mean_24,
        |  STDDEV_SAMP(n) OVER w AS std_24
        | FROM h
        | WINDOW w AS (PARTITION BY event_type ORDER BY hour_id
        |   RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, hour_id, n,
        | ROUND(mean_24, 6) AS mean_24,
        | ROUND(std_24, 6) AS std_24,
        | ROUND((n - mean_24) / NULLIF(std_24, 0), 6) AS z,
        | COALESCE((n - mean_24) / NULLIF(std_24, 0) >= 3, FALSE) AS is_spike
        |FROM zz ORDER BY event_type, hour_id""".stripMargin,
    "a6_weighted_mean" ->
      """SELECT l_returnflag,
        | ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4)
        |   AS wavg_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "k1_vegard" ->
      """SELECT alloy, ROUND(SUM(conc * latpar), 6) AS a0
        |FROM (VALUES ('AgPd50','Ag',0.5),('AgPd50','Pd',0.5),
        |             ('AgCu25','Ag',0.75),('AgCu25','Cu',0.25),
        |             ('PdCu50','Pd',0.5),('PdCu50','Cu',0.5))
        |  AS a(alloy, el, conc)
        |JOIN (VALUES ('Ag',4.09),('Pd',3.89),('Cu',3.615))
        |  AS l(el, latpar) USING (el)
        |GROUP BY alloy ORDER BY alloy""".stripMargin,
    "x1_json_props" ->
      """SELECT event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
        | CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS DOUBLE)
        |   / COUNT(CAST(props->>'$.k' AS BIGINT)) AS avg_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // w10 mirrors session_window's boundary: a session's window is
    // [ts, ts+gap] INCLUSIVE of the endpoint (an event exactly gap
    // after its predecessor MERGES — spec-pinned), identical to w3's
    // >-split lag idiom; session identity = min ts in session (epoch µs)
    "w10_session_window" ->
      """WITH g AS (
        | SELECT user_id, ts, event_id, value,
        |  CASE WHEN LAG(ts) OVER w IS NULL THEN 1
        |       WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE THEN 1
        |       ELSE 0 END AS new_s
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        | SELECT user_id, ts, value,
        |  CAST(SUM(new_s) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS BIGINT) AS sid
        | FROM g)
        |SELECT user_id, epoch_us(MIN(ts))::BIGINT AS s_start_us,
        | COUNT(*) AS n_events, ROUND(SUM(value), 4) AS total
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, s_start_us""".stripMargin,
    // w11 mirrors the half-open [ts, ts+300s) interval-union in
    // micros (events ts is micros-exact); Spark computes in nanos and
    // divides by 1000 — multiples of 1000, exact in the double
    "w11_engaged_time" ->
      """WITH e AS (
        | SELECT user_id, epoch_us(ts) AS tus, event_id FROM events),
        |m AS (
        | SELECT user_id, tus, event_id,
        |  MAX(tus + 300000000) OVER (PARTITION BY user_id
        |    ORDER BY tus, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        | FROM e),
        |g AS (
        | SELECT user_id, tus,
        |  SUM(CASE WHEN prev_end IS NULL OR tus >= prev_end
        |      THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
        |    ORDER BY tus, event_id) AS grp
        | FROM m),
        |iv AS (
        | SELECT user_id, grp, MIN(tus) AS s, MAX(tus + 300000000) AS e
        | FROM g GROUP BY user_id, grp)
        |SELECT user_id, COUNT(*)::BIGINT AS n_intervals,
        | SUM(e - s)::BIGINT AS engaged_us
        |FROM iv GROUP BY user_id ORDER BY user_id""".stripMargin,
    "w9_transitions" ->
      """WITH tr AS (
        | SELECT LAG(event_type, 1) OVER (PARTITION BY user_id
        |   ORDER BY ts, event_id) AS prev_type,
        |  event_type AS next_type
        | FROM events),
        |c AS (
        | SELECT prev_type, next_type, COUNT(*)::BIGINT AS n
        | FROM tr WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, next_type, n,
        | ROUND(n * 1e6 / SUM(n) OVER (PARTITION BY prev_type))::BIGINT AS p_ppm
        |FROM c ORDER BY prev_type, next_type""".stripMargin,
    "w2_lag_delta" ->
      """SELECT event_type, COUNT(*) AS n, ROUND(AVG(delta), 6) AS avg_delta
        |FROM (
        | SELECT event_type,
        |  value - LAG(value, 1) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS delta
        | FROM events
        |) WHERE delta IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
  )
}
