package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Training-batch assembly: sequence packing for LLM pretraining.
  *
  * P1 concat-and-chunk packing: documents are laid end-to-end in
  * doc_id order and cut into fixed-capacity token chunks (the
  * standard pretraining batch layout — every chunk is exactly `cap`
  * tokens except the last, and a document crossing a boundary
  * continues in the next chunk). The interesting part at scale is the
  * GLOBAL token offset: a naive `Window.orderBy` with no partitionBy
  * funnels the whole corpus through one task. Here offsets come from
  * the same scale-safe shape as `operators.Splits` (O5): a
  * DETERMINISTIC order-preserving bucketing on `doc_id DIV blockSz`
  * (no range-boundary sampling, so nothing needs pinning), per-bucket
  * sums prefix-summed on the driver — O(buckets) control rows — and a
  * bucket-local cumulative window on top. Two O(1)-output control
  * jobs run at build time (max id + bucket sums); the result plan is
  * one local window + one chunk aggregation.
  */
object PackOps {

  /** Tokens-per-chunk capacity: small enough that sf0.001's ~600-doc
    * corpus still spans many chunks, context-window-sized in spirit. */
  val ChunkCap = 256L

  /** Per-chunk packing summary: how many documents intersect the
    * chunk, how many tokens it holds (== cap except the tail), and
    * how many of its documents carried in across the left boundary. */
  def p1PackSequences(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val parts = s.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val base = Tables(s, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
    // control job 1: max id sizes the deterministic buckets
    val maxId = base.agg(max(col("doc_id"))).as[Option[Long]]
      .collect().head.getOrElse(0L)
    val blockSz = maxId / parts + 1
    val bucketed = base.withColumn("__b", expr(s"doc_id DIV $blockSz"))
    // control job 2: per-bucket token sums → driver prefix sum
    val sums = bucketed.groupBy(col("__b"))
      .agg(sum(col("n_tok")).as("__s"))
      .as[(Long, Long)].collect().sortBy(_._1)
    // bucket id → exclusive prefix sum of every earlier bucket's tokens
    val offsets = sums.map(_._1)
      .zip(sums.scanLeft(0L)(_ + _._2).init)
    val offsetsDf = offsets.toSeq.toDF("__b", "__off")
    val wLocal = Window.partitionBy(col("__b")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val spans = bucketed
      .join(broadcast(offsetsDf), Seq("__b"))
      .withColumn("off",
        col("__off") + coalesce(sum(col("n_tok")).over(wLocal), lit(0L)))
      .withColumn("fin", col("off") + col("n_tok"))
    spans
      .select(col("off"), col("fin"),
        explode(sequence(expr(s"off DIV $ChunkCap"),
          expr(s"(fin - 1) DIV $ChunkCap"))).as("chunk_id"))
      .groupBy(col("chunk_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(least(col("fin"), (col("chunk_id") + 1) * ChunkCap) -
          greatest(col("off"), col("chunk_id") * ChunkCap)).as("n_tokens"),
        sum(when(col("off") < col("chunk_id") * ChunkCap, 1L)
          .otherwise(0L)).as("n_carry_in"))
  }

  /** M9 training-mix planner — the source-weighting step a pretraining
    * data pipeline runs before sampling (DoReMi/Pile-style mixture
    * weights, applied as a plan rather than learned): given per-source
    * token inventories and a target weight per source (here a literal
    * policy: sources 0–9 weigh 2×, the rest 1×), allocate a token
    * budget proportionally, cap at availability, and emit the
    * per-source deterministic sampling rate that o6/o7 would execute
    * with. One source-level aggregation; the weight-sum scalar rides a
    * broadcast single-row join. Everything downstream of the agg is
    * source-cardinality-sized regardless of corpus size. */
  val MixBudget = 10000L

  def m9MixPlan(s: SparkSession, dir: String): DataFrame =
    mixPlanOf(Tables(s, dir, "documents"))

  /** The m9 kernel over an arbitrary (source, text) relation. */
  def mixPlanOf(docs: DataFrame): DataFrame = {
    val agg = docs
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
      // digit extraction (not a positional substring) so the policy
      // survives re-keyed source names like `src3_1` in the
      // MakeScale-scaled corpora — a silent cast-to-null here would
      // degenerate the whole plan to uniform weights
      .withColumn("weight",
        when(regexp_extract(col("source"), "^src([0-9]+)", 1)
          .cast("int") < 10, 2L).otherwise(1L))
    val tot = agg.agg(sum(col("weight")).as("sum_w"))
    agg.crossJoin(broadcast(tot))
      .withColumn("target_tokens",
        floor(lit(MixBudget) * col("weight") / col("sum_w")).cast("long"))
      .withColumn("sample_rate",
        round(least(lit(1.0),
          col("target_tokens").cast("double") / col("n_tokens")), 6))
      .withColumn("expected_tokens",
        least(col("n_tokens"), col("target_tokens")))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("weight"),
        col("target_tokens"), col("sample_rate"), col("expected_tokens"))
  }

  /** M13 mix-gap report: observed token share per source vs a uniform
    * target mix, with the reweighting factor that would close the gap
    * (the audit a data-mixing pipeline runs BEFORE committing to an
    * m9 plan — m9 prescribes, m13 measures what the corpus can
    * deliver). Shares and factors in integer ppm/micro units so the
    * cross-engine compare is exact. One source-level aggregation;
    * totals ride a broadcast single-row join — downstream of the agg
    * everything is source-cardinality-sized at any corpus scale. */
  def m13MixGap(s: SparkSession, dir: String): DataFrame =
    mixGapOf(Tables(s, dir, "documents"))

  /** The m13 kernel over an arbitrary (source, text) relation. */
  def mixGapOf(docs: DataFrame): DataFrame = {
    val bySrc = docs
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
    val tot = bySrc.agg(sum(col("n_tokens")).as("tot"),
      count(lit(1)).as("n_sources"))
    val sharePpm =
      round(col("n_tokens") * lit(1e6) / col("tot"), 0).cast("long")
    val targetPpm = round(lit(1e6) / col("n_sources"), 0).cast("long")
    bySrc.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        sharePpm.as("share_ppm"),
        targetPpm.as("target_ppm"),
        (sharePpm - targetPpm).as("gap_ppm"),
        round(col("tot").cast("double") / col("n_sources")
          / col("n_tokens") * 1e6, 0).cast("long").as("upweight_micro"))
  }

  /** M11 training-mix EXECUTION — the sampling pass that applies the
    * m9 plan (planning a mixture and never materializing it is the
    * half-finished version of this pipeline): every document joins
    * its source's planned `sample_rate` (the plan table is
    * source-cardinality-sized → broadcast) and keeps iff its seeded
    * affine digest clears the rate threshold — the MinHash-family
    * arithmetic, engine-reproducible in integer math, so the SAME
    * docs are kept under Spark and the oracle. One broadcast join +
    * one source-level aggregation over the corpus scan; per-source
    * audit counts out (the sampled corpus itself is the same relation
    * minus the agg — a caller keeps `keep=true` rows). */
  def m11MixExecute(s: SparkSession, dir: String): DataFrame =
    mixExecuteOf(Tables(s, dir, "documents"))

  /** The m11 kernel over an arbitrary (source, doc_id, text) relation
    * — spec-testable against a Scala-side replay of the keep rule. */
  def mixExecuteOf(allDocs: DataFrame): DataFrame = {
    val plan = mixPlanOf(allDocs).select(col("source"), col("sample_rate"))
    val docs = allDocs
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
    // (a·id + b) mod p mod 10⁶ < ⌊rate·10⁶⌉ — pure integer keep test
    val h = pmod(pmod(col("doc_id") * lit(1103515245L) + lit(12345L),
      lit(2147483647L)), lit(1000000L))
    docs.join(broadcast(plan), "source")
      .withColumn("keep",
        h < floor(col("sample_rate") * lit(1e6) + lit(0.5)))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_sampled"),
        sum(when(col("keep"), col("n_tok")).otherwise(0L))
          .as("n_tokens_sampled"))
  }

  /** P2 retrieval chunking: overlapping token windows (the RAG
    * ingestion layout — window `Win` tokens, stride `Stride`, tail
    * window shorter, every document yields ≥ 1 window). Pure per-row
    * explode: no shuffle except the oracle-determinism sort, and the
    * window count per doc is arithmetic on the token count, so the
    * operator is a single codegen'd scan at any corpus size. Windows
    * are emitted as (index, token count, md5 of the window text) —
    * the id + fingerprint a vector-index ingest keys on. */
  val Win = 64
  val Stride = 48

  def p2ChunkWindows(s: SparkSession, dir: String): DataFrame =
    chunkWindowsOf(Tables(s, dir, "documents"), Win, Stride)

  /** The p2 kernel over an arbitrary (doc_id, text) relation with
    * explicit window/stride — spec-testable on boundary cases. */
  def chunkWindowsOf(docs: DataFrame, win: Int, stride: Int): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .withColumn("n", size(col("t")).cast("long"))
      .withColumn("chunk_idx", explode(sequence(lit(0L),
        when(col("n") <= win, lit(0L))
          .otherwise(expr(s"(n - $win + ${stride - 1}) DIV $stride")))))
      .withColumn("w", slice(col("t"),
        (col("chunk_idx") * stride + 1L).cast("int"), lit(win)))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("w")).cast("long").as("n_tokens"),
        md5(array_join(col("w"), " ")).as("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  /** P3 curriculum ordering — the data-ordering step before batch
    * assembly: lay the corpus out easy→hard (curriculum learning,
    * Bengio et al. 2009) with a DETERMINISTIC shuffle inside each
    * difficulty tier so batches aren't length-sorted within a tier.
    * Difficulty = whitespace token count against FIXED thresholds
    * (data-independent, so tiers mean the same thing at any corpus
    * size); the within-tier shuffle key is m11's seeded affine
    * digest — engine-reproducible integer math, so the oracle orders
    * identically. The GLOBAL position uses the o5/p1 shape, not a
    * single-partition window: the digest domain is fixed ([0, 1e6)),
    * so (tier, digest-block) buckets are deterministic with NO
    * sizing job — one O(buckets) count pass prefix-summed on the
    * driver, then a bucket-local row_number. */
  val TierBounds: Seq[Long] = Seq(32L, 56L, 76L)

  def p3Curriculum(s: SparkSession, dir: String): DataFrame =
    curriculumOf(Tables(s, dir, "documents"))

  /** The p3 kernel over an arbitrary (doc_id, text) relation. */
  def curriculumOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val parts = s.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val tier = TierBounds.zipWithIndex
      .foldRight(lit(TierBounds.length.toLong)) { case ((b, i), e) =>
        when(col("n_tok") <= b, i.toLong).otherwise(e)
      }
    val base = docs
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("tier", tier)
      .withColumn("__h", pmod(pmod(
        col("doc_id") * lit(1103515245L) + lit(12345L),
        lit(2147483647L)), lit(1000000L)))
    val hBlock = 1000000L / parts + 1
    // bucket id ascends with (tier, digest) — order-preserving
    val bucketed = base.withColumn("__b",
      col("tier") * lit(parts + 1L) + expr(s"__h DIV $hBlock"))
    val counts = bucketed.groupBy(col("__b"))
      .agg(count(lit(1)).as("__n"))
      .as[(Long, Long)].collect().sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.scanLeft(0L)(_ + _._2).init)
    val offsetsDf = offsets.toSeq.toDF("__b", "__off")
    val wLocal = Window.partitionBy(col("__b"))
      .orderBy(col("__h"), col("doc_id"))
    bucketed
      .join(broadcast(offsetsDf), Seq("__b"))
      .withColumn("pos",
        col("__off") + row_number().over(wLocal).cast("long") - 1L)
      .select(col("doc_id"), col("n_tok"), col("tier"), col("pos"))
  }

  /** P4 shard manifest — the write-side bookkeeping step after
    * ordering (p3) and before the actual shard write: every document
    * lands in the shard holding its curriculum position
    * (`pos DIV ShardDocs`), and each shard gets the manifest row a
    * training loader checks before reading — doc count, token count,
    * position range, and an order-sensitive content fingerprint
    * (md5 of the doc_id list in position order). Real WebDataset /
    * Arrow-shard writers emit exactly this sidecar; a wrong or
    * missing manifest is how silent shard truncation ships.
    *
    * Scale shape: positions come from p3's bucket-offset shape (no
    * single-partition window), shard assignment is arithmetic, and
    * the manifest aggregation shuffles once on shard_id; the
    * per-shard collect_list is bounded by ShardDocs (64), never by
    * corpus size. */
  val ShardDocs = 64L

  def p4ShardManifest(s: SparkSession, dir: String): DataFrame =
    shardManifestOf(Tables(s, dir, "documents"))

  /** The p4 kernel over an arbitrary (doc_id, text) relation. */
  def shardManifestOf(docs: DataFrame): DataFrame =
    curriculumOf(docs)
      .withColumn("shard_id", expr(s"pos DIV $ShardDocs"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        min(col("pos")).as("first_pos"),
        max(col("pos")).as("last_pos"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("doc_id")))),
          x => x("doc_id").cast("string")), ",")).as("manifest_md5"))
      .orderBy(col("shard_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p1_pack_sequences" -> (p1PackSequences _),
    "p3_curriculum" -> (p3Curriculum _),
    "p4_shard_manifest" -> (p4ShardManifest _),
    "p2_chunk_windows" -> (p2ChunkWindows _),
    "m9_mix_plan" -> (m9MixPlan _),
    "m11_mix_execute" -> (m11MixExecute _),
    "m13_mix_gap" -> (m13MixGap _),
    // rows-only: L-BFGS float reductions aren't cross-engine
    // reproducible; the spec gates held-out accuracy instead
    "m10_quality_classifier" -> (graft.fit.QualityModel.m10QualityClassifier _),
    // m10's ORACLE-GATED twin (round 11): fixed-point hard-sigmoid
    // logistic GD, every step exact integer sums — the DuckDB side
    // unrolls the iterations as materialized CTEs
    "m10_logistic_det" -> (graft.fit.QualityModel.m10LogisticDet _),
    // m15: the closed-form sibling — integer NB counts, micro-quantized
    // per-token log-probs → fully oracle-checkable (SCALING rule 11)
    "m15_nb_quality" -> (graft.fit.QualityModel.m15NbQuality _),
  )

  // The binned-feature CTE shared VERBATIM by the m15 and
  // m10_logistic_det oracles (shared string or bust — the driver
  // hashes values, a drifted restatement diverges silently)
  private val binnedFCte: String =
    s"""f AS MATERIALIZED (
       | SELECT doc_id,
       |  CASE WHEN (len(list_filter(string_split(text,' '), t -> ${graft.queries.TextOps.stopPred}))::DOUBLE
       |        / len(string_split(text,' '))) * 0.5
       |       + LEAST(len(string_split(text,' '))::DOUBLE / 100.0, 1.0) * 0.5 >= 0.3
       |   THEN 1 ELSE 0 END::BIGINT AS label,
       |  LEAST(FLOOR(len(string_split(text,' '))::DOUBLE / 10.0), 12.0)::BIGINT AS b_ntok,
       |  LEAST(FLOOR(length(text)::DOUBLE / len(string_split(text,' ')) * 2.0), 20.0)::BIGINT AS b_avg_len,
       |  LEAST(FLOOR((len(list_filter(string_split(text,' '), t -> ${graft.queries.TextOps.stopPred}))::DOUBLE
       |        / len(string_split(text,' '))) * 10.0), 10.0)::BIGINT AS b_stop,
       |  LEAST(FLOOR(len(list_distinct(string_split(text,' ')))::DOUBLE
       |        / len(string_split(text,' ')) * 10.0), 10.0)::BIGINT AS b_distinct
       | FROM documents)""".stripMargin

  /** The m10_logistic_det oracle: [[graft.fit.QualityModel.LogisticIters]]
    * GD iterations unrolled as materialized CTEs over the shared
    * binned-feature CTE; constants mirror QualityModel exactly. */
  private def logisticDetSql: String = {
    val k = graft.fit.QualityModel.LogisticK
    val zT = "(pw0 + pw1*b_ntok + pw2*b_avg_len + pw3*b_stop + pw4*b_distinct)"
    def grad(e: String) =
      s"CAST(FLOOR(SUM($e)::DOUBLE / (COUNT(*) * $k.0)) AS BIGINT)"
    val iters = (1 to graft.fit.QualityModel.LogisticIters).map { i =>
      val prev = if (i == 1) "it0" else s"it${i - 1}"
      s"""it$i AS MATERIALIZED (
         | SELECT MIN(pw0) + ${grad("err")} AS w0,
         |  MIN(pw1) + ${grad("err * b_ntok")} AS w1,
         |  MIN(pw2) + ${grad("err * b_avg_len")} AS w2,
         |  MIN(pw3) + ${grad("err * b_stop")} AS w3,
         |  MIN(pw4) + ${grad("err * b_distinct")} AS w4
         | FROM (
         |  SELECT p.w0 AS pw0, p.w1 AS pw1, p.w2 AS pw2, p.w3 AS pw3,
         |   p.w4 AS pw4, t.b_ntok, t.b_avg_len, t.b_stop, t.b_distinct,
         |   t.label*1000000 - GREATEST(0, LEAST(1000000,
         |    CAST(FLOOR($zT::DOUBLE / 4.0) AS BIGINT) + 500000)) AS err
         |  FROM f t CROSS JOIN $prev p
         |  WHERE t.doc_id % 5 <> 0))""".stripMargin
    }.mkString(",\n")
    s"""WITH $binnedFCte,
       |it0 AS (SELECT 0::BIGINT AS w0, 0::BIGINT AS w1, 0::BIGINT AS w2,
       |        0::BIGINT AS w3, 0::BIGINT AS w4),
       |$iters,
       |scored AS (
       | SELECT t.doc_id, t.label,
       |  (p.w0 + p.w1*t.b_ntok + p.w2*t.b_avg_len + p.w3*t.b_stop
       |   + p.w4*t.b_distinct)::BIGINT AS z
       | FROM f t CROSS JOIN it${graft.fit.QualityModel.LogisticIters} p)
       |SELECT doc_id, label,
       | CASE WHEN z > 0 THEN 1 ELSE 0 END::BIGINT AS prediction,
       | z AS margin_micro,
       | (label = CASE WHEN z > 0 THEN 1 ELSE 0 END) AS correct
       |FROM scored ORDER BY doc_id""".stripMargin
  }

  // The p3 position computation, shared VERBATIM by the p3 and p4
  // oracles (the driver hashes values, so a drifted re-statement of
  // the position rule would silently diverge — shared string or bust)
  private val posCte: String =
    """WITH t AS (
      | SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tok
      | FROM documents),
      |d AS (
      | SELECT doc_id, n_tok,
      |  CASE WHEN n_tok <= 32 THEN 0 WHEN n_tok <= 56 THEN 1
      |       WHEN n_tok <= 76 THEN 2 ELSE 3 END::BIGINT AS tier,
      |  ((doc_id * 1103515245 + 12345) % 2147483647) % 1000000 AS h
      | FROM t),
      |p AS (
      | SELECT doc_id, n_tok, tier,
      |  (ROW_NUMBER() OVER (ORDER BY tier, h, doc_id) - 1)::BIGINT AS pos
      | FROM d)""".stripMargin

  val oracle: Map[String, String] = Map(
    // m15: discretized NB quality classifier — the weak label and the
    // four binned features restate t2/m10's expressions in identical
    // double arithmetic; per-(feature,bin,class) log-probs quantize to
    // integer micro-units BEFORE the per-doc sum (the t10/t11/s5
    // discipline), so scoring is exact integer arithmetic
    "m10_logistic_det" -> logisticDetSql,
    "m15_nb_quality" ->
      s"""WITH $binnedFCte,
         |mf AS MATERIALIZED (
         | SELECT doc_id, label, 'avg_len' AS fname, b_avg_len AS bin FROM f
         | UNION ALL SELECT doc_id, label, 'distinct', b_distinct FROM f
         | UNION ALL SELECT doc_id, label, 'ntok', b_ntok FROM f
         | UNION ALL SELECT doc_id, label, 'stop', b_stop FROM f),
         |consts AS MATERIALIZED (
         | SELECT
         |  (SELECT COUNT(*) FROM f WHERE doc_id % 5 <> 0 AND label = 0)::BIGINT AS n0,
         |  (SELECT COUNT(*) FROM f WHERE doc_id % 5 <> 0 AND label = 1)::BIGINT AS n1),
         |model AS MATERIALIZED (
         | SELECT fname, bin,
         |  MAX(CASE WHEN label = 0 THEN ts END) AS ts0m,
         |  MAX(CASE WHEN label = 1 THEN ts END) AS ts1m
         | FROM (
         |  SELECT fname, bin, label,
         |   ROUND(1e6 * LN((COUNT(*) + 1)::DOUBLE /
         |    ((CASE WHEN label = 0 THEN (SELECT n0 FROM consts)
         |           ELSE (SELECT n1 FROM consts) END)::DOUBLE
         |     + (CASE fname WHEN 'ntok' THEN 13 WHEN 'avg_len' THEN 21
         |        WHEN 'stop' THEN 11 ELSE 11 END)::DOUBLE)))::BIGINT AS ts
         |  FROM mf WHERE doc_id % 5 <> 0
         |  GROUP BY fname, bin, label) GROUP BY fname, bin),
         |contrib AS (
         | SELECT m.doc_id,
         |  SUM(COALESCE(md.ts0m,
         |   ROUND(1e6 * LN(1.0 / ((SELECT n0 FROM consts)
         |    + CASE m.fname WHEN 'ntok' THEN 13 WHEN 'avg_len' THEN 21
         |      WHEN 'stop' THEN 11 ELSE 11 END)::DOUBLE))::BIGINT))::BIGINT AS s0,
         |  SUM(COALESCE(md.ts1m,
         |   ROUND(1e6 * LN(1.0 / ((SELECT n1 FROM consts)
         |    + CASE m.fname WHEN 'ntok' THEN 13 WHEN 'avg_len' THEN 21
         |      WHEN 'stop' THEN 11 ELSE 11 END)::DOUBLE))::BIGINT))::BIGINT AS s1
         | FROM mf m LEFT JOIN model md USING (fname, bin)
         | GROUP BY m.doc_id),
         |pri AS (
         | SELECT
         |  ROUND(1e6 * LN((n0 + 1.0) / (n0 + n1 + 2.0)))::BIGINT AS p0,
         |  ROUND(1e6 * LN((n1 + 1.0) / (n0 + n1 + 2.0)))::BIGINT AS p1
         | FROM consts),
         |scored AS (
         | SELECT l.doc_id, l.label,
         |  c.s0 + (SELECT p0 FROM pri) AS sc0,
         |  c.s1 + (SELECT p1 FROM pri) AS sc1
         | FROM f l JOIN contrib c USING (doc_id))
         |SELECT doc_id, label,
         | CASE WHEN sc1 > sc0 THEN 1 ELSE 0 END::BIGINT AS prediction,
         | (sc1 - sc0)::BIGINT AS margin_micro,
         | (label = CASE WHEN sc1 > sc0 THEN 1 ELSE 0 END) AS correct
         |FROM scored ORDER BY doc_id""".stripMargin,
    // p3: the oracle's single global ROW_NUMBER is the semantic spec;
    // the Spark side reaches the same permutation through the
    // bucket-offset shape (no single-partition window)
    "p3_curriculum" ->
      s"""$posCte
         |SELECT doc_id, n_tok, tier, pos FROM p ORDER BY doc_id""".stripMargin,
    // p4: shard grouping + order-sensitive manifest over the SAME
    // position CTE; md5(doc_id list ORDER BY pos) is the fingerprint
    "p4_shard_manifest" ->
      s"""$posCte
         |SELECT (pos // $ShardDocs)::BIGINT AS shard_id,
         | COUNT(*)::BIGINT AS n_docs,
         | SUM(n_tok)::BIGINT AS n_tokens,
         | MIN(pos)::BIGINT AS first_pos,
         | MAX(pos)::BIGINT AS last_pos,
         | md5(string_agg(doc_id::VARCHAR, ',' ORDER BY pos)) AS manifest_md5
         |FROM p GROUP BY 1 ORDER BY shard_id""".stripMargin,
    "p1_pack_sequences" ->
      s"""WITH t AS (
         | SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tok
         | FROM documents),
         |o AS (
         | SELECT doc_id, n_tok,
         |  COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS off
         | FROM t),
         |e AS (
         | SELECT off, off + n_tok AS fin,
         |  UNNEST(range(off // $ChunkCap, (off + n_tok - 1) // $ChunkCap + 1)) AS chunk_id
         | FROM o)
         |SELECT chunk_id, COUNT(*)::BIGINT AS n_docs,
         | SUM(LEAST(fin, (chunk_id + 1) * $ChunkCap)
         |   - GREATEST(off, chunk_id * $ChunkCap))::BIGINT AS n_tokens,
         | SUM(CASE WHEN off < chunk_id * $ChunkCap THEN 1 ELSE 0 END)::BIGINT AS n_carry_in
         |FROM e GROUP BY chunk_id ORDER BY chunk_id""".stripMargin,
    "m13_mix_gap" ->
      """WITH s AS (
        | SELECT source, COUNT(*)::BIGINT AS n_docs,
        |  SUM(len(string_split(text, ' ')))::BIGINT AS n_tokens
        | FROM documents GROUP BY source),
        |t AS (SELECT SUM(n_tokens)::BIGINT AS tot,
        |             COUNT(*)::BIGINT AS n_sources FROM s)
        |SELECT source, n_docs, n_tokens,
        | ROUND(n_tokens * 1e6 / tot)::BIGINT AS share_ppm,
        | ROUND(1e6 / n_sources)::BIGINT AS target_ppm,
        | ROUND(n_tokens * 1e6 / tot)::BIGINT
        |   - ROUND(1e6 / n_sources)::BIGINT AS gap_ppm,
        | ROUND(tot::DOUBLE / n_sources / n_tokens * 1e6)::BIGINT AS upweight_micro
        |FROM s CROSS JOIN t ORDER BY source""".stripMargin,
    "m9_mix_plan" ->
      s"""WITH agg AS (
         | SELECT source, COUNT(*)::BIGINT AS n_docs,
         |  SUM(len(string_split(text, ' ')))::BIGINT AS n_tokens,
         |  CASE WHEN regexp_extract(source, '^src([0-9]+)', 1)::INT < 10
         |       THEN 2 ELSE 1 END::BIGINT AS weight
         | FROM documents GROUP BY source),
         |tot AS (SELECT SUM(weight)::BIGINT AS sum_w FROM agg)
         |SELECT source, n_docs, n_tokens, weight,
         | FLOOR($MixBudget * weight / sum_w)::BIGINT AS target_tokens,
         | ROUND(LEAST(1.0,
         |   FLOOR($MixBudget * weight / sum_w) / n_tokens), 6) AS sample_rate,
         | LEAST(n_tokens, FLOOR($MixBudget * weight / sum_w)::BIGINT) AS expected_tokens
         |FROM agg CROSS JOIN tot ORDER BY source""".stripMargin,
    "m11_mix_execute" ->
      s"""WITH agg AS (
         | SELECT source, COUNT(*)::BIGINT AS n_docs,
         |  SUM(len(string_split(text, ' ')))::BIGINT AS n_tokens,
         |  CASE WHEN regexp_extract(source, '^src([0-9]+)', 1)::INT < 10
         |       THEN 2 ELSE 1 END::BIGINT AS weight
         | FROM documents GROUP BY source),
         |tot AS (SELECT SUM(weight)::BIGINT AS sum_w FROM agg),
         |plan AS (
         | SELECT source, ROUND(LEAST(1.0,
         |   FLOOR($MixBudget * weight / sum_w) / n_tokens), 6) AS sample_rate
         | FROM agg CROSS JOIN tot),
         |docs AS (
         | SELECT source, doc_id,
         |  len(string_split(text, ' '))::BIGINT AS n_tok FROM documents),
         |k AS (
         | SELECT d.source, d.n_tok,
         |  ((d.doc_id * 1103515245 + 12345) % 2147483647) % 1000000
         |    < FLOOR(p.sample_rate * 1e6 + 0.5) AS keep
         | FROM docs d JOIN plan p USING (source))
         |SELECT source, COUNT(*)::BIGINT AS n_docs,
         | SUM(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_sampled,
         | SUM(CASE WHEN keep THEN n_tok ELSE 0 END)::BIGINT AS n_tokens_sampled
         |FROM k GROUP BY source ORDER BY source""".stripMargin,
    "p2_chunk_windows" ->
      s"""WITH tok AS (
         | SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |ch AS (
         | SELECT doc_id, t, UNNEST(range(0,
         |   CASE WHEN len(t) <= $Win THEN 1
         |        ELSE (len(t) - $Win + ${Stride - 1}) // $Stride + 1 END))
         |   AS chunk_idx
         | FROM tok)
         |SELECT doc_id, chunk_idx::BIGINT AS chunk_idx,
         | len(t[chunk_idx*$Stride+1 : chunk_idx*$Stride+$Win])::BIGINT
         |   AS n_tokens,
         | md5(array_to_string(t[chunk_idx*$Stride+1 : chunk_idx*$Stride+$Win],
         |   ' ')) AS chunk_hash
         |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin,
  )
}
