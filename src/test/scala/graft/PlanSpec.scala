package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions for the SCALING.md claims: pushdown,
  * pruning, broadcast joins. These are the properties that decide
  * 100 TB behavior — a regression here is a performance bug even if
  * results stay correct. */
class PlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions",
      "org.apache.spark.sql.graftx.GraftExtensions")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def formatted(df: org.apache.spark.sql.DataFrame): String = {
    val qe = df.queryExecution
    org.apache.spark.sql.execution.ExplainMode.fromString("formatted") match {
      case m => qe.explainString(m)
    }
  }

  test("engine session default: 64k AQE coalesce floor ships with GraftExtensions") {
    // round 17 (VERDICT r16 #2): the floor must come from the ENGINE
    // (GraftExtensions.applySessionDefaults), not the harness session
    // builders — library users get what the bench measures.
    val key = "spark.sql.adaptive.coalescePartitions.minPartitionSize"
    val s2 = spark.newSession() // same extensions, fresh session conf
    s2.range(10).selectExpr("sum(id)").collect() // builds the optimizer
    assert(s2.conf.get(key) == "64k")
    // an explicitly-set session conf always wins over the default
    val s3 = spark.newSession()
    s3.conf.set(key, "2m")
    s3.range(10).selectExpr("sum(id)").collect()
    assert(s3.conf.get(key) == "2m")
  }

  test("projection query prunes columns and pushes the IsNotNull filter") {
    val plan = formatted(queries.Relational.f1Projection(spark, sf))
    assert(plan.contains("PushedFilters: [IsNotNull(l_extendedprice)]"))
    // ReadSchema must carry only the 3 projected columns
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(readSchema.contains("l_orderkey") &&
      readSchema.contains("l_linenumber") &&
      readSchema.contains("l_extendedprice"))
    assert(!readSchema.contains("l_shipdate") && !readSchema.contains("l_quantity"))
  }

  test("range filter pushes the BETWEEN bounds to the scan") {
    val plan = formatted(queries.Relational.f8RangeFilter(spark, sf))
    assert(plan.contains("GreaterThanOrEqual(p_size,10)"))
    assert(plan.contains("LessThanOrEqual(p_size,20)"))
  }

  test("star join broadcasts every dimension (no fact-side extra shuffle)") {
    val plan = formatted(queries.Relational.j3RevenueByRegion(spark, sf))
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(nBroadcast >= 3) // customer, nation, region at minimum
  }

  test("semi and anti joins plan as join strategies, not subquery loops") {
    assert(formatted(queries.Relational.j4SemiJoin(spark, sf)).contains("LeftSemi"))
    assert(formatted(queries.Relational.u2AntiJoin(spark, sf)).contains("LeftAnti"))
  }

  test("split assignment plans with no single-partition exchange (scale-safe rank)") {
    val df = spark.read.parquet(s"$sf/orders.parquet")
    // audit the lazy plan: the production assign() checkpoints its
    // result (the returned plan would just be an RDD scan)
    val plan = formatted(operators.Splits.assignImpl(
      df, "o_orderkey", "plancheck", 0.8, 7L, materialize = false))
    assert(!plan.contains("SinglePartition"),
      "global-window rank would funnel all rows through one task")
    assert(plan.toLowerCase.contains("rangepartitioning"),
      "rank must ride a distributed range partitioning")
  }

  test("dbfilter scalar reference stays a broadcast join (no collect in plan)") {
    val plan = formatted(queries.Relational.f4DbfilterScalar(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"))
  }

  test("stratified sample windows are partitioned by the stratum key") {
    val plan = formatted(queries.Extras.o7StratifiedSample(spark, sf))
    assert(!plan.contains("SinglePartition"),
      "an unpartitioned window would funnel the corpus through one task")
    assert(plan.contains("Window"))
  }

  test("DOS-convergence scalars are broadcast joins, not collects") {
    val plan = formatted(queries.Relational.a3DosConvergence(spark, sf))
    val nBroadcast = "BroadcastNestedLoopJoin".r.findAllIn(plan).length +
      "BroadcastHashJoin".r.findAllIn(plan).length
    assert(nBroadcast >= 2, "ref-candidate and best-candidate scalars " +
      "must ride broadcast single-row joins")
    assert(!plan.contains("CollectLimit"))
  }

  test("IVF/LSH candidate joins are equi-joins on the short key") {
    // round 14: SUB-CAP corpora (the fixture's 500 vectors) probe the
    // whole pool through a BROADCAST of the tiny corpus — the exact
    // regime, by design (IntKmeans.TrainCap). The banded equi-join is
    // the AT-SCALE plan, asserted below on an above-cap corpus.
    val lshSmall = formatted(operators.Similarity.s2AnnLsh(spark, sf))
    assert(lshSmall.contains("BroadcastNestedLoopJoin") ||
      lshSmall.contains("BroadcastHashJoin"),
      "sub-cap LSH must broadcast the corpus, never shuffle it")
    assert(!lshSmall.contains("CartesianProduct"),
      "even the exact small-corpus scan must broadcast, not cartesian")
    // ABOVE the cap: the banded equi-join, never all-pairs
    import spark.implicits._
    val big = (0L until (graft.operators.IntKmeans.TrainCap + 200L))
      .map(i => (i, Seq.tabulate(8)(j => ((i * 31 + j) % 997).toFloat / 1e3f)))
      .toDF("vec_id", "embedding")
    val lshBig = formatted(graft.operators.IntKmeans.lshTopK(
      big, big.where(org.apache.spark.sql.functions.col("vec_id") < 3),
      "embedding", "vec_id",
      k = 5, dim = 8, seed = 42L))
    assert(lshBig.contains("SortMergeJoin") ||
      lshBig.contains("ShuffledHashJoin") ||
      lshBig.contains("BroadcastHashJoin"),
      "at-scale bucket join must be an equi-join")
    assert(!lshBig.contains("CartesianProduct") &&
      !lshBig.contains("BroadcastNestedLoopJoin"),
      "at-scale ANN must never plan an all-pairs join")
  }

  test("minhash near-dup candidates come from a band equi-join, never a cartesian") {
    val plan = formatted(queries.DedupOps.nearDupPairs(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "candidate generation must stay an equi-join on (source, band_idx, band_key)")
    // the verify stage joins candidates to per-doc token sets by key
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"))
  }

  test("decontamination broadcasts the benchmark gram set (corpus never shuffles on gram)") {
    val plan = formatted(queries.DedupOps.d8Decontaminate(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      "the small benchmark gram set must broadcast")
    assert(!plan.contains("CartesianProduct"))
  }

  test("tf-idf: N rides a broadcast single-row join, wordcount aggs are partial") {
    val plan = formatted(queries.TextOps.t10TfIdf(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      "the corpus-count scalar must broadcast, not collect")
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"),
      "token counts must map-side combine before the shuffle")
  }

  test("sequence packing windows are bucket-partitioned (no single-partition cumsum)") {
    val plan = formatted(queries.PackOps.p1PackSequences(spark, sf))
    assert(plan.contains("Window"))
    val windowLines = plan.linesIterator.filter(_.contains("Window")).mkString("\n")
    assert(!plan.contains("SinglePartition"),
      "a global-order cumulative sum would funnel the corpus through one task:\n" + windowLines)
  }

  test("collocations: top-k is a TakeOrdered, N broadcasts, no cartesian") {
    val plan = formatted(queries.TextOps.t12Collocations(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"),
      "top-50 must plan as TakeOrdered, not a global sort + limit")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      "the bigram-total scalar must broadcast, not collect")
    assert(!plan.contains("CartesianProduct"))
  }

  test("chunk windows: single scan, no shuffle except the determinism sort") {
    val plan = formatted(queries.PackOps.p2ChunkWindows(spark, sf))
    assert(plan.contains("Generate"), "the window explode must be a Generate")
    // exactly one exchange: the final range partitioning for the
    // oracle-determinism orderBy — no join/aggregate shuffle exists
    val exchanges = plan.linesIterator
      .count(_.matches("""\(\d+\) Exchange.*"""))
    assert(exchanges === 1, s"expected only the sort exchange, got:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("HashAggregate"))
  }

  test("salted skew join: build side replicates via Generate, join keys carry the salt") {
    val plan = formatted(queries.Relational.j10SkewJoin(spark, sf))
    assert(plan.contains("Generate"),
      "build-side salt replication must plan as a sequence explode")
    assert(plan.contains("__salt"),
      "the join must run on the salted key pair")
    assert(!plan.contains("CartesianProduct"))
  }

  test("sliding windows: no single-partition window, corpus collapses in a partial agg") {
    val plan = formatted(queries.Extras.w7SlidingWindow(spark, sf))
    assert(!plan.contains("SinglePartition"),
      "the sliding-window agg must shuffle on (window, event_type), not funnel")
    assert(plan.contains("HashAggregate"),
      "overlapping windows must aggregate, not window-function, the corpus")
  }

  test("incremental minhash probe: history rides the checkpoint, only the batch is scanned") {
    operators.SessionTable.invalidate()
    queries.DedupOps.d14IncrementalMinhash(spark, sf) // populate the store
    val plan = formatted(queries.DedupOps.d14IncrementalMinhash(spark, sf))
    // the batch side scans parquet (its subtrees unify at runtime via
    // exchange reuse); the HISTORY side must ride the checkpointed
    // table — its defining NOT-batch filter may never reappear as a
    // recompute, and an RDD scan must be present
    assert(!plan.contains("NOT (pmod"),
      s"history side recomputed its filter instead of riding the checkpoint:\n$plan")
    assert(plan.contains("Scan ExistingRDD"),
      s"no checkpointed history scan in the plan:\n$plan")
  }

  test("edit-distance join: equi-join candidates, never a cartesian or nested loop") {
    val plan = formatted(queries.DedupOps.d16EditdistJoin(spark, sf))
    assert(!plan.contains("CartesianProduct"),
      "PassJoin exists to avoid the O(N²) pair space")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "candidate generation must be an equi-join on segment keys")
  }

  // formatted explain prints every node twice (tree + numbered detail)
  // — count the detail headers / Arguments lines, which appear exactly
  // once per physical node.
  private def nScans(plan: String): Int =
    "\\(\\d+\\) Scan parquet".r.findAllIn(plan).length
  private def nHashExchanges(plan: String): Int =
    "Arguments: hashpartitioning".r.findAllIn(plan).length

  test("cube plans as one Expand + hash aggregates, not one scan per grouping set") {
    val plan = formatted(queries.Relational.a11Cube(spark, sf))
    assert(plan.contains("Expand"),
      "CUBE must expand grouping sets inline")
    assert(nScans(plan) === 1,
      "all four grouping sets must share a single orders scan")
    assert(nHashExchanges(plan) === 1,
      "all four grouping sets must ride one keyed shuffle")
  }

  test("SCD2 windows share one customer-key shuffle") {
    val plan = formatted(queries.Relational.u5Scd2Merge(spark, sf))
    assert(!plan.contains("SinglePartition"),
      "change-fold windows must stay keyed by o_custkey")
    assert(plan.contains("hashpartitioning(o_custkey"))
    // lag and lead ride the same sort order: exactly one hash exchange
    assert(nHashExchanges(plan) === 1,
      s"expected ONE keyed shuffle for both windows:\n$plan")
  }

  test("time-weighted average: window and agg share the user_id partitioning") {
    val plan = formatted(queries.Extras.w8TimeWeighted(spark, sf))
    assert(!plan.contains("SinglePartition"))
    assert(nHashExchanges(plan) === 1,
      s"lead window and weighted agg must reuse one user_id shuffle:\n$plan")
  }

  test("z-order layout: dim stats broadcast, one bucket-agg shuffle") {
    val plan = formatted(queries.Extras.z1ZorderLayout(spark, sf))
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastNestedLoopJoin"),
      "the 1-row dim-stats must broadcast onto the scan")
    assert(nHashExchanges(plan) === 1,
      s"the interleave must stay stateless: only the bucket agg shuffles:\n$plan")
  }

  test("keyword extraction: rank window prunes via WindowGroupLimit, no SinglePartition") {
    val plan = formatted(queries.TextOps.t16Keywords(spark, sf))
    assert(plan.contains("WindowGroupLimit"),
      s"the kw_rank <= 3 predicate must prune group buffers before the sort:\n$plan")
    // the rank window must partition by doc_id (the scalar count(*)
    // agg's own 1-row SinglePartition exchange is benign)
    assert(plan.contains("windowspecdefinition(doc_id"),
      s"rank window must be keyed by doc_id:\n$plan")
  }

  test("DSIR weights: model and constants broadcast, corpus never nested-loops on itself") {
    val plan = formatted(queries.TextOps.t17DsirWeights(spark, sf))
    assert(plan.contains("BroadcastExchange"),
      "the vocab²-bounded model side must broadcast")
    assert(!plan.contains("CartesianProduct"))
  }

  test("event transitions: lag window keyed by user, normalize window keyed by prev_type") {
    val plan = formatted(queries.Extras.w9Transitions(spark, sf))
    assert(!plan.contains("SinglePartition"),
      s"no window may collapse to one partition:\n$plan")
  }

  test("mix gap: corpus collapses in one source agg, totals broadcast") {
    val plan = formatted(queries.PackOps.m13MixGap(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      "the 1-row totals must broadcast")
    assert(!plan.contains("CartesianProduct"))
  }

  test("ngram novelty: gram-keyed equi-join, no cartesian, no single-partition window") {
    val plan = formatted(queries.TextOps.t18NgramNovelty(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"the owner join must stay a gram-keyed equi-join:\n$plan")
    assert(!plan.contains("SinglePartition"))
  }

  test("k-means summary: one cell-keyed agg over the GEMM assignment scan") {
    val plan = formatted(
      queries.SimilarityOps.c1KmeansSummary(spark, sf))
    assert(plan.contains("MapPartitions"), "assignment must be the batched-GEMM map")
    assert(plan.contains("BroadcastExchange"), "the k-row centroid table must broadcast")
    assert(!plan.contains("SinglePartition"))
  }
}
