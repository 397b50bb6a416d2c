package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The materialized cluster-labels surface (operators.DupClusters):
  * CC correctness on planted graphs, fixpoint-once semantics of the
  * session store, and equality of the d13 survivorship consumed from
  * the store vs freshly recomputed labels. */
class DupClustersSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions",
      "org.apache.spark.sql.graftx.GraftExtensions")
    .getOrCreate()

  import operators.DupClusters

  test("computeLabels: planted cliques, chains, and singletons label by component min") {
    import spark.implicits._
    // components: {1,2,3} clique, {10,11,12,13} chain (diameter 3 —
    // exercises multi-round propagation), {20,21} pair; 30, 31 singletons
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (12L, 13L),
      (21L, 20L) // reversed order: undirected semantics
    ).toDF("doc_a", "doc_b")
    val universe = (Seq(1L, 2L, 3L, 10L, 11L, 12L, 13L, 20L, 21L, 30L, 31L))
      .toDF("doc_id")
    val out = DupClusters.computeLabels(pairs, universe).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L,
      30L -> 30L, 31L -> 31L))
  }

  test("labelsFor materializes once: second consumer runs zero Spark jobs") {
    DupClusters.invalidate()
    val sf = "/root/testdata/sf0.001"
    // first touch: runs the d3 pair build + CC fixpoint (many jobs)
    val first = queries.DedupOps.d6DupClusters(spark, sf)
    first.write.format("noop").mode("overwrite").save()

    // parquet footer/schema reads are inherent to DataFrame
    // construction (the CacheHygieneSpec convention) — everything
    // else at build time means the CC pipeline re-ran
    @volatile var jobs = List.empty[String]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = js.stageInfos.lastOption.map(_.name).getOrElse("")
        if (!site.startsWith("parquet at")) jobs ::= site
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // second touch BUILDS on the checkpointed table — zero jobs
      // before the consumer's own action (the materialize contract)
      val second = queries.DedupOps.d13KeepBest(spark, sf)
      Thread.sleep(100) // let the async listener bus settle (CacheHygieneSpec convention)
      assert(jobs.isEmpty,
        s"d13 re-ran upstream work at build time despite materialized labels: $jobs")
      second.write.format("noop").mode("overwrite").save()
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("survivorship from the materialized table equals a fresh recompute") {
    val sf = "/root/testdata/sf0.001"
    val viaStore = queries.DedupOps.d13KeepBest(spark, sf).collect().toSeq

    // fresh labels, bypassing the store entirely
    val freshLabels = DupClusters.computeLabels(
      queries.DedupOps.d3HammingPairs(spark, sf)
        .select(col("doc_a"), col("doc_b")),
      Tables(spark, sf, "documents").select(col("doc_id")))
    val quality = queries.TextOps.t2QualityScore(spark, sf)
      .select(col("doc_id"), col("quality"))
    val fresh = queries.DedupOps.keepBestOf(freshLabels, quality)
      .collect().toSeq

    assert(viaStore === fresh)
  }
}
