package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.DerivedState
import graft.sources.Versioned

/** Measures drift-triggered state maintenance at scale (round 16,
  * VERDICT r15 #4): the claim is maintenance cost ∝ DRIFTED fraction,
  * never O(corpus rebuild).
  *
  * Band-state arm: build the minhash band state over the scaled
  * corpus, then recap at a descending cap ladder — the no-trip rung
  * (default 4096 cap) is measurement-only, and each tripping rung's
  * wall time is recorded against the rows it actually removed.
  *
  * IVF arm: build centroids+postings, measure the assignment-distance
  * drift fraction (healthy ≈ 0.1 by the p90 construction), append a
  * SHIFTED 20 % increment, drain it, measure again (drifted), and let
  * the gate retrain — recording measure cost (sample-sized, flat)
  * separately from retrain cost (the explicit rebuild).
  *
  * Usage: runMain graft.DriftMaintScale <scaledSfDir> <workDir>
  * <out.json> <label>
  */
object DriftMaintScale {
  private def r3(x: Double): Double = math.rint(x * 1000) / 1000

  def main(args: Array[String]): Unit = {
    val Array(srcDir, workDir, outJson, label) = args.take(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
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

    // ---------------------------------------------- band-state arm
    val docsSrc = s"$workDir/docs"
    val bandSt = s"$workDir/bandstate"
    val docs = Tables(spark, srcDir, "documents")
      .select(col("doc_id"), col("text"))
    val nDocs = docs.count()
    Versioned.commit(docs, docsSrc)
    val (_, buildSec) = timed {
      DerivedState.maintainMinhashBandState(spark, docsSrc, bandSt)
    }
    val stateRows = Versioned.read(spark, bandSt).count()
    // bucket-size quantiles pick caps that trip at two fractions
    val sizes = Versioned.read(spark, bandSt)
      .groupBy("band_idx", "band_key").count()
      .select(col("count")).orderBy(col("count"))
    val nBuckets = sizes.count()
    def quantile(q: Double): Long = {
      val idx = math.min(nBuckets - 1, (q * (nBuckets - 1)).toLong)
      sizes.limit((idx + 1).toInt).orderBy(col("count").desc)
        .head().getLong(0)
    }
    val p999 = math.max(1L, quantile(0.999))
    val p99 = math.max(1L, quantile(0.99))
    System.err.println(s"[drift-maint] $label: $nDocs docs, " +
      s"$stateRows state rows, $nBuckets buckets, " +
      s"p99=$p99 p999=$p999")
    val ((b0, r0), sec0) = timed {
      DerivedState.recapBandState(spark, bandSt) // default 4096 cap
    }
    val ((b1, r1), sec1) = timed {
      DerivedState.recapBandState(spark, bandSt, p999.toInt)
    }
    val ((b2, r2), sec2) = timed {
      DerivedState.recapBandState(spark, bandSt, p99.toInt)
    }
    // ledger survives every recap: a fresh commit still drains
    Versioned.commit(docs.limit(100)
      .withColumn("doc_id", col("doc_id") + lit(1000000000L)), docsSrc)
    val drainAfter =
      DerivedState.maintainMinhashBandState(spark, docsSrc, bandSt)
    require(drainAfter.nonEmpty, "ledger lost: post-recap drain no-oped")

    // ------------------------------------------------------ IVF arm
    val embSrc = s"$workDir/emb"
    val centsT = s"$workDir/cents"
    val postsT = s"$workDir/posts"
    val emb = Tables(spark, srcDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val nVec = emb.count()
    Versioned.commit(emb, embSrc)
    val nlist = 256
    val (_, trainSec) = timed {
      DerivedState.buildIvfCentroids(spark, embSrc, centsT,
        "embedding", "vec_id", nlist = nlist, iters = 2, seed = 42L)
    }
    val (_, drainSec) = timed {
      DerivedState.maintainIvfPostings(spark, embSrc, centsT, postsT,
        "embedding", "vec_id")
    }
    val (fHealthy, measSec) = timed {
      DerivedState.ivfDriftFraction(spark, centsT, postsT)
    }
    // shifted 20% increment: the distribution the centroids never saw
    val shifted = emb.limit((nVec / 5).toInt)
      .select((col("vec_id") + lit(1000000000L)).as("vec_id"),
        transform(col("embedding"), x => x + lit(2.0f)).as("embedding"))
    Versioned.commit(shifted, embSrc)
    val (_, drain2Sec) = timed {
      DerivedState.maintainIvfPostings(spark, embSrc, centsT, postsT,
        "embedding", "vec_id")
    }
    val (fDrifted, meas2Sec) = timed {
      DerivedState.ivfDriftFraction(spark, centsT, postsT)
    }
    val ((fGate, retrained), retrainSec) = timed {
      DerivedState.retrainIvfIfDrifted(spark, embSrc, centsT, postsT,
        "embedding", "vec_id", nlist = nlist, iters = 2, seed = 42L)
    }
    require(retrained, s"shifted corpus must trip the gate ($fGate)")
    val fAfter = DerivedState.ivfDriftFraction(spark, centsT, postsT)

    val json =
      s"""{"label":"$label","n_docs":$nDocs,""" +
      s""""band_state":{"rows":$stateRows,"buckets":$nBuckets,""" +
      s""""build_sec":${r3(buildSec)},""" +
      s""""rungs":[""" +
      s"""{"cap":4096,"drifted_buckets":$b0,"rows_removed":$r0,"sec":${r3(sec0)}},""" +
      s"""{"cap":$p999,"drifted_buckets":$b1,"rows_removed":$r1,"sec":${r3(sec1)}},""" +
      s"""{"cap":$p99,"drifted_buckets":$b2,"rows_removed":$r2,"sec":${r3(sec2)}}],""" +
      s""""post_recap_drain_ok":true},""" +
      s""""ivf":{"n_vectors":$nVec,"nlist":$nlist,""" +
      s""""train_sec":${r3(trainSec)},"drain_sec":${r3(drainSec)},""" +
      s""""measure_sec":${r3(measSec)},""" +
      s""""fraction_healthy":${r3(fHealthy)},""" +
      s""""shifted_drain_sec":${r3(drain2Sec)},""" +
      s""""measure2_sec":${r3(meas2Sec)},""" +
      s""""fraction_drifted":${r3(fDrifted)},""" +
      s""""retrain_sec":${r3(retrainSec)},""" +
      s""""fraction_after_retrain":${r3(fAfter)}}}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outJson), json)
    System.err.println(s"[drift-maint] $json")
    spark.stop()
  }
}
