package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DerivedState, IntKmeans, MinHash}
import graft.sources.Versioned

/** CDF-maintained derived state (round 15, VERDICT r14 #5):
  * incrementally-maintained index tables must equal the batch rebuild
  * after every drain — across appends, deletes and updates — and each
  * drain must be exactly-once (ledgered) and ∝ batch-sized. */
class DerivedStateSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions",
      "org.apache.spark.sql.graftx.GraftExtensions")
    .getOrCreate()

  private def tmp(pfx: String): String =
    Files.createTempDirectory(pfx).toString

  private def docsDf(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("minhash band state: drained equality with the batch rebuild " +
    "across append / delete / update; drains are exactly-once") {
    val src = tmp("g-ds-src-")
    val st = tmp("g-ds-st-")
    def rebuild(): DataFrame =
      graft.queries.DedupOps.minhashBandState(
        MinHash.signatures(Versioned.read(spark, src), "doc_id", "text",
          k = graft.queries.DedupOps.K, bands = 2, shingleN = 3,
          materialize = false))
    def drain(): Option[(Int, Int)] =
      DerivedState.maintainMinhashBandState(spark, src, st)
    def state(): DataFrame = Versioned.read(spark, st)

    // v1: initial corpus
    Versioned.commit(docsDf(Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "entirely different content about spark tables"))), src)
    assert(drain().contains((0, 1)))
    assert(sortedRows(state()) === sortedRows(rebuild()))
    // idempotent: nothing new -> no drain, state unchanged
    assert(drain().isEmpty)

    // v2: append two docs -> drain applies only the batch
    Versioned.commit(docsDf(Seq(
      (4L, "the quick brown fox jumps over the lazy dog"),
      (5L, "yet another spark document about band state"))), src)
    assert(drain().contains((1, 2)))
    assert(sortedRows(state()) === sortedRows(rebuild()))

    // v3: delete a doc -> its band rows leave the state
    Versioned.deleteWhere(spark, src, col("doc_id") === 2L)
    assert(drain().contains((2, 3)))
    assert(state().where(col("h_id") === 2L).count() === 0L)
    assert(sortedRows(state()) === sortedRows(rebuild()))

    // v4: update a doc's text -> stale rows replaced by fresh ones
    Versioned.updateWhere(spark, src, col("doc_id") === 3L,
      Map("text" -> lit("completely rewritten text changes bands")))
    assert(drain().contains((3, 4)))
    assert(sortedRows(state()) === sortedRows(rebuild()))

    // one MORE source commit + two drains: second is a no-op
    Versioned.commit(docsDf(Seq((6L, "a final appended document"))), src)
    assert(drain().isDefined)
    assert(drain().isEmpty)
    assert(sortedRows(state()) === sortedRows(rebuild()))
  }

  test("minhash state probe ≡ probe against the recomputed history") {
    val src = tmp("g-ds-src-")
    val st = tmp("g-ds-st-")
    val corpus = (1L to 40L).map(i =>
      (i, s"shared prefix tokens for group ${i % 5} suffix $i"))
    Versioned.commit(docsDf(corpus), src)
    DerivedState.maintainMinhashBandState(spark, src, st)
    val batch = MinHash.signatures(
      docsDf(Seq((100L, "shared prefix tokens for group 2 suffix x"))),
      "doc_id", "text", k = graft.queries.DedupOps.K, bands = 2,
      shingleN = 3, materialize = false)
    val viaState = graft.queries.DedupOps
      .incrementalProbeAgainstState(batch, Versioned.read(spark, st))
    val viaHistory = graft.queries.DedupOps.incrementalProbeOf(batch,
      MinHash.signatures(Versioned.read(spark, src), "doc_id", "text",
        k = graft.queries.DedupOps.K, bands = 2, shingleN = 3,
        materialize = false))
    assert(sortedRows(viaState) === sortedRows(viaHistory))
  }

  test("IVF postings: fixed centroids, incrementally-maintained " +
    "postings equal the batch assignment across append + delete") {
    import spark.implicits._
    val src = tmp("g-ds-vec-")
    val cents = tmp("g-ds-cent-")
    val posts = tmp("g-ds-post-")
    def vecsDf(ids: Seq[Long]): DataFrame = ids.map { i =>
      val r = new scala.util.Random(i)
      (i, Seq.fill(8)((r.nextInt(2001) - 1000).toFloat / 1e4f))
    }.toDF("vec_id", "embedding")
    Versioned.commit(vecsDf(1L to 50L), src) // v1
    DerivedState.buildIvfCentroids(spark, src, cents, "embedding",
      "vec_id", nlist = 4, iters = 2, seed = 42L)
    def rebuildPostings(): DataFrame = {
      val cs = Versioned.read(spark, cents).orderBy("cell").collect()
        .map(r => r.getSeq[Long](1).toArray)
      IntKmeans.assign(IntKmeans.quantize(
        Versioned.read(spark, src), "vec_id", "embedding"), "vec_id", cs)
        .select(col("vec_id"), col("cell"), col("qvd").as("qv"))
    }
    def drain(): Option[(Int, Int)] =
      DerivedState.maintainIvfPostings(spark, src, cents, posts,
        "embedding", "vec_id")
    assert(drain().isDefined)
    assert(sortedRows(Versioned.read(spark, posts)) ===
      sortedRows(rebuildPostings()))
    Versioned.commit(vecsDf(51L to 70L), src) // v2 append
    Versioned.deleteWhere(spark, src, col("vec_id") <= 5L) // v3 delete
    assert(drain().isDefined)
    assert(sortedRows(Versioned.read(spark, posts)) ===
      sortedRows(rebuildPostings()))
    assert(drain().isEmpty) // current
  }

  test("recapBandState (round 16, VERDICT r15 #4): accumulated cap " +
    "drift is measured, recapped ∝ drifted rows under the global cap " +
    "law, and the ledger survives — drains resume afterwards") {
    val src = tmp("g-ds-recap-src-")
    val st = tmp("g-ds-recap-st-")
    val cap = 4
    def drain(): Option[(Int, Int)] =
      DerivedState.maintainMinhashBandState(spark, src, st)
    // three increments of 4 near-identical docs each: every increment
    // alone is under the test cap, the ACCUMULATED band buckets (12
    // members sharing bands) are far over it — exactly the documented
    // per-increment-cap caveat
    (0 until 3).foreach { b =>
      Versioned.commit(docsDf((0 until 4).map { j =>
        (b * 10L + j, "the quick brown fox jumps over the lazy dog")
      }), src)
      assert(drain().nonEmpty)
    }
    val stateBefore = Versioned.read(spark, st)
    val bigBefore = stateBefore.groupBy("band_idx", "band_key")
      .count().where(col("count") > cap).count()
    assert(bigBefore > 0L, "fixture must actually drift")
    // measurement-only when nothing trips at the default 4096 cap
    assert(DerivedState.recapBandState(spark, st) === ((0L, 0L)))
    val (buckets, removed) = DerivedState.recapBandState(spark, st, cap)
    assert(buckets === bigBefore && removed > 0L)
    // the recapped state equals the GLOBAL cap law applied to the
    // accumulated state (no increment dropped members -> exact)
    val want = MinHash.capBucketMembers(stateBefore,
      Seq("band_idx", "band_key"), "h_id", maxBucket = cap)
    assert(sortedRows(Versioned.read(spark, st)) === sortedRows(want))
    // idempotent: a second recap at the same cap finds nothing
    assert(DerivedState.recapBandState(spark, st, cap) === ((0L, 0L)))
    // the ledger survived the recap merge: a fresh source commit
    // still drains from where it left off
    Versioned.commit(docsDf(Seq(
      (99L, "an entirely different document about ledgers"))), src)
    assert(drain().contains((3, 4)))
    assert(Versioned.read(spark, st).where(col("h_id") === 99L)
      .count() > 0L)
  }

  test("retrainIvfIfDrifted (round 16): stale centroids measured from " +
    "the state, retrain only past the threshold, ledger stamped — " +
    "drains resume after the rebuild") {
    import spark.implicits._
    val src = tmp("g-ds-drift-src-")
    val cents = tmp("g-ds-drift-c-")
    val posts = tmp("g-ds-drift-p-")
    def vec(seed: Long, shift: Double): Seq[Float] =
      (0 until 8).map(d =>
        (math.sin(seed * 31 + d).toFloat * 0.1f +
          (if (d == (seed % 8).toInt) 1.0f else 0.0f) +
          shift.toFloat))
    // v1: a tight corpus around the unshifted layout
    Versioned.commit((1L to 60L).map(i => (i, vec(i, 0.0)))
      .toDF("vec_id", "embedding"), src)
    DerivedState.buildIvfCentroids(spark, src, cents, "embedding",
      "vec_id", nlist = 4, iters = 4, seed = 7L)
    assert(DerivedState.maintainIvfPostings(spark, src, cents, posts,
      "embedding", "vec_id").nonEmpty)
    val f0 = DerivedState.ivfDriftFraction(spark, cents, posts)
    // fresh build: ~10% of rows sit past the train p90 by definition
    assert(f0 <= 0.2, s"fresh postings must not read drifted: $f0")
    val (g0, r0) = DerivedState.retrainIvfIfDrifted(spark, src, cents,
      posts, "embedding", "vec_id", nlist = 4, iters = 4, seed = 7L)
    assert(!r0 && g0 <= 0.2, s"healthy state must not retrain ($g0)")
    // v2: a large SHIFTED append drained under the stale centroids
    Versioned.commit((101L to 220L).map(i => (i, vec(i, 3.0)))
      .toDF("vec_id", "embedding"), src)
    assert(DerivedState.maintainIvfPostings(spark, src, cents, posts,
      "embedding", "vec_id").nonEmpty)
    val (f1, retrained) = DerivedState.retrainIvfIfDrifted(spark, src,
      cents, posts, "embedding", "vec_id", nlist = 4, iters = 4,
      seed = 7L, threshold = 0.1)
    assert(retrained, s"shifted corpus must trip the gate (f=$f1)")
    assert(f1 > 0.1)
    // after the rebuild: drift back under the healthy band, postings
    // cover the whole corpus, ledger at head so the next drain no-ops
    assert(DerivedState.ivfDriftFraction(spark, cents, posts) <= 0.2)
    assert(Versioned.read(spark, posts).count() === 180L)
    assert(DerivedState.maintainIvfPostings(spark, src, cents, posts,
      "embedding", "vec_id").isEmpty)
    // v3: drains RESUME against the retrained state
    Versioned.commit(Seq((300L, vec(300L, 3.0))).toDF(
      "vec_id", "embedding"), src)
    assert(DerivedState.maintainIvfPostings(spark, src, cents, posts,
      "embedding", "vec_id").nonEmpty)
    assert(Versioned.read(spark, posts)
      .where(col("vec_id") === 300L).count() === 1L)
  }
}
