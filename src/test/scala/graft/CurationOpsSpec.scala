package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 curation surface: t16 keyword extraction, t17 DSIR
  * importance weights, w9 event transitions, m13 mix-gap report, c1
  * k-means summary. Hand-computable corpora throughout; the fixture
  * queries themselves are oracle-checked (or, for c1, rows-only with
  * the invariants pinned here). */
class CurationOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions",
      "org.apache.spark.sql.graftx.GraftExtensions")
    .getOrCreate()

  // ------------------------------------------------------------------ t16

  test("t16 keywords: hand-computed tf-idf ranks with tie-break") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple apple banana common"),
      (2L, "banana cherry common"),
      (3L, "common cherry cherry date"))
      .toDF("doc_id", "text")
    val got = graft.queries.TextOps.keywordsOf(docs, topK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    // idf_q: df=1 → ln3·1e6 ≈ 1098612; df=2 → ln1.5·1e6 ≈ 405465; df=3 → 0
    // doc1: apple 2·1098612, banana 405465, common 0
    // doc2: banana = cherry = 405465 → token tie-break, common 0
    // doc3: date 1098612, cherry 810930, common 0
    assert(got === Seq(
      (1L, 1L, "apple"), (1L, 2L, "banana"), (1L, 3L, "common"),
      (2L, 1L, "banana"), (2L, 2L, "cherry"), (2L, 3L, "common"),
      (3L, 1L, "date"), (3L, 2L, "cherry"), (3L, 3L, "common")))
  }

  test("t16 keywords: docs with fewer distinct tokens emit fewer rows") {
    import spark.implicits._
    val docs = Seq((1L, "a a a"), (2L, "a b c d")).toDF("doc_id", "text")
    val n = graft.queries.TextOps.keywordsOf(docs, topK = 3)
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n === Map(1L -> 1L, 2L -> 3L))
  }

  // ------------------------------------------------------------------ t17

  test("t17 DSIR: target = whole corpus ⇒ every weight is exactly 0") {
    import spark.implicits._
    // ct = cr and nt = nr for every bigram → ratio ≡ 1 → lr_q ≡ 0
    val docs = Seq(
      (1L, "en", "a b c a b"),
      (2L, "en", "x y x y"),
      (3L, "en", "a b"))
      .toDF("doc_id", "lang", "text")
    val got = graft.queries.TextOps.dsirWeightsOf(docs, lit(true))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(got.length === 3)
    assert(got.forall(_._3 === 0L), s"nonzero weight in $got")
    // n_bigrams totality: 4, 3, 1
    assert(got.map(t => t._1 -> t._2).toMap === Map(1L -> 4L, 2L -> 3L, 3L -> 1L))
  }

  test("t17 DSIR: target-like docs outweigh off-target docs, totality holds") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "the quick fox the quick fox"),
      (2L, "en", "the quick fox jumps high"),
      (3L, "de", "der schnelle fuchs springt hoch"),
      (4L, "de", "the quick fox der schnelle"), // mixed
      (5L, "de", "solo")) // 1 token → 0 bigrams
      .toDF("doc_id", "lang", "text")
    val got = graft.queries.TextOps
      .dsirWeightsOf(docs, col("lang") === "en")
      .collect().map(r => (r.getLong(0), r.getLong(2),
        r.getDouble(4))).toSeq
    val byId = got.map(t => t._1 -> t._3).toMap
    // target-typical bigrams score positive, off-target negative,
    // the mixed doc in between
    assert(byId(1L) > 0.0 && byId(2L) > 0.0)
    assert(byId(3L) < 0.0)
    assert(byId(3L) < byId(4L) && byId(4L) < byId(1L))
    // totality incl. the bigram-less doc
    assert(got.map(_._1).toSet === Set(1L, 2L, 3L, 4L, 5L))
    assert(got.find(_._1 == 5L).get._2 === 0L)
  }

  // ------------------------------------------------------------------ t18

  test("t18 novelty: hand-computed first-owner fractions, totality") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c"),   // bigrams {a b, b c} — both first-owned here
      (2L, "b c d"),   // {b c (owned by 1), c d (novel)}
      (3L, "z"))       // no bigram at all
      .toDF("doc_id", "text")
    val got = graft.queries.TextOps.ngramNoveltyOf(docs, n = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === Seq(
      (1L, 2L, 2L, 1000000L),
      (2L, 2L, 1L, 500000L),
      (3L, 0L, 0L, 0L)))
  }

  test("t18 novelty: repeated grams inside one doc count once (distinct)") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    // bigrams with multiplicity: {a b, b a, a b, b a, a b} → 2 distinct
    val got = graft.queries.TextOps.ngramNoveltyOf(docs, n = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    assert(got === ((2L, 2L)))
  }

  // ------------------------------------------------------------------ d18

  test("d18 soft-dedup weights agree with d6 clusters and conserve mass") {
    val sf001 = "/root/testdata/sf0.001"
    val w = SparkEntry.queries("d18_dedup_weights")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val d6 = SparkEntry.queries("d6_dup_clusters")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // same labels, total coverage
    assert(w.map(t => t._1 -> t._2).toMap === d6)
    // singleton weight is exactly 1e6; every cluster's mass is 1e6
    // up to the per-member rounding (csize·round(1e6/csize)).
    // Reference expectation uses half-UP rounding: Spark round() and
    // DuckDB ROUND both round half away from zero, while math.rint is
    // half-to-even (they disagree at e.g. csize=128: 7812.5 → 7813 vs
    // 7812).
    w.foreach { case (_, _, csize, wm) =>
      assert(wm === math.round(1e6 / csize))
      if (csize == 1L) assert(wm === 1000000L)
    }
    // at least one real dup cluster exists in the fixture
    assert(w.exists(_._3 > 1L))
  }

  // ------------------------------------------------------------------ o11

  test("o11 cluster split: leak-free by construction; doc-keyed split leaks") {
    import spark.implicits._
    // md5("split:9") = c9... → train; md5("split:10") = f3... → test.
    // Cluster {9,10} under a DOC-keyed digest straddles train/test —
    // the leakage o11 exists to prevent; cluster-keyed (label 9 →
    // train) sends both members to train.
    val labels = Seq((9L, 9L), (10L, 9L), (3L, 3L), (21L, 21L))
      .toDF("doc_id", "cluster_id")
    val got = graft.queries.DedupOps.clusterSplitOf(labels)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    // cluster 9 (2 docs) + singleton 3 → train; singleton 21 → test
    assert(got === Seq(("test", 1L, 1L, 0L), ("train", 3L, 2L, 0L)))
    // the contrast: doc-keyed assignment splits cluster 9 across
    // train and test (doc 9 → train, doc 10 → test)
    val docKeyed = labels.withColumn("split",
      when(md5(concat(lit("split:"), col("doc_id"))) < "cc", "train")
        .when(md5(concat(lit("split:"), col("doc_id"))) < "e6", "holdout")
        .otherwise("test"))
      .groupBy("cluster_id")
      .agg(countDistinct(col("split")).as("nsp"))
      .where(col("nsp") > 1).count()
    assert(docKeyed === 1L, "the planted cluster must leak under a doc-keyed split")
  }

  test("o11 on the fixture: full coverage, zero leaked clusters") {
    val rows = SparkEntry.queries("o11_cluster_split")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.map(_.getLong(1)).sum === 500L) // every doc assigned
    assert(rows.forall(_.getLong(3) === 0L))
  }

  // ------------------------------------------------------------------- w9

  test("w9 transitions: hand-computed counts and row-normalized ppm") {
    import spark.implicits._
    val events = Seq(
      // user 1: A → B → A   (ties impossible: distinct ts)
      (1L, 10L, 100L, "A"), (2L, 20L, 100L, "B"), (3L, 30L, 100L, "A"),
      // user 2: B → A
      (4L, 10L, 200L, "B"), (5L, 20L, 200L, "A"),
      // user 3: single event — no transition
      (6L, 10L, 300L, "C"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = graft.queries.Extras.transitionsOf(events)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === Seq(("A", "B", 1L, 1000000L), ("B", "A", 2L, 1000000L)))
  }

  test("w9 transitions: same-ts ties break on event_id") {
    import spark.implicits._
    val events = Seq(
      (1L, 10L, 1L, "A"), (2L, 10L, 1L, "B"), (3L, 10L, 1L, "C"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = graft.queries.Extras.transitionsOf(events)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got === Seq(("A", "B"), ("B", "C")))
  }

  // ------------------------------------------------------------------ w11

  test("w11 engaged time: overlap merges, exact-end boundary splits") {
    import spark.implicits._
    def ns(sec: Long) = sec * 1000000000L
    val events = Seq(
      // user 1: 0s and 100s overlap → [0,400); 1000s separate → [1000,1300)
      (1L, ns(0), 1L, "view", 0.0), (2L, ns(100), 1L, "view", 0.0),
      (3L, ns(1000), 1L, "view", 0.0),
      // user 2: second event exactly at the first interval's END
      // (half-open [0,300)) → two disjoint intervals
      (4L, ns(0), 2L, "view", 0.0), (5L, ns(300), 2L, "view", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = graft.queries.Extras.engagedTimeOf(events, windowSecs = 300L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq(
      (1L, 2L, 700000000L),
      (2L, 2L, 600000000L)))
  }

  test("w11 engaged time matches an in-memory sweep reference on a seeded random corpus") {
    import spark.implicits._
    // seeded LCG → deterministic corpus with heavy overlap chains,
    // duplicate timestamps, and isolated points
    var state = 0x9E3779B97F4A7C15L
    def next(): Long = { state = state * 6364136223846793005L + 1442695040888963407L; state }
    val winSec = 7L
    val winNs = winSec * 1000000000L
    val events = (1 to 400).map { i =>
      val user = math.floorMod(next(), 5L)
      val ts = math.floorMod(next(), 200L) * 1000000000L // whole seconds in [0,200)
      (i.toLong, ts, user, "view", 0.0)
    }
    val got = graft.queries.Extras
      .engagedTimeOf(events.toDF("event_id", "ts", "user_id", "event_type", "value"),
        windowSecs = winSec)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // reference: classic sorted interval-union sweep per user
    val ref = events.groupBy(_._3).map { case (u, evs) =>
      val starts = evs.map(_._2).sorted
      var nIv = 0L; var engaged = 0L
      var curS = -1L; var curE = -1L
      starts.foreach { s =>
        if (curE < 0 || s >= curE) {
          if (curE >= 0) engaged += curE - curS
          nIv += 1; curS = s; curE = s + winNs
        } else curE = math.max(curE, s + winNs)
      }
      engaged += curE - curS
      u -> ((nIv, engaged / 1000L))
    }
    assert(got === ref)
  }

  // ------------------------------------------------------------------ m14

  test("m14 quality mix report agrees with t2's bins and conserves shares") {
    val sf001 = "/root/testdata/sf0.001"
    val m14 = SparkEntry.queries("m14_quality_mix_report")(spark, sf001).collect()
    val binTotals = m14.groupBy(_.getString(1))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    val t2Bins = graft.queries.TextOps.t2QualityScore(spark, sf001)
      .groupBy(col("quality_bin")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(binTotals === t2Bins, "m14 bin doc counts must equal t2's")
    // shares sum to one million within per-row rounding
    val shareSum = m14.map(_.getLong(4)).sum
    assert(math.abs(shareSum - 1000000L) <= m14.length,
      s"share_ppm sums to $shareSum")
  }

  // ------------------------------------------------------------------ m13

  test("m13 mix gap: hand-computed shares, gaps, and upweight factors") {
    import spark.implicits._
    val docs = Seq(
      ("srcA", "t t t t t t t t t t"), ("srcA", "t t t t t t t t t t"),
      ("srcA", "t t t t t t t t t t"), // 30 tokens
      ("srcB", "u u u u u u u u u u")) // 10 tokens
      .toDF("source", "text")
    val got = graft.queries.PackOps.mixGapOf(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got === Seq(
      ("srcA", 3L, 30L, 750000L, 500000L, 250000L, 666667L),
      ("srcB", 1L, 10L, 250000L, 500000L, -250000L, 2000000L)))
  }

  // ------------------------------------------------------------------- c1

  private def blobs = {
    import spark.implicits._
    // three well-separated blobs, 4 distinct points each
    val pts = for {
      (cx, cy, base) <- Seq((0.0, 0.0, 0L), (100.0, 0.0, 10L), (0.0, 100.0, 20L))
      j <- 0 until 4
    } yield (base + j, Array(cx + 0.1 * j, cy - 0.1 * j))
    pts.toDF("vec_id", "v")
  }

  test("c1 k-means: well-separated blobs are recovered with tight inertia") {
    val got = graft.queries.SimilarityOps
      .kmeansSummaryOf(blobs, "vec_id", "v", k = 3, iters = 10, seed = 42L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._2).sorted.toSeq === Seq(4L, 4L, 4L), s"sizes in ${got.toSeq}")
    // within-blob spread ≤ (0.3² + 0.3²)·4 per blob, in q8 units
    // ((1e-4)² quantization → real d2 × 1e8)
    assert(got.map(_._3).sum <= (0.18 * 4 * 3 * 1e8).toLong,
      s"inertia too high: ${got.toSeq}")
  }

  test("c1 k-means: summary is deterministic across runs") {
    def run() = graft.queries.SimilarityOps
      .kmeansSummaryOf(blobs, "vec_id", "v", k = 3, iters = 10, seed = 42L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(run() === run())
  }

  test("c1 k-means on the fixture: k cells, every vector assigned") {
    val got = SparkEntry.queries("c1_kmeans_summary")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(got.length === 8)
    assert(got.map(_.getLong(1)).sum === 500L) // embeddings fixture size
    assert(got.forall(_.getLong(2) >= 0L))
  }
}
