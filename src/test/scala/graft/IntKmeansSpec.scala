package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.IntKmeans

/** Primitive-level pins for the cross-engine-deterministic integer
  * kernel that now backs five oracles (c1/d10/s2/s3/s4): the oracles
  * prove Spark ≡ DuckDB; this spec proves both equal the intended
  * MATH (hand-derived Lloyd rounds, floor-mean semantics, tie rules,
  * rounding parity), so an agreeing-but-wrong drift on both sides
  * cannot hide. */
class IntKmeansSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions",
      "org.apache.spark.sql.graftx.GraftExtensions")
    .getOrCreate()

  // ---------------------------------------------------------- quantize

  test("quantize rounds half away from zero, both signs (DuckDB parity)") {
    import spark.implicits._
    // 0.00025·1e4 = 2.5 → 3; −0.00025 → −3; float widening must match
    // DuckDB's x::DOUBLE of the same float bits
    val df = Seq((1L, Seq(0.00025f, -0.00025f, 0.00024f, -1.5e-4f)))
      .toDF("id", "v")
    val got = IntKmeans.quantize(df, "id", "v")
      .collect()(0).getSeq[Long](1)
    assert(got === Seq(3L, -3L, 2L, -2L))
  }

  // ---------------------------------------------------------- lloyd

  test("lloyd: one hand-derived round with floor-mean and empty-cell keep") {
    // k=2, take-k init: c0=[0], c1=[10]; points 0,1,9,10
    // assign: {0,1}→c0, {9,10}→c1; means: floor(1/2)=0, floor(19/2)=9
    val train = Array(Array(0L), Array(10L), Array(1L), Array(9L))
    val got = IntKmeans.lloyd(train, k = 2, iters = 1, farthest = false)
    assert(got.map(_.toSeq).toSeq === Seq(Seq(0L), Seq(9L)))
    // negative values floor toward -inf (SQL FLOOR parity, not trunc):
    // points -1,-2 → mean -1.5 → floor -2
    val neg = IntKmeans.lloyd(Array(Array(-1L), Array(-2L)), 1, 1, false)
    assert(neg(0).toSeq === Seq(-2L))
  }

  test("lloyd: assignment ties keep the lowest cell") {
    // point 5 is equidistant from centroids 0 and 10 → cell 0; after
    // the round c0 = floor((0+5)/2) = 2, c1 keeps 10
    val train = Array(Array(0L), Array(10L), Array(5L))
    val got = IntKmeans.lloyd(train, k = 2, iters = 1, farthest = false)
    assert(got.map(_.toSeq).toSeq === Seq(Seq(2L), Seq(10L)))
  }

  test("lloyd: empty cell keeps its centroid across rounds") {
    // k=3 over 3 identical points: cells 1,2 never win an assignment
    val train = Array(Array(7L), Array(7L), Array(7L))
    val got = IntKmeans.lloyd(train, k = 3, iters = 2, farthest = false)
    assert(got.map(_.toSeq).toSeq === Seq(Seq(7L), Seq(7L), Seq(7L)))
  }

  // ---------------------------------------------------------- ffInit

  test("farthest-first init: argmax min-distance, ties to lowest index") {
    // start train(0)=[0]; candidates [0],[4],[8],[8] → picks [8] (idx 2,
    // not 3, on the tie); then min-dists are 0,16,0,0 → picks [4]
    val train = Array(Array(0L), Array(4L), Array(8L), Array(8L))
    val got = IntKmeans.lloyd(train, k = 3, iters = 0, farthest = true)
    assert(got.map(_.toSeq).toSeq === Seq(Seq(0L), Seq(8L), Seq(4L)))
  }

  // ---------------------------------------------------------- planes

  test("exactPlaneBits: integer rule incl. the power-of-two boundary") {
    // target = 8k = 80; N = 80·2^b exactly on the boundary must give b
    assert(IntKmeans.exactPlaneBits(80L * 32, k = 10) === 5)
    assert(IntKmeans.exactPlaneBits(80L * 32 + 1, k = 10) === 6)
    assert(IntKmeans.exactPlaneBits(1L, k = 10) === 4)        // clamp lo
    assert(IntKmeans.exactPlaneBits(Long.MaxValue / 100, k = 10) === 24) // clamp hi
  }

  test("planesSign matches the md5 nibble-parity definition") {
    val pl = IntKmeans.planesSign(nPlanes = 2, dim = 3, seed = 42L)
    val mdt = java.security.MessageDigest.getInstance("MD5")
    for (p <- 0 until 2; j <- 1 to 3) {
      val h = mdt.digest(s"pl:42:$p:$j".getBytes("UTF-8"))
      val odd = ((h(0) >> 4) & 1) == 1
      assert(pl(p)(j - 1) === (if (odd) 1L else -1L))
    }
    assert(pl.flatten.toSet.subsetOf(Set(-1L, 1L)))
  }

  // ---------------------------------------------------------- sample

  test("sampleTrain: md5-keyed order with id tie-break, cap applied") {
    import spark.implicits._
    val df = Seq((3L, Seq(3.0f)), (1L, Seq(1.0f)), (2L, Seq(2.0f)))
      .toDF("id", "v")
    val q = IntKmeans.quantize(df, "id", "v")
    val full = IntKmeans.sampleTrain(q, "id", seed = 7L, cap = 10)
    val expected = Seq(1L, 2L, 3L).sortBy(i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"km:7:$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
    assert(full.map(_(0) / 10000).toSeq === expected)
    // cap keeps the PREFIX of that order
    val capped = IntKmeans.sampleTrain(q, "id", seed = 7L, cap = 2)
    assert(capped.map(_(0) / 10000).toSeq === expected.take(2))
  }

  // ---------------------------------------------------------- assign

  test("distributed GEMM assignment equals the driver-local argmin") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val rows = (0L until 64L).map(i =>
      (i, Seq.fill(8)((rng.nextInt(2001) - 1000).toFloat / 1e4f)))
    val df = rows.toDF("id", "v")
    val q = IntKmeans.quantize(df, "id", "v")
    val train = IntKmeans.sampleTrain(q, "id", seed = 1L, cap = 64)
    val cents = IntKmeans.lloyd(train, k = 5, iters = 2, farthest = false)
    val dist = IntKmeans.assign(q, "id", cents)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val local = q.collect().map { r =>
      val v = r.getSeq[Long](1).toArray
      var best = 0; var bestD = Long.MaxValue
      cents.indices.foreach { c =>
        var d = 0L; var i = 0
        while (i < v.length) { val t = v(i) - cents(c)(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = c }
      }
      r.getLong(0) -> best
    }.toMap
    assert(dist === local)
  }

  // ---------------------------------------------------------- pq

  test("trainPq: residual codebooks are exact-integer and code-stable") {
    val rng = new scala.util.Random(5)
    val train = Array.fill(40)(Array.fill(8)(rng.nextInt(20001).toLong - 10000))
    val m1 = IntKmeans.trainPq(train, nlist = 4, m = 2, ksub = 4, iters = 2)
    val m2 = IntKmeans.trainPq(train.map(_.clone()), 4, 2, 4, 2)
    assert(m1.dsub === 4)
    assert(m1.cents.map(_.toSeq).toSeq === m2.cents.map(_.toSeq).toSeq)
    assert(m1.books.map(_.map(_.toSeq).toSeq).toSeq ===
      m2.books.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("lshTopK probe radius 2: higher recall on a clustered corpus (the dial)") {
    import spark.implicits._
    // a corpus with REAL angular clusters (what LSH exists for): 16
    // cluster directions from deterministic ±1 sign patterns, members
    // = center + small deterministic perturbation. On this geometry
    // the true top-k of a member is its cluster; recall measures how
    // many co-cluster neighbors each probe radius recovers.
    val dim = 64
    val rng = new scala.util.Random(7L)
    val centers = Array.fill(16)(Array.fill(dim)(
      if (rng.nextBoolean()) 1.0f else -1.0f))
    // 16 × 520 = 8320 vectors — ABOVE TrainCap so this exercises the
    // banded equi-join regime (round 14: sub-cap corpora short-circuit
    // to an exact broadcast scan, which would make the dial trivial)
    val perCluster = 520
    val rows = for {
      c <- centers.indices
      m <- 0 until perCluster
    } yield {
      val r2 = new scala.util.Random(c * 1000 + m)
      val v = centers(c).zipWithIndex.map { case (x, j) =>
        x + 0.3f * (r2.nextFloat() - 0.5f) + 0f * j
      }
      (c * perCluster.toLong + m, v.toSeq)
    }
    val e = rows.toDF("vec_id", "embedding")
    val q = e.where(col("vec_id") % perCluster === 0) // one query per cluster
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      // a hit = retrieved neighbor from the query's own cluster
      val hits = df.where((col("vec_id") / perCluster).cast("long") ===
        (col("query_id") / perCluster).cast("long")).count()
      hits.toDouble / (16 * 10)
    }
    val r1 = recallOf(graft.operators.IntKmeans.lshTopK(
      e, q, "embedding", "vec_id", k = 10, dim = dim, seed = 42L))
    val r2 = recallOf(graft.operators.IntKmeans.lshTopK(
      e, q, "embedding", "vec_id", k = 10, dim = dim, seed = 42L,
      probeHamming = 2))
    assert(r2 >= r1, s"radius 2 must not lose recall (r1=$r1, r2=$r2)")
    assert(r2 >= 0.9,
      s"radius-2 recall on a genuinely clustered corpus read $r2")
    // invalid radius is a loud error
    intercept[IllegalArgumentException] {
      graft.operators.IntKmeans.lshTopK(e, q, "embedding", "vec_id",
        k = 10, dim = dim, seed = 42L, probeHamming = 3)
    }
  }

  test("lshTopK below TrainCap probes the whole pool: recall 1.0 " +
    "vs brute force (round 14, the s4 small-corpus pattern)") {
    import spark.implicits._
    // near-iid vectors — the geometry where banded LSH used to read
    // recall ~0.24 at 1×; sub-cap the kernel must match brute force
    val dim = 16
    val rows = (0L until 300L).map { i =>
      val r = new scala.util.Random(i)
      (i, Seq.fill(dim)((r.nextInt(2001) - 1000).toFloat / 1e4f))
    }
    val e = rows.toDF("vec_id", "embedding")
    val q = e.where(col("vec_id") < 5)
    val lsh = graft.operators.IntKmeans.lshTopK(
      e, q, "embedding", "vec_id", k = 10, dim = dim, seed = 42L)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact brute-force truth on the same integer quantization
    val qz = graft.operators.IntKmeans.quantize(e, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum.toDouble
      val na = math.sqrt(a.map(x => x * x).sum.toDouble)
      val nb = math.sqrt(b.map(x => x * x).sum.toDouble)
      if (na == 0 || nb == 0) 0.0
      else math.rint(d / (na * nb) * 1e6) / 1e6
    }
    val truth = (0L until 5L).flatMap { qid =>
      qz.keys.filter(_ != qid).toSeq
        .map(v => (v, cos(qz(qid), qz(v))))
        .sortBy { case (v, c) => (-c, v) }.take(10)
        .map { case (v, _) => (qid, v) }
    }.toSet
    assert(lsh === truth, "sub-cap lshTopK must equal exact top-k")
  }
}
