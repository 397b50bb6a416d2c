package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{IntPca, Pca}

/** Primitive-level pins for the deterministic integer PCA that backs
  * the s6 oracle since round 7: the oracle proves Spark ≡ DuckDB;
  * this spec proves both equal the intended MATH (floor semantics,
  * sign/tie rules, planted-direction recovery, agreement with the
  * float Breeze path to quantization precision), so an
  * agreeing-but-wrong drift on both sides cannot hide. */
class IntPcaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions",
      "org.apache.spark.sql.graftx.GraftExtensions")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  // ------------------------------------------------------- primitives

  test("floorDiv floors toward -inf on both signs (SQL FLOOR parity)") {
    // the SQL twin computes FLOOR(p::DOUBLE / q); Math.floorDiv must
    // agree on negatives (truncation would give -3, not -4)
    assert(Math.floorDiv(-7L, 2L) === -4L)
    assert(Math.floorDiv(7L, 2L) === 3L)
    assert(Math.floorDiv(-6L, 2L) === -3L)
    assert(math.floor(-7.0 / 2.0).toLong === -4L)
  }

  test("start vectors are ±VS from the keyed digest, reproducible") {
    val v1 = IntPca.startVec(64, 0, 7L)
    val v2 = IntPca.startVec(64, 0, 7L)
    assert(v1.toSeq === v2.toSeq)
    assert(v1.forall(x => x == IntPca.VS || x == -IntPca.VS))
    // different component / seed → different vector
    assert(IntPca.startVec(64, 1, 7L).toSeq !== v1.toSeq)
    assert(IntPca.startVec(64, 0, 8L).toSeq !== v1.toSeq)
  }

  test("scatter is exact and order-independent (Long sums)") {
    import spark.implicits._
    val rows = (0L until 100L).map(i =>
      (i, Seq(i.toDouble / 50.0, -i.toDouble / 25.0)))
    val df = rows.toDF("id", "v")
    val (n1, s1, m1) = IntPca.scatter(
      IntPca.quantize(df.repartition(7), "id", "v"))
    val (n2, s2, m2) = IntPca.scatter(
      IntPca.quantize(df.repartition(2), "id", "v"))
    assert(n1 === 100L && n2 === 100L)
    assert(s1.toSeq === s2.toSeq)
    assert(m1.toSeq === m2.toSeq)
    // hand value: sum of round(i/50*1e3) = sum(20·i) = 20·4950
    assert(s1(0) === 99000L)
  }

  test("planted dominant direction is recovered exactly-deterministically") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val d = 16
    val rows = (0L until 400L).map { i =>
      val v = new Array[Double](d)
      v(3) = rng.nextGaussian() * 0.5 // dominant axis: e3
      (1 until d).foreach { j =>
        if (j != 3) v(j) = rng.nextGaussian() * 0.02
      }
      (i, v.toSeq)
    }
    val df = rows.toDF("id", "v")
    val m = IntPca.fit(df, "id", "v", r = 2, iters = 24, seed = 7L)
    val u0 = m.comps(0).map(_.toDouble)
    val n0 = math.sqrt(u0.map(x => x * x).sum)
    assert(math.abs(u0(3) / n0) > 0.99,
      s"pc1 not on e3: ${m.comps(0).toSeq}")
    // sign convention: largest-|coordinate| positive
    assert(m.comps.forall { c =>
      val b = c.indices.maxBy(i => math.abs(c(i)))
      c(b) >= 0L
    })
    // bit-exact rerun
    val m2 = IntPca.fit(df, "id", "v", r = 2, iters = 24, seed = 7L)
    assert(m.comps.map(_.toSeq).toSeq === m2.comps.map(_.toSeq).toSeq)
    assert(m.meanQ.toSeq === m2.meanQ.toSeq)
  }

  test("fixture embeddings: integer components agree with Breeze PCA") {
    val e = Tables(spark, sf, "embeddings")
    val im = IntPca.fit(e, "vec_id", "embedding", r = 8, iters = 24,
      seed = 7L)
    val fdf = e.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val fm = Pca.fit(fdf, "v", r = 8)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val num = a.zip(b).map(t => t._1 * t._2).sum
      num / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
    }
    // top component aligns tightly (healthy top eigengap in the
    // fixture). Components 1+ sit in a quasi-degenerate stretch of
    // the fixture spectrum (adjacent eigenvalue ratios 0.96–0.99):
    // (λ_{c+1}/λ_c)^24 ≈ 0.4, so NO 24-round power method — float or
    // integer — can separate individual eigenvectors there, and a
    // per-component cosine pin would be asserting something the math
    // does not promise. The rotation-robust pins are (a) subspace
    // alignment: each integer component lies almost entirely inside
    // the span of the leading Breeze components, and (b) the
    // Rayleigh envelope below (per-component variance capture).
    val a0 = math.abs(cos(im.comps(0).map(_.toDouble), fm.components(0)))
    assert(a0 > 0.97, s"comp 0 misaligned with Breeze: |cos| = $a0")
    // subspace alignment at r ∈ {1, 4, 8}: for each integer comp
    // c < r, the fraction of its mass inside span(Breeze 0..r-1) is
    // sqrt(Σ_j cos(u_c, v_j)²) (exact, since Breeze eigenvectors are
    // orthonormal); a component rotated WITHIN the quasi-degenerate
    // subspace passes, one that drifted out of the subspace fails
    // (a1) chordal (projection-Frobenius) alignment between
    // span(integer comps 0..r-1) and span(Breeze 0..r-1) at
    // r ∈ {1, 4, 8}: sqrt of the mean squared in-span mass. A hard
    // cutoff r that slices through the degenerate block necessarily
    // leaks (Davis–Kahan sin-θ scales as 1/gap), so the span-vs-span
    // bound is deliberately loose; measured values on this fixture
    // are 0.97 / 0.85 / 0.94.
    def spanFrac(u: Array[Double], hi: Int): Double =
      math.sqrt((0 until hi).map { j =>
        val cj = cos(u, fm.components(j)); cj * cj
      }.sum)
    Seq(1, 4, 8).foreach { r =>
      val mean2 = (0 until r).map { c =>
        val f = spanFrac(im.comps(c).map(_.toDouble), r); f * f
      }.sum / r
      val chordal = math.sqrt(mean2)
      assert(chordal > 0.8,
        s"span(int 0..${r - 1}) vs span(Breeze 0..${r - 1}): " +
          s"chordal alignment $chordal")
    }
    // (a2) the tight rotation-robust pin: each integer component c
    // lies almost entirely (> 0.95 mass) inside the slack-extended
    // leading float span(Breeze 0 .. c+4). A component rotated
    // WITHIN the quasi-degenerate eigenvalue cluster passes; one
    // that drifted toward genuinely smaller eigenvalues fails.
    // Measured min on this fixture: 0.987 (comp 5).
    val fmWide = Pca.fit(fdf, "v", r = 16)
    (0 until 8).foreach { c =>
      val u = im.comps(c).map(_.toDouble)
      val frac = math.sqrt((0 until (c + 5)).map { j =>
        val cj = cos(u, fmWide.components(j)); cj * cj
      }.sum)
      assert(frac > 0.95,
        s"comp $c: only $frac of its mass in span(Breeze 0..${c + 4})")
    }
    // every integer component's variance (Rayleigh under the FLOAT
    // covariance) must sit within the float eigenvalue envelope
    val dIdx = fm.mean.length
    val vecs = fdf.select(col("v")).collect().map(_.getSeq[Double](0).toArray)
    val n = vecs.length.toDouble
    val mean = Array.tabulate(dIdx)(i => vecs.map(_(i)).sum / n)
    val c2 = Array.tabulate(dIdx, dIdx) { (i, j) =>
      vecs.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n
    }
    def rayleigh(u: Array[Double]): Double = {
      val w = Array.tabulate(dIdx)(i =>
        (0 until dIdx).map(j => c2(i)(j) * u(j)).sum)
      u.zip(w).map(t => t._1 * t._2).sum / u.map(x => x * x).sum
    }
    (0 until 8).foreach { c =>
      val r = rayleigh(im.comps(c).map(_.toDouble))
      val lam = fm.eigenvalues(c)
      assert(r > 0.8 * lam && r < 1.2 * lam + 1e-9,
        s"comp $c Rayleigh $r vs float eigenvalue $lam")
    }
  }

  test("projection equals driver-side integer arithmetic") {
    import spark.implicits._
    val rows = (0L until 50L).map { i =>
      (i, Seq(math.sin(i * 0.37), math.cos(i * 0.11), (i % 7) / 10.0))
    }
    val df = rows.toDF("id", "v")
    val m = IntPca.fit(df, "id", "v", r = 2, iters = 24, seed = 7L)
    val got = IntPca.project(df, "id", "v", m).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { case (id, v) =>
      val qv = v.map(x => math.round(x * IntPca.Q))
      def proj(c: Int): Long =
        qv.indices.map(j => (qv(j) - m.meanQ(j)) * m.comps(c)(j)).sum
      assert(got(id) === ((proj(0), proj(1))), s"row $id")
    }
  }

  test("s6_pca_project: harness-safe scalar output, deterministic") {
    val out = IntPca.s6PcaProject(spark, sf)
    assert(out.columns.toSeq ===
      ("vec_id" +: (0 until 8).map(c => s"proj_${c}_q")))
    val a = out.collect()
    val b = IntPca.s6PcaProject(spark, sf).collect()
    assert(a.length === 500 && a.sameElements(b))
    // projections are not degenerate: the top component separates rows
    val p0 = a.map(_.getLong(1))
    assert(p0.distinct.length > 100, "pc1 projection nearly constant")
  }

  test("zero-variance input stays all-zero without crashing") {
    import spark.implicits._
    val df = (0L until 20L).map(i => (i, Seq(0.25, 0.25, 0.25)))
      .toDF("id", "v")
    val m = IntPca.fit(df, "id", "v", r = 2, iters = 8, seed = 7L)
    // C = 0 → w = 0 → components collapse to zero vectors
    assert(m.comps.forall(_.forall(_ == 0L)))
    val proj = IntPca.project(df, "id", "v", m).collect()
    assert(proj.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L))
  }
}
