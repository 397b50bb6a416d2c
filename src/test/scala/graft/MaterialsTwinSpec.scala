package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.generators.Generators
import graft.pipeline.MaterialsPipeline

/** Pins for the r8 g3/g13 oracle twins: the oracle proves
  * Spark ≡ DuckDB; this spec proves the twins equal the intended
  * GENERATOR behavior — g13's relational replication reproduces the
  * JVM kernel's geometry bit-for-bit, and g3's md5-ranked removals
  * honor the vacancy semantics (exhaustive unique k-subsets, cap,
  * stoichiometry). */
class MaterialsTwinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions",
      "org.apache.spark.sql.graftx.GraftExtensions")
    .getOrCreate()

  test("g13 twin positions equal the supercell kernel bit-for-bit") {
    val twin = graft.queries.MaterialsOps.g13Supercell(spark, "")
      .collect()
      .map(r => (r.getString(1), r.getInt(4), r.getString(5),
        r.getDouble(6), r.getDouble(7), r.getDouble(8), r.getLong(3),
        r.getString(2)))
      .groupBy(_._1)
    val kernels = MaterialsPipeline.seeds
      .map(c => c.uuid -> Generators.supercell(c, Seq(2, 2, 1))).toMap
    assert(twin.keySet === kernels.keySet)
    kernels.foreach { case (seed, k) =>
      val rows = twin(seed).sortBy(_._2)
      assert(rows.length === k.n)
      rows.foreach { case (_, idx, el, x, y, z, n, sym) =>
        assert(n === k.n.toLong)
        assert(sym === k.symbols)
        assert(el === k.species(idx))
        // EXACT double equality: same products (i,j ∈ {0,1} exact)
        // and same left-to-right IEEE adds as the kernel's p + t
        assert(x === k.positions(idx)(0), s"$seed atom $idx x")
        assert(y === k.positions(idx)(1), s"$seed atom $idx y")
        assert(z === k.positions(idx)(2), s"$seed atom $idx z")
      }
    }
  }

  test("g9 twin (prototype, perm, symbols, n) set equals the kernel surface") {
    val twin = graft.queries.MaterialsOps.g9Prototypes(spark, "")
      .collect()
      .map(r => (r.getString(3), r.getString(4), r.getString(1),
        r.getLong(2)))
      .toSet
    val kernel = graft.generators.Prototypes.generate(
        Seq("all"), Seq("Ag", "Pd"), Map("Ag" -> 4.09, "Pd" -> 3.89))
      .map(c => (c.params("prototype"), c.params("perm"), c.symbols,
        c.n.toLong))
      .toSet
    assert(twin === kernel)
  }

  test("committed proto-sites fixture mirrors the code-defined library") {
    val committed = spark.read
      .parquet(graft.sources.SeedFixture.protoSitesPath)
      .collect().map(r => (0 to 4).map(r.get)).sortBy(_.toString)
    val fresh = graft.sources.SeedFixture.protoSitesDf(spark)
      .collect().map(r => (0 to 4).map(r.get)).sortBy(_.toString)
    assert(committed.toSeq === fresh.toSeq,
      "fixtures/proto_sites.parquet is stale - rerun " +
        "`sbt \"runMain graft.sources.SeedFixture\"`")
  }

  test("g3 twin: exhaustive unique removals, cap, stoichiometry, determinism") {
    val out = graft.queries.MaterialsOps.g3Vacancy(spark, "").collect()
    // n=4 seed: k=1, C(4,1)=4 candidates, cap 4 -> all 4;
    // n=8 seed: k=2, C(8,2)=28 candidates, cap 4 survives
    val bySeed = out.groupBy(_.getString(1))
    assert(bySeed.size === 2)
    bySeed.foreach { case (_, rs) =>
      assert(rs.length === 4)
      // removals unique per seed (the reference's uniqueness guard)
      assert(rs.map(_.getString(5)).distinct.length === 4)
      rs.foreach { r =>
        val n = r.getLong(3)
        val removed = r.getString(5).split(",").map(_.toInt)
        val nSeed = n.toInt + removed.length
        assert(removed.length === (nSeed + 3) / 4) // ceil(n/4)
        assert(removed.toSeq === removed.sorted.toSeq)
        assert(removed.forall(i => i >= 0 && i < nSeed))
        assert(r.getString(2) === s"Ag$n") // all-Ag fixture, kept count
        assert(r.getString(4) === "vac")
      }
    }
    val again = graft.queries.MaterialsOps.g3Vacancy(spark, "").collect()
    assert(out.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("g1 twin (size, hnf_index, labeling, symbols) set equals the kernel") {
    // The twin must reproduce the Hart–Forcade walk exactly: same
    // canonical labeling strings (min-over-orbit), same superperiodic
    // drops, same per-class census. Symbols are orbit-invariant
    // (permutations preserve counts), so they must match too even
    // though the kernel builds them from the first-encountered orbit
    // member rather than the canonical one.
    val kernel = graft.generators.Enumerated
      .enumerate("fcc", 4.05, Seq("Ag", "Pd"), 2, 4)
      .map(e => (e.size, e.hnfIndex, e.labeling, e.config.symbols))
      .toSet
    val twin = graft.queries.MaterialsOps.g1Enumerated(spark, "")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getString(4)))
      .toSet
    assert(twin === kernel)
    assert(twin.size === 27) // fcc binary sizes 2–4: 2 + 6 + 19
  }

  test("committed enum-group fixture mirrors the kernel's siteSymmetry") {
    val committed = spark.read
      .parquet(graft.sources.SeedFixture.enumGroupPath)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getInt(5), r.getBoolean(6)))
      .toSet
    val fresh = graft.sources.SeedFixture.enumGroupDf(spark)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getInt(5), r.getBoolean(6)))
      .toSet
    assert(committed === fresh)
  }

  test("m6 twin: census, ceil split sizing, sub-energy replay, determinism") {
    val rows = graft.queries.MaterialsOps.m6EndToEnd(spark, "").collect()
    // census: 14 sub (C(4,2)=6 caps the 4-atom seed; 8 from the
    // 8-atom seed) + 2 vacancy + 2 strain variants each
    def totalOf(t: String) =
      rows.filter(_.getString(0) == t).map(_.getLong(2)).sum
    assert(totalOf("sub") === 14L)
    assert(totalOf("vac") === 28L)
    assert(totalOf("dist") === 28L)
    // reference ceil sizing on N=70 under the same IEEE math
    // Splits.assign uses: 70·0.8 rounds to exactly 56.0 → train 56;
    // 14·0.8 = 11.2000…01 → holdout 12; super 2
    def bucketOf(b: String) = rows.filter(_.getString(1) == b)
      .map(_.getLong(2)).sum
    assert(bucketOf("train") === 56L)
    assert(bucketOf("holdout") === 12L)
    assert(bucketOf("super") === 2L)
    // independent JVM replay of the sub-family energies: every sub
    // config of a seed shares one energy (positions are the seed's;
    // the 50/50 assignment makes the species offset constant), so
    // Σ n_configs·avg_energy over sub rows = 6·E(seed4) + 8·E(seed8)
    // in micro-units, exactly.
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def off(el: String): Long =
      java.lang.Long.parseLong(md5hex(s"el:$el").substring(0, 8), 16) % 1000
    val seeds = spark.read.parquet(graft.sources.SeedFixture.path)
      .collect()
      .map(r => (r.getString(0), r.getInt(1),
        Seq(r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .groupBy(_._1).values.map(_.sortBy(_._2).map(_._3)).toSeq
    val expectedMicro = seeds.map { pos =>
      val n = pos.length
      val q = pos.map(_.map(x => Math.round(x * 131072.0)))
      val ss = (0 until 3).map { ax =>
        val s0 = q.map(_(ax)).sum
        q.map(p => { val d = n * p(ax) - s0; d * d }).sum
      }.sum
      val e = 0.5 * ss.toDouble / (n * n).toDouble / 17179869184.0 +
        (n / 2 * (off("Ag") + off("Pd"))).toDouble / 1000.0
      val nCfgs = if (n == 4) 6 else 8
      nCfgs * Math.round(e * 1000000.0)
    }.sum
    val gotMicro = rows.filter(_.getString(0) == "sub")
      .map(r => r.getLong(2) * r.getDouble(3) * 1000000.0).sum
    assert(math.abs(gotMicro - expectedMicro.toDouble) < 1e-3)
    // deterministic replay
    val again = graft.queries.MaterialsOps.m6EndToEnd(spark, "").collect()
    assert(rows.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("g4 twin equals a pure-JVM MessageDigest replay bit-for-bit") {
    // Independent reimplementation of the twin's Irwin–Hall(12)
    // normal and strain pipeline with java.security.MessageDigest —
    // pins the md5-key derivation, the exact-integer centering, and
    // the IEEE association order the oracle relies on.
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def ih(key: String): Double = {
      val sum = (0 until 12).map(t =>
        java.lang.Long.parseLong(md5hex(s"$key:$t").substring(0, 8), 16)).sum
      (sum - 6L * 4294967296L).toDouble / 4294967296.0
    }
    val atoms = spark.read.parquet(graft.sources.SeedFixture.path)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    val twin = graft.queries.MaterialsOps.g4Distortion(spark, "")
      .collect()
    assert(twin.length === atoms.length * 4)
    twin.foreach { r =>
      val (seed, draw, idx) = (r.getString(1), r.getInt(3), r.getInt(5))
      val m = Array.tabulate(3, 3) { (a, b) =>
        val g = ih(s"dist:$seed:$draw:$a:$b")
        if (a == b) 1.0 + g * 0.02 else g * 0.02
      }
      val det =
        m(0)(0) * (m(1)(1) * m(2)(2) - m(1)(2) * m(2)(1)) -
          m(0)(1) * (m(1)(0) * m(2)(2) - m(1)(2) * m(2)(0)) +
          m(0)(2) * (m(1)(0) * m(2)(1) - m(1)(1) * m(2)(0))
      assert(r.getDouble(10) === det, s"$seed draw $draw det")
      // near-identity strain: det within a few sigma of 1
      assert(math.abs(det - 1.0) < 0.2, s"$seed draw $draw det sane")
      val (_, _, x, y, z) = atoms.find(a => a._1 == seed && a._2 == idx).get
      def pos(axis: Int): Double =
        (x * m(0)(axis) + y * m(1)(axis) + z * m(2)(axis)) +
          ih(s"rat:$seed:$draw:$idx:$axis") * 0.001
      assert(r.getDouble(7) === pos(0), s"$seed $draw atom $idx x")
      assert(r.getDouble(8) === pos(1), s"$seed $draw atom $idx y")
      assert(r.getDouble(9) === pos(2), s"$seed $draw atom $idx z")
      assert(r.getString(0) === md5hex(s"dist:$seed:$draw"))
      assert(r.getString(2) === "dist")
    }
  }
}
