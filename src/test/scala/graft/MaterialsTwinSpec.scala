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
}
