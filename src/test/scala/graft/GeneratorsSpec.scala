package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Config, Lattice}
import graft.generators.{Generators, Hessian}
import graft.calculators.StubCalculator

class GeneratorsSpec extends AnyFunSuite {

  private val a = 4.05
  private def fcc4: Config = Config.of(
    Seq("Ag", "Ag", "Ag", "Ag"),
    Seq(Seq(a, 0.0, 0.0), Seq(0.0, a, 0.0), Seq(0.0, 0.0, a)),
    Seq(Seq(0.0, 0.0, 0.0), Seq(0.0, a / 2, a / 2),
      Seq(a / 2, 0.0, a / 2), Seq(a / 2, a / 2, 0.0)))

  test("substitution honors stoichiometry and is deterministic (G2)") {
    val out = Generators.substitution(fcc4, Map("Ag" -> 0.5, "Pd" -> 0.5),
      nconfigs = 5, ranSeed = 10L)
    assert(out.nonEmpty)
    out.foreach { c =>
      assert(c.species.count(_ == "Ag") === 2)
      assert(c.species.count(_ == "Pd") === 2)
      assert(c.symbols === "Ag2Pd2")
    }
    assert(out.map(_.species).distinct.length === out.length) // unique
    val replay = Generators.substitution(fcc4, Map("Ag" -> 0.5, "Pd" -> 0.5),
      nconfigs = 5, ranSeed = 10L)
    assert(out.map(_.uuid) === replay.map(_.uuid)) // seed-pinned replay
  }

  test("substitution rejects bad fractions (substitution.py:176)") {
    assertThrows[IllegalArgumentException] {
      Generators.substitution(fcc4, Map("Ag" -> 0.7, "Pd" -> 0.7), 2, 1L)
    }
  }

  test("vacancy removes the right count, exhaustive path unique (G3)") {
    val out = Generators.vacancy(fcc4, vacPerAtom = 0.25, nconfigs = 4,
      ranSeed = 7L)
    assert(out.length === 4) // C(4,1)=4 exhaustive
    out.foreach(c => assert(c.n === 3))
    assert(out.map(_.params("removed")).distinct.length === 4)
    val replay = Generators.vacancy(fcc4, 0.25, 4, 7L)
    assert(out.map(_.uuid) === replay.map(_.uuid))
  }

  test("distortion normalizes volume and replays (G4)") {
    val out = Generators.distortion(fcc4, nconfigs = 3, covDiag = 0.0004,
      volumeFactor = 1.05, rattle = 0.0, ranSeed = 3L)
    assert(out.length === 3)
    val v0 = math.abs(Lattice.det(fcc4.cell))
    out.foreach { c =>
      val v = math.abs(Lattice.det(c.cell))
      assert(math.abs(v / v0 - 1.05) < 1e-9) // det scaled to volume_factor
    }
    assert(out.map(_.uuid).distinct.length === 3)
  }

  test("supercell replicates atoms by |det M| (G13)") {
    val sup = Generators.supercell(fcc4, Seq(2, 2, 2))
    assert(sup.n === 32)
    assert(sup.symbols === "Ag32")
    assert(math.abs(Lattice.det(sup.cell) / Lattice.det(fcc4.cell) - 8.0) < 1e-9)
    // off-diagonal multiple
    val sheared = Generators.supercell(fcc4, Seq(1, 0, 0, 1, 1, 0, 0, 0, 1))
    assert(sheared.n === 4)
  }

  test("strain scales cell isotropically (G5)") {
    val out = Generators.strains(fcc4, Seq(-2.0, 0.0, 2.0))
    assert(out.length === 3)
    val vols = out.map(c => Lattice.det(c.cell) / Lattice.det(fcc4.cell))
    assert(math.abs(vols(0) - 0.98) < 1e-9)
    assert(math.abs(vols(1) - 1.0) < 1e-9)
    assert(math.abs(vols(2) - 1.02) < 1e-9)
  }

  test("liquid subsamples MD frames into liq-typed configs (G6)") {
    import graft.sources.Xdatcar
    // a fake 10-frame trajectory: each frame rattles the seed slightly
    val frames = (0 until 10).map { i =>
      val c = fcc4.copy(
        positions = fcc4.positions.map(_.map(_ + i * 0.01)))
      Xdatcar.Frame(i + 1, c.copy(uuid = s"md-run-$i"))
    }
    val out = Generators.liquid(frames, rate = 3)
    assert(out.length === 3) // steps 3, 6, 9 (step % samplerate == 0)
    out.foreach { c =>
      assert(c.configType === Some("liq")) // liquid.py:83 config_type
      assert(c.energy.isEmpty && c.force.isEmpty) // fresh DFT seeds
      assert(c.params.contains("md_step"))
      assert(c.uuid.nonEmpty && c.groupUuid.nonEmpty)
    }
    assert(out.map(_.params("md_step")) === Seq("3", "6", "9"))
    // content-hash ids: identical frames dedup
    val dupFrames = frames ++ frames.map(f => f.copy(step = f.step + 100))
    val deduped = Generators.liquid(dupFrames, rate = 1)
    assert(deduped.length === 10)
    // the mdbase.ready() gate: an unfinished MD base fails loudly
    assertThrows[IllegalArgumentException](Generators.liquid(Nil, 2))
  }

  test("hessian kernel recovers the harmonic spring constant (G7/G8)") {
    val seed2 = Config.of(Seq("Ag", "Pd"),
      Seq(Seq(a, 0.0, 0.0), Seq(0.0, a, 0.0), Seq(0.0, 0.0, a)),
      Seq(Seq(0.0, 0.0, 0.0), Seq(a / 2, a / 2, a / 2)))
    val k = 1.7
    val eigs = Hessian.forSeed(seed2, StubCalculator(k = k))
      .map(_.params("stub_hessian").toDouble)
    // E = ½k Σ|rᵢ−r̄|² has Hessian k(I − P_com): eigenvalues k with
    // the 3 center-of-mass translations at 0 (filtered by the cutoff)
    assert(eigs.length === 3)
    eigs.foreach(l => assert(math.abs(l - k) < 1e-6))
  }
}
