package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Kpoints
import graft.sources.QeXml

class QeKpointsSpec extends AnyFunSuite {

  /** Synthetic QEXSD-shaped fixture (Hartree atomic units):
    * 2-atom cell, nonzero forces, diagonal stress. */
  private val goldenXml =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<qes:espresso xmlns:qes="http://www.quantum-espresso.org/ns/qes/qes-1.0">
      |  <input><atomic_structure nat="2"><cell>
      |    <a1>1.0 0.0 0.0</a1><a2>0.0 1.0 0.0</a2><a3>0.0 0.0 1.0</a3>
      |  </cell></atomic_structure></input>
      |  <output>
      |    <total_energy><etot>-2.0</etot></total_energy>
      |    <atomic_structure nat="2" alat="7.5">
      |      <atomic_positions>
      |        <atom name="Ag" index="1">0.0 0.0 0.0</atom>
      |        <atom name="Pd" index="2">3.5 3.5 3.5</atom>
      |      </atomic_positions>
      |      <cell>
      |        <a1>7.0 0.0 0.0</a1>
      |        <a2>0.0 7.0 0.0</a2>
      |        <a3>0.0 0.0 7.0</a3>
      |      </cell>
      |    </atomic_structure>
      |    <forces rank="2" dims="3 2" order="F">
      |      0.01 0.0 0.0 -0.01 0.0 0.0
      |    </forces>
      |    <stress rank="2" dims="3 3" order="F">
      |      1.0e-4 0.0 0.0 0.0 1.0e-4 0.0 0.0 0.0 1.0e-4
      |    </stress>
      |  </output>
      |  <status>0</status>
      |</qes:espresso>
      |""".stripMargin

  private val Ha2eV = 27.211386245988
  private val Bohr2A = 0.529177210903

  test("QE XML extraction converts Hartree units to eV/Å (S8)") {
    val r = QeXml.parse(goldenXml).get
    assert(math.abs(r.energy - (-2.0 * Ha2eV)) < 1e-9)
    assert(r.species === Seq("Ag", "Pd"))
    assert(math.abs(r.positions(1)(0) - 3.5 * Bohr2A) < 1e-9)
    assert(math.abs(r.cell(0)(0) - 7.0 * Bohr2A) < 1e-9)
    assert(math.abs(r.forces(0)(0) - 0.01 * Ha2eV / Bohr2A) < 1e-9)
    assert(math.abs(r.forces(1)(0) + 0.01 * Ha2eV / Bohr2A) < 1e-9)
    // virial diag = stress · V
    val sEv = 1.0e-4 * Ha2eV / math.pow(Bohr2A, 3)
    assert(math.abs(r.virial(0) - sEv * r.volume) < 1e-9)
  }

  test("QE completion probe: nonzero status rejected (S8/F7)") {
    assert(QeXml.isConverged(goldenXml))
    assert(!QeXml.isConverged(goldenXml.replace(
      "<status>0</status>", "<status>1</status>")))
    assert(!QeXml.isConverged("not xml at all"))
  }

  test("k-point divisions scale inversely with cell size (K8)") {
    val small = Seq(Seq(3.0, 0.0, 0.0), Seq(0.0, 3.0, 0.0), Seq(0.0, 0.0, 3.0))
    val big = Seq(Seq(12.0, 0.0, 0.0), Seq(0.0, 12.0, 0.0), Seq(0.0, 0.0, 12.0))
    val nSmall = Kpoints.divisions(small, density = 4.0)
    val nBig = Kpoints.divisions(big, density = 4.0)
    assert(nSmall.forall(_ > nBig.head)) // bigger cell → fewer k-points
    assert(nBig === Seq(2, 2, 2))
  }

  test("Γ-centered grid: weights sum to 1, inversion-deduped (K8)") {
    // 2×2×2: every point is its own inverse (−0.5 ≡ 0.5 mod 1) → 8
    assert(Kpoints.gammaCentered(Seq(2, 2, 2)).length === 8)
    // 3×3×3: ±1/3 pairs merge → (27 − 1)/2 + 1 = 14 points
    val pts = Kpoints.gammaCentered(Seq(3, 3, 3))
    assert(pts.length === 14)
    assert(math.abs(pts.map(_._2).sum - 1.0) < 1e-12)
    assert(pts.head._1 === Seq(0.0, 0.0, 0.0))
    assert(math.abs(pts.head._2 - 1.0 / 27) < 1e-12) // Γ unpaired
    val file = Kpoints.kpointsFile(Seq(2, 2, 2))
    assert(file.contains("Gamma") && file.contains("2 2 2"))
  }

  test("Monkhorst–Pack grid: shifted, Γ-free for even divisions (K8)") {
    val pts = Kpoints.monkhorstPack(Seq(2, 2, 2))
    // 2×2×2 MP = (±1/4, ±1/4, ±1/4): inversion pairs merge → 4 points
    assert(pts.length === 4)
    assert(math.abs(pts.map(_._2).sum - 1.0) < 1e-12)
    pts.foreach { case (k, w) =>
      k.foreach(x => assert(math.abs(math.abs(x) - 0.25) < 1e-12))
      assert(math.abs(w - 0.25) < 1e-12)
    }
    // no Γ in an even grid; odd grids include Γ (equivalent to
    // Γ-centered for odd divisions)
    assert(!pts.exists(_._1.forall(_ == 0.0)))
    assert(Kpoints.monkhorstPack(Seq(3, 3, 3))
      .exists(_._1.forall(_ == 0.0)))
  }

  test("fcc band path: Γ–X–W–K–Γ–L–U–W–L–K|U–X (K9)") {
    import graft.core.BandPath
    val (labels, band) = BandPath.parsedKpath("fcc")
    assert(labels === Seq("\\Gamma", "X", "W", "K", "\\Gamma",
      "L", "U", "W", "L", "K|U", "X"))
    // coordinates come from the published table
    assert(band(0) === Seq(0.0, 0.0, 0.0))
    assert(band(1) === Seq(0.5, 0.0, 0.5))          // X
    assert(band(2) === Seq(0.5, 0.25, 0.75))        // W
    // junction takes the first point's coordinates (K, not U)
    assert(band(9) === Seq(0.375, 0.375, 0.75))
    // all five lattices have consistent tables
    Seq("sc", "fcc", "bcc", "hcp", "tet").foreach { lat =>
      val (ls, b) = BandPath.parsedKpath(lat)
      assert(ls.length === b.length)
      assert(ls.head === "\\Gamma")
      b.foreach(p => assert(p.length === 3))
    }
    // bcc: Γ-H-N-Γ-P-H|P-N
    assert(BandPath.parsedKpath("bcc")._1 ===
      Seq("\\Gamma", "H", "N", "\\Gamma", "P", "H|P", "N"))
  }

  test("band.yaml round-trip parse into (q, w, path, Q) (K10)") {
    import graft.core.BandPath
    val canned =
      """nqpoint: 3
        |npath: 1
        |phonon:
        |  - q-position: [0.0, 0.0, 0.0]
        |    distance: 0.0
        |    label: "\Gamma"
        |    band:
        |      - frequency: 0.0
        |      - frequency: 0.1
        |      - frequency: 0.2
        |  - q-position: [0.25, 0.0, 0.25]
        |    distance: 0.35
        |    band:
        |      - frequency: 1.2
        |      - frequency: 2.3
        |      - frequency: 2.9
        |  - q-position: [0.5, 0.0, 0.5]
        |    distance: 0.7
        |    label: "X"
        |    band:
        |      - frequency: 3.1
        |      - frequency: 4.2
        |      - frequency: 5.0
        |""".stripMargin
    val b = BandPath.fromYaml(canned)
    assert(b.q === Seq(0.0, 0.35, 0.7))
    assert(b.w === Seq(Seq(0.0, 0.1, 0.2), Seq(1.2, 2.3, 2.9),
      Seq(3.1, 4.2, 5.0)))
    assert(b.path === Seq(Seq(0.0, 0.0, 0.0), Seq(0.25, 0.0, 0.25),
      Seq(0.5, 0.0, 0.5)))
    assert(b.Q === Seq(0.0, 0.7)) // only labeled special points
  }
}
