package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Config
import graft.sources.Outcar

class OutcarSpec extends AnyFunSuite {

  /** Synthetic golden OUTCAR fragment following the VASP layout:
    * two ionic steps — extraction must take the LAST one. */
  private val golden =
    """ vasp.6 something
      |  free  energy   TOTEN  =       -10.00000000 eV
      |
      |  FORCE on cell =-STRESS in cart. coord.  units (eV):
      |  Total       0.86632     0.81034     0.85716    -0.00557    -0.00424     0.01270
      |  in kB      10.00000    10.00000    10.00000     0.00000     0.00000     0.00000
      |
      | VOLUME and BASIS-vectors are now :
      |  energy-cutoff  :      500.00
      |  volume of cell :       64.00
      |      direct lattice vectors                 reciprocal lattice vectors
      |     4.000000000  0.000000000  0.000000000     0.250000000  0.000000000  0.000000000
      |     0.000000000  4.000000000  0.000000000     0.000000000  0.250000000  0.000000000
      |     0.000000000  0.000000000  4.000000000     0.000000000  0.000000000  0.250000000
      |
      | POSITION                                       TOTAL-FORCE (eV/Angst)
      | -----------------------------------------------------------------------------------
      |      0.00000      0.00000      0.00000        -0.100000      0.001000     -0.000900
      |      2.00000      2.00000      2.00000         0.100000     -0.001000      0.000900
      | -----------------------------------------------------------------------------------
      |    total drift:                               -0.000025     -0.000000     -0.000000
      |
      |  free  energy   TOTEN  =       -21.50000000 eV
      |  energy without entropy =      -21.49000000
      |""".stripMargin

  test("OUTCAR extraction: last TOTEN, forces, stress→virial (S6)") {
    val r = Outcar.parse(golden).get
    assert(r.energy === -21.5)            // the LAST ionic step
    assert(r.forces.length === 2)
    assert(r.forces(0)(0) === -0.1)
    assert(r.positions(1) === Seq(2.0, 2.0, 2.0))
    assert(r.volume === 64.0)
    assert(r.cell(0)(0) === 4.0)
    // virial: isotropic 10 kB → diag = 10*0.1/160.2176634*64 eV
    val expect = 10.0 * 0.1 / 160.2176634 * 64.0
    assert(math.abs(r.virial(0) - expect) < 1e-9)
    assert(r.virial(1) === 0.0)
  }

  test("parses the reference's real 4-atom OUTCAR fixture (S6)") {
    // /root/reference/tests/files/outcars/4_atom: a full VASP run the
    // reference's own tests extract from — final ionic step TOTEN
    // -20.85055258 eV, NIONS = 4.
    val path = java.nio.file.Paths.get("/root/reference/tests/files/outcars/4_atom")
    assume(java.nio.file.Files.exists(path), "reference fixture not present")
    val text = java.nio.file.Files.readString(path)
    val r = Outcar.parse(text).get
    assert(math.abs(r.energy - (-20.85055258)) < 1e-9)
    assert(r.forces.length === 4)
    assert(r.positions.length === 4)
    assert(r.volume > 0)
    assert(Outcar.isConverged(text))
  }

  test("version probe extracts the first token of the first line (K16)") {
    // the reference's real fixture starts ` vasp.5.3.3 18Dez12 (build …)`
    val path = java.nio.file.Paths.get("/root/reference/tests/files/outcars/4_atom")
    assume(java.nio.file.Files.exists(path), "reference fixture not present")
    assert(Outcar.vaspVersion(java.nio.file.Files.readString(path))
      === "vasp.5.3.3")
    assert(Outcar.vaspVersion("") === "")           // vasp.py:61–66 empty path
    assert(Outcar.vaspVersion("\n  vasp.6.4.2 x\n") === "vasp.6.4.2")
    // memoized per path: `read` runs once (vasp.py:47–50 _versions)
    var reads = 0
    def read(p: String): String = { reads += 1; " vasp.5.4.4 rest" }
    val key = s"/fake/bin/vasp-${System.nanoTime()}"
    assert(Outcar.vaspVersionOf(key, read) === "vasp.5.4.4")
    assert(Outcar.vaspVersionOf(key, read) === "vasp.5.4.4")
    assert(reads === 1)
  }

  test("completion probe rejects truncated runs (S7)") {
    assert(Outcar.isConverged(golden))
    assert(!Outcar.isConverged(golden.take(20))) // cut before any TOTEN line
    assert(!Outcar.isConverged("free  energy junk without the keyword"))
  }

  test("attach namespaces the results onto the config (basic.py contract)") {
    val c = Config.of(Seq("Ag", "Pd"),
      Seq(Seq(4.0, 0, 0), Seq(0, 4.0, 0), Seq(0, 0, 4.0)),
      Seq(Seq(0.0, 0.0, 0.0), Seq(2.0, 2.0, 2.0)))
    val out = Outcar.attach(c, Outcar.parse(golden).get)
    assert(out.energy === Some(-21.5))
    assert(out.params("vasp_energy") === "-21.5")
    assert(out.params("calc") === "vasp")
    assert(out.force.get.length === 2)
  }
}
