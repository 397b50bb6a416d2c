package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._

class CoreSpec extends AnyFunSuite {

  test("formula compression and expansion round-trip (K14)") {
    assert(Formula.compress(Seq("Pd", "Ag", "Pd", "Ag")) === "Ag2Pd2")
    assert(Formula.compress(Seq("Si")) === "Si")
    assert(Formula.compress(Seq("Co", "W", "V", "Co")) === "Co2VW")
    assert(Formula.expand("Ag2Pd2") === Seq("Ag", "Ag", "Pd", "Pd"))
    assert(Formula.expand("Si") === Seq("Si"))
  }

  test("type map is deterministic and bidirectional (J3)") {
    val tm = Formula.typeMap(Seq("Pd", "Ag", "Pd", "Co"))
    assert(tm === Map("Ag" -> 0, "Co" -> 1, "Pd" -> 2))
    assert(Formula.inverseTypeMap(Seq("Pd", "Ag", "Co")) ===
      Map(0 -> "Ag", 1 -> "Co", 2 -> "Pd"))
  }

  test("content hash is stable and structure-sensitive (D1)") {
    val c = Config.of(Seq("Ag", "Pd"),
      Seq(Seq(4.0, 0.0, 0.0), Seq(0.0, 4.0, 0.0), Seq(0.0, 0.0, 4.0)),
      Seq(Seq(0.0, 0.0, 0.0), Seq(2.0, 2.0, 2.0)))
    val c2 = Config.of(Seq("Ag", "Pd"),
      Seq(Seq(4.0, 0.0, 0.0), Seq(0.0, 4.0, 0.0), Seq(0.0, 0.0, 4.0)),
      Seq(Seq(0.0, 0.0, 0.0), Seq(2.0, 2.0, 2.0)))
    assert(c.uuid === c2.uuid)           // deterministic
    val moved = Config.of(Seq("Ag", "Pd"), c.cell,
      Seq(Seq(0.0, 0.0, 0.0), Seq(2.0, 2.0, 2.0001)))
    assert(c.uuid !== moved.uuid)        // position-sensitive
    val swapped = Config.of(Seq("Pd", "Ag"), c.cell, c.positions)
    assert(c.uuid !== swapped.uuid)      // species permutation matters
  }

  test("Rng streams replay per key and differ across keys") {
    val a1 = Rng.forKey(42L, "k1").nextInt(1000000)
    val a2 = Rng.forKey(42L, "k1").nextInt(1000000)
    val b = Rng.forKey(42L, "k2").nextInt(1000000)
    val c = Rng.forKey(43L, "k1").nextInt(1000000)
    assert(a1 === a2)
    assert(a1 !== b)
    assert(a1 !== c)
  }

  test("lattice det/inverse/matmul (K2–K4 helpers)") {
    val m = Seq(Seq(2.0, 0.0, 0.0), Seq(0.0, 3.0, 0.0), Seq(1.0, 0.0, 4.0))
    assert(math.abs(Lattice.det(m) - 24.0) < 1e-12)
    val inv = Lattice.inverse(m)
    val id = Lattice.matmul(m, inv)
    for (i <- 0 until 3; j <- 0 until 3)
      assert(math.abs(id(i)(j) - (if (i == j) 1.0 else 0.0)) < 1e-12)
    assert(Lattice.conformSupercell(Seq(2, 2, 2)) ===
      Seq(Seq(2, 0, 0), Seq(0, 2, 0), Seq(0, 0, 2)))
  }
}
