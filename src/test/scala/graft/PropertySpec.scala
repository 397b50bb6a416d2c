package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.core.{Config, Crystal, Formula}
import graft.sources.{ExtXyz, Poscar}

/** Property-based invariants for the pure kernels (the reference has
  * no property tests — SURVEY §5; these guard the from-scratch math).
  * Plain scalacheck generators with a pinned seed (the scalatest
  * bridge artifact isn't on the offline classpath).
  */
class PropertySpec extends AnyFunSuite {

  private def samples[T](g: Gen[T], n: Int = 100): Seq[T] = {
    var seed = Seed(42L)
    val out = Seq.newBuilder[T]
    var tries = 0
    while (out.knownSize < n && tries < n * 50) {
      g.apply(Gen.Parameters.default, seed).foreach(out += _)
      seed = seed.next
      tries += 1
    }
    out.result()
  }

  private val elementGen: Gen[String] =
    Gen.oneOf("Ag", "Pd", "Cu", "Co", "W", "V", "Si", "H")
  private val speciesGen: Gen[List[String]] =
    Gen.nonEmptyListOf(elementGen).map(_.take(12))

  test("formula compress/expand round-trips for any species multiset") {
    samples(speciesGen).foreach { sp =>
      assert(Formula.expand(Formula.compress(sp)) === sp.sorted)
    }
  }

  test("type map is a bijection over the distinct species") {
    samples(speciesGen).foreach { sp =>
      val tm = Formula.typeMap(sp)
      val inv = Formula.inverseTypeMap(sp)
      assert(tm.size === sp.distinct.size)
      tm.foreach { case (el, i) => assert(inv(i) === el) }
    }
  }

  private val intMatGen: Gen[Crystal.IMat] = Gen.listOfN(9, Gen.choose(-8L, 8L))
    .map(vals => vals.grouped(3).map(_.toArray).toArray)
    .suchThat(m => Crystal.idet(m) != 0)

  test("HNF invariants hold for arbitrary nonsingular integer matrices") {
    val mats = samples(intMatGen)
    assert(mats.nonEmpty)
    mats.foreach { a =>
      val (h, u) = Crystal.hermiteNormalForm(a)
      assert(math.abs(Crystal.idet(u)) === 1L)
      assert(Crystal.idet(h) === math.abs(Crystal.idet(a)))
      assert(h(0)(1) === 0L && h(0)(2) === 0L && h(1)(2) === 0L)
      for (i <- 0 until 3; j <- 0 until 3)
        assert((0 until 3).map(k => a(i)(k) * u(k)(j)).sum === h(i)(j))
      for (i <- 0 until 3; j <- 0 until i)
        assert(h(i)(j) >= 0 && h(i)(j) < h(i)(i))
    }
  }

  private val configGen: Gen[Config] = for {
    n <- Gen.choose(1, 6)
    sp <- Gen.listOfN(n, elementGen)
    a <- Gen.choose(3.0, 6.0)
    pos <- Gen.listOfN(n, Gen.listOfN(3, Gen.choose(0.0, 5.0)))
  } yield Config.of(sp,
    Seq(Seq(a, 0.0, 0.0), Seq(0.1, a, 0.0), Seq(0.0, 0.2, a)),
    pos.map(_.toSeq))

  test("POSCAR round-trip preserves geometry for arbitrary configs") {
    samples(configGen, 50).foreach { c =>
      val r = Poscar.read(Poscar.write(c))
      assert(r.n === c.n)
      for (i <- 0 until 3; j <- 0 until 3)
        assert(math.abs(r.cell(i)(j) - c.cell(i)(j)) < 1e-9)
      assert(r.species.sorted === c.species.sorted)
    }
  }

  test("extxyz round-trip preserves species order and positions") {
    samples(configGen, 50).foreach { c =>
      val r = ExtXyz.read(ExtXyz.write(c)).head
      assert(r.species === c.species)
      for (i <- 0 until c.n; j <- 0 until 3)
        assert(math.abs(r.positions(i)(j) - c.positions(i)(j)) < 1e-8)
    }
  }

  test("content hash: equal configs collide, perturbed configs don't") {
    samples(configGen, 50).foreach { c =>
      val same = Config.of(c.species, c.cell, c.positions)
      assert(same.uuid === Config.of(c.species, c.cell, c.positions).uuid)
      val moved = Config.of(c.species, c.cell,
        c.positions.updated(0, c.positions(0).map(_ + 0.001)))
      assert(moved.uuid !== same.uuid)
    }
  }
}
