package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SpecialValues
import graft.pipeline.Yaml
import graft.pipeline.Yaml.{YList, YMap, YNum, YStr}

/** K11 special_values / K12 special_functions / K13 get_grid
  * (utility.py:589–699, 736–819). */
class SpecialValuesSpec extends AnyFunSuite {

  test("linspace / logspace / range grammar (K11)") {
    assert(SpecialValues.values("linspace(0, 1, 5)").get ===
      Seq(0.0, 0.25, 0.5, 0.75, 1.0))
    assert(SpecialValues.values("linspace(2, 2, 1)").get === Seq(2.0))
    val ls = SpecialValues.values("logspace(0, 3, 4)").get
    assert(ls.zip(Seq(1.0, 10.0, 100.0, 1000.0))
      .forall { case (a, b) => math.abs(a - b) < 1e-9 })
    // numpy.arange semantics: exclusive stop
    assert(SpecialValues.values("range(1, 6, 2)").get === Seq(1.0, 3.0, 5.0))
    assert(SpecialValues.values("range(4)").get === Seq(0.0, 1.0, 2.0, 3.0))
    // |nogs| marker strips
    assert(SpecialValues.values("linspace(0, 1, 3)|nogs|").get ===
      Seq(0.0, 0.5, 1.0))
    // non-special strings pass through as None
    assert(SpecialValues.values("vasp").isEmpty)
  }

  test("random: draws are deterministic per seed (K11)") {
    val a = SpecialValues.values("random:uniform(0, 2, 6)", seed = 7).get
    val b = SpecialValues.values("random:uniform(0, 2, 6)", seed = 7).get
    val c = SpecialValues.values("random:uniform(0, 2, 6)", seed = 8).get
    assert(a === b)
    assert(a !== c)
    assert(a.length === 6)
    a.foreach(x => assert(x >= 0 && x < 2))
    val n = SpecialValues.values("distr:norm(10, 0.5, 100)", seed = 1).get
    assert(n.length === 100)
    assert(math.abs(n.sum / n.length - 10.0) < 0.5)
  }

  test("slicer bracket form (K11→O9)") {
    assert(SpecialValues.values("[2, 4:7, 9]").get ===
      Seq(2.0, 4.0, 5.0, 6.0, 9.0))
  }

  test("special_functions: numpy/math/linalg with reshape (K12)") {
    assert(SpecialValues.functions("numpy:mean", Seq(1, 2, 3, 6)) === 3.0)
    assert(SpecialValues.functions("numpy:median", Seq(1, 3, 2)) === 2.0)
    assert(SpecialValues.functions("math:sqrt", Seq(9)) === 3.0)
    val det = SpecialValues.functions("linalg:det",
      Seq(2, 0, 0, 0, 3, 0, 0, 0, 4), reshape = Some((3, 3)))
    assert(math.abs(det - 24.0) < 1e-9)
  }

  test("get_grid: starred keys, nesting, suffix naming (K13)") {
    val params = Yaml.parse(
      """type: distortion
        |rattle*: "linspace(0, 0.2, 3)"
        |volume_factor*: [0.95, 1.05]
        |nconfigs: 2
        |""".stripMargin)
    val grid = SpecialValues.getGrid(params)
    assert(grid.length === 6) // 3 × 2 cross product
    // every variant has scalars in place of the starred keys
    grid.foreach { case (suffix, m) =>
      assert(m.get("rattle").exists(_.isInstanceOf[YNum]))
      assert(m.get("volume_factor").exists(_.isInstanceOf[YNum]))
      assert(m.keys.forall(k => !k.endsWith("*")))
      assert(suffix.nonEmpty)
    }
    // default suffix = 3-char key prefix + 1-based index, composed
    assert(grid.map(_._1).contains("rat-1-vol-1"))
    assert(grid.map(_._1).distinct.length === 6)
    // explicit suffix list overrides the index
    val withSuffix = Yaml.parse(
      """rattle*: [0.1, 0.2]
        |rattle_suffix*: [lo, hi]
        |""".stripMargin)
    assert(SpecialValues.getGrid(withSuffix).map(_._1).toSet ===
      Set("rat-lo", "rat-hi"))
    // nested maps expand too
    val nested = Yaml.parse(
      """outer: 1
        |sub:
        |  depth*: [1, 2, 3]
        |""".stripMargin)
    val g2 = SpecialValues.getGrid(nested)
    assert(g2.length === 3)
    g2.foreach { case (_, m) =>
      assert(m("sub").asInstanceOf[YMap].get("depth").exists(_.isInstanceOf[YNum]))
    }
  }

  test("get_grid: nested map with explicit suffix list terminates (K13)") {
    // Regression: isNested used to count `*_suffix*` helper keys as
    // starred, so a NESTED map whose only star was consumed (leaving
    // just the suffix helper) recursed forever.
    val nested = Yaml.parse(
      """outer: 1
        |sub:
        |  depth*: [1, 2]
        |  depth_suffix*: [lo, hi]
        |""".stripMargin)
    val grid = SpecialValues.getGrid(nested)
    assert(grid.length === 2)
    assert(grid.map(_._1).toSet === Set("dep-lo", "dep-hi"))
    grid.foreach { case (_, m) =>
      val sub = m("sub").asInstanceOf[YMap]
      assert(sub.get("depth").exists(_.isInstanceOf[YNum]))
      assert(sub.keys.forall(k => !k.endsWith("*")))
    }
  }

  test("get_grid without stars is the identity") {
    val params = Yaml.parse("type: vacancy\nnconfigs: 2\n")
    val grid = SpecialValues.getGrid(params)
    assert(grid.length === 1)
    assert(grid.head._1 === "")
    assert(grid.head._2.keys === Seq("type", "nconfigs"))
  }
}
