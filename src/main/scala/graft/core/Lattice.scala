package graft.core

/** Small 3×3 lattice math used by the generators (SURVEY §2.9 K2–K5;
  * reference: matdb/transforms.py:32–52 conform_supercell,
  * database/utility.py:383–496 HNF). Pure Scala — cheap enough that
  * Breeze would be overhead at this size.
  */
object Lattice {

  type Mat3 = Seq[Seq[Double]]

  def det(m: Mat3): Double =
    m(0)(0) * (m(1)(1) * m(2)(2) - m(1)(2) * m(2)(1)) -
      m(0)(1) * (m(1)(0) * m(2)(2) - m(1)(2) * m(2)(0)) +
      m(0)(2) * (m(1)(0) * m(2)(1) - m(1)(1) * m(2)(0))

  def matmul(a: Mat3, b: Mat3): Mat3 =
    (0 until 3).map(i => (0 until 3).map(j =>
      (0 until 3).map(k => a(i)(k) * b(k)(j)).sum))

  def inverse(m: Mat3): Mat3 = {
    val d = det(m)
    require(math.abs(d) > 1e-12, "singular matrix")
    val c = Seq(
      Seq(m(1)(1) * m(2)(2) - m(1)(2) * m(2)(1),
          m(0)(2) * m(2)(1) - m(0)(1) * m(2)(2),
          m(0)(1) * m(1)(2) - m(0)(2) * m(1)(1)),
      Seq(m(1)(2) * m(2)(0) - m(1)(0) * m(2)(2),
          m(0)(0) * m(2)(2) - m(0)(2) * m(2)(0),
          m(0)(2) * m(1)(0) - m(0)(0) * m(1)(2)),
      Seq(m(1)(0) * m(2)(1) - m(1)(1) * m(2)(0),
          m(0)(1) * m(2)(0) - m(0)(0) * m(2)(1),
          m(0)(0) * m(1)(1) - m(0)(1) * m(1)(0)))
    c.map(_.map(_ / d))
  }

  /** row-vector × matrix (positions are row vectors; cell rows are
    * lattice vectors). */
  def rowMat(v: Seq[Double], m: Mat3): Seq[Double] =
    (0 until 3).map(j => (0 until 3).map(k => v(k) * m(k)(j)).sum)

  /** Normalize 3- / 9- / 3×3-element supercell spec to 3×3 of Int
    * (K2 conform_supercell, transforms.py:32–52). */
  def conformSupercell(spec: Seq[Int]): Seq[Seq[Int]] = spec.length match {
    case 3 => Seq(Seq(spec(0), 0, 0), Seq(0, spec(1), 0), Seq(0, 0, spec(2)))
    case 9 => spec.grouped(3).toSeq
    case n => throw new IllegalArgumentException(s"supercell spec of length $n")
  }
}
