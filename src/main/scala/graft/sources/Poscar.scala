package graft.sources

import graft.core.{Config, Formula}

/** VASP POSCAR codec (SURVEY §2.1 S3; reference: matdb/atoms.py:403–404
  * write via ase "vasp" format; seeds in tests/files/POSCAR-*).
  *
  * Supports the VASP 5 layout: comment / scale / 3 cell rows /
  * species line / counts line / ("Selective dynamics")? /
  * Direct|Cartesian / n position rows.
  */
object Poscar {

  def write(c: Config): String = {
    val sb = new StringBuilder
    sb.append(c.symbols).append('\n')
    sb.append("1.0\n")
    c.cell.foreach(r => sb.append(
      "  %.16f %.16f %.16f\n".format(r(0), r(1), r(2))))
    val groups = c.species.distinct // preserve atom order grouping
    sb.append(groups.mkString(" ")).append('\n')
    sb.append(groups.map(g => c.species.count(_ == g)).mkString(" ")).append('\n')
    sb.append("Cartesian\n")
    c.positions.foreach(p => sb.append(
      "  %.16f %.16f %.16f\n".format(p(0), p(1), p(2))))
    sb.toString
  }

  def read(text: String): Config = {
    val lines = text.linesIterator.filter(_.trim.nonEmpty).toIndexedSeq
    val scale = lines(1).trim.toDouble
    val cell = (2 to 4).map(i =>
      lines(i).trim.split("\\s+").take(3).map(_.toDouble * scale).toSeq)
    val species = lines(5).trim.split("\\s+").toSeq
    val counts = lines(6).trim.split("\\s+").map(_.toInt).toSeq
    var idx = 7
    if (lines(idx).trim.toLowerCase.startsWith("s")) idx += 1 // selective dynamics
    val direct = lines(idx).trim.toLowerCase.startsWith("d")
    idx += 1
    val n = counts.sum
    val raw = (idx until idx + n).map(i =>
      lines(i).trim.split("\\s+").take(3).map(_.toDouble).toSeq)
    val positions =
      if (direct) raw.map(f => (0 until 3).map(j =>
        f(0) * cell(0)(j) + f(1) * cell(1)(j) + f(2) * cell(2)(j)))
      else raw.map(_.map(_ * scale))
    val perAtom = species.zip(counts).flatMap { case (s, c) => Seq.fill(c)(s) }
    Config.of(perAtom, cell, positions)
  }
}
