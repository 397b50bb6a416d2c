package graft.sources

import graft.core.Config

/** Extended-XYZ codec (SURVEY §2.1 S3; reference: matdb/atoms.py:
  * 460–473 read/write via ase extxyz).
  *
  * Layout per frame: natoms / key=value comment line (Lattice="9
  * floats", Properties=species:S:1:pos:R:3[:forces:R:3],
  * energy=E) / n atom rows. Multiple frames concatenate.
  */
object ExtXyz {

  def write(c: Config): String = {
    val sb = new StringBuilder
    sb.append(c.n).append('\n')
    val lat = c.cell.flatten.map(v => "%.10f".format(v)).mkString(" ")
    sb.append(s"""Lattice="$lat" Properties=species:S:1:pos:R:3""")
    c.force.foreach(_ => sb.append(":forces:R:3"))
    c.energy.foreach(e => sb.append(s" energy=${"%.10f".format(e)}"))
    sb.append(" pbc=\"T T T\"\n")
    (0 until c.n).foreach { i =>
      sb.append(c.species(i))
      c.positions(i).foreach(v => sb.append(" %.10f".format(v)))
      c.force.foreach(f => f(i).foreach(v => sb.append(" %.10f".format(v))))
      sb.append('\n')
    }
    sb.toString
  }

  def read(text: String): Seq[Config] = {
    val lines = text.linesIterator.toIndexedSeq
    var i = 0
    val out = Seq.newBuilder[Config]
    while (i < lines.length && lines(i).trim.nonEmpty) {
      val n = lines(i).trim.toInt
      val comment = lines(i + 1)
      val latR = """Lattice="([^"]+)"""".r
      val cell = latR.findFirstMatchIn(comment) match {
        case Some(m) =>
          m.group(1).trim.split("\\s+").map(_.toDouble).grouped(3)
            .map(_.toSeq).toSeq
        case None => throw new IllegalArgumentException("extxyz: no Lattice")
      }
      val eR = """energy=([-\d.eE+]+)""".r
      val energy = eR.findFirstMatchIn(comment).map(_.group(1).toDouble)
      val hasForces = comment.contains(":forces:R:3")
      val rows = (0 until n).map(k => lines(i + 2 + k).trim.split("\\s+"))
      val species = rows.map(_(0)).toSeq
      val positions = rows.map(r => r.slice(1, 4).map(_.toDouble).toSeq)
      val force = if (hasForces)
        Some(rows.map(r => r.slice(4, 7).map(_.toDouble).toSeq).toSeq)
      else None
      val base = Config.of(species, cell, positions)
      out += base.copy(energy = energy, force = force)
      i += 2 + n
    }
    out.result()
  }
}
