package graft.sources

import graft.core.{Config, Formula}

/** MTP `.cfg` codec (SURVEY §2.1 S4/S5; reference: matdb/io.py:57–141
  * writer `atoms_to_cfg`, 143–266 reader `cfg_to_atoms` — sections
  * BEGIN_CFG / Size / Supercell / AtomData / Energy / PlusStress /
  * Feature / END_CFG; species↔int via the deterministic type map,
  * io.py:86–91).
  */
object Cfg {

  /** @param typeMap species → 0-based int (Formula.typeMap). */
  def write(c: Config, typeMap: Map[String, Int]): String = {
    val sb = new StringBuilder
    sb.append("BEGIN_CFG\n")
    sb.append(" Size\n    %d\n".format(c.n))
    sb.append(" Supercell\n")
    c.cell.foreach(r => sb.append(
      "    %.9f %.9f %.9f\n".format(r(0), r(1), r(2))))
    val hasF = c.force.isDefined
    sb.append(" AtomData:  id type cartes_x cartes_y cartes_z" +
      (if (hasF) " fx fy fz" else "") + "\n")
    (0 until c.n).foreach { i =>
      sb.append("    %d %d %.9f %.9f %.9f".format(
        i + 1, typeMap(c.species(i)),
        c.positions(i)(0), c.positions(i)(1), c.positions(i)(2)))
      if (hasF) {
        val f = c.force.get(i)
        sb.append(" %.9f %.9f %.9f".format(f(0), f(1), f(2)))
      }
      sb.append('\n')
    }
    c.energy.foreach(e => sb.append(" Energy\n    %.9f\n".format(e)))
    c.virial.foreach { v => // PlusStress: xx yy zz yz xz xy (io.py:119–124)
      sb.append(" PlusStress:  xx yy zz yz xz xy\n")
      sb.append("    %.9f %.9f %.9f %.9f %.9f %.9f\n".format(
        v(0), v(4), v(8), v(5), v(2), v(1)))
    }
    sb.append(" Feature   conf_id  %s\n".format(c.uuid))
    sb.append("END_CFG\n")
    sb.toString
  }

  def read(text: String, inverseTypeMap: Map[Int, String]): Seq[Config] = {
    val blocks = text.split("BEGIN_CFG").toSeq.map(_.trim).filter(_.nonEmpty)
    blocks.map { b =>
      val lines = b.linesIterator.map(_.trim).filter(_.nonEmpty).toIndexedSeq
      def sectionIdx(name: String): Int =
        lines.indexWhere(_.startsWith(name))
      val n = lines(sectionIdx("Size") + 1).toInt
      val ci = sectionIdx("Supercell")
      val cell = (1 to 3).map(k =>
        lines(ci + k).split("\\s+").take(3).map(_.toDouble).toSeq)
      val ai = sectionIdx("AtomData")
      val hasF = lines(ai).contains("fx")
      val rows = (1 to n).map(k => lines(ai + k).split("\\s+"))
      val species = rows.map(r => inverseTypeMap(r(1).toInt)).toSeq
      val positions = rows.map(r => r.slice(2, 5).map(_.toDouble).toSeq)
      val force = if (hasF)
        Some(rows.map(r => r.slice(5, 8).map(_.toDouble).toSeq).toSeq)
      else None
      val ei = sectionIdx("Energy")
      val energy = if (ei >= 0) Some(lines(ei + 1).toDouble) else None
      val si = sectionIdx("PlusStress")
      val virial = if (si >= 0) {
        val s = lines(si + 1).split("\\s+").map(_.toDouble) // xx yy zz yz xz xy
        Some(Seq(s(0), s(5), s(4), s(5), s(1), s(3), s(4), s(3), s(2)))
      } else None
      val base = Config.of(species, cell, positions)
      base.copy(energy = energy, force = force, virial = virial)
    }
  }
}
