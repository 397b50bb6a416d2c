package graft.sources

import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.{Document, Element}
import graft.core.{Config, Lattice}

/** Quantum Espresso XML result extraction (SURVEY §2.1 S8; reference:
  * calculators/qe.py:241–347 — the modern pw.x output is the QEXSD
  * XML: `<output>` holds the converged structure, `<etot>` in
  * Hartree, forces in Ha/Bohr (dims "3 nat", F-order), stress 3×3 in
  * Ha/Bohr³; `<status>0</status>` marks success).
  *
  * All quantities are converted to the engine's eV/Å system.
  */
object QeXml {

  private val Ha2eV = 27.211386245988
  private val Bohr2A = 0.529177210903

  final case class Result(
      energy: Double,               // eV
      positions: Seq[Seq[Double]],  // Å
      species: Seq[String],
      forces: Seq[Seq[Double]],     // eV/Å
      stress: Seq[Seq[Double]],     // eV/Å³, 3×3
      cell: Lattice.Mat3) {         // Å
    def volume: Double = math.abs(Lattice.det(cell))
    /** virial = stress × volume, row-major 9 (vasp.py parity). */
    def virial: Seq[Double] = stress.flatten.map(_ * volume)
  }

  private def parseDoc(xml: String): Document = {
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false)
    f.newDocumentBuilder().parse(
      new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))
  }

  private def firstUnder(parent: Element, tag: String): Option[Element] = {
    val nl = parent.getElementsByTagName(tag)
    if (nl.getLength == 0) None else Some(nl.item(0).asInstanceOf[Element])
  }

  private def doubles(text: String): Seq[Double] =
    text.trim.split("\\s+").filter(_.nonEmpty).map(_.toDouble).toSeq

  /** S7-analog completion probe: status element present and zero. */
  def isConverged(xml: String): Boolean =
    scala.util.Try {
      val doc = parseDoc(xml)
      val st = doc.getElementsByTagName("status")
      st.getLength > 0 && st.item(0).getTextContent.trim == "0"
    }.getOrElse(false)

  def parse(xml: String): Option[Result] = {
    if (!isConverged(xml)) return None
    val doc = parseDoc(xml)
    val outputs = doc.getElementsByTagName("output")
    if (outputs.getLength == 0) return None
    val out = outputs.item(0).asInstanceOf[Element]

    val energy = firstUnder(out, "etot").map(_.getTextContent.trim.toDouble)

    val structure = firstUnder(out, "atomic_structure")
    val atoms = structure.toSeq.flatMap { s =>
      val nl = s.getElementsByTagName("atom")
      (0 until nl.getLength).map(i => nl.item(i).asInstanceOf[Element])
    }
    val species = atoms.map(_.getAttribute("name"))
    val positions = atoms.map(a => doubles(a.getTextContent).map(_ * Bohr2A))

    val cell = structure.flatMap { s =>
      for {
        a1 <- firstUnder(s, "a1"); a2 <- firstUnder(s, "a2")
        a3 <- firstUnder(s, "a3")
      } yield Seq(a1, a2, a3).map(e => doubles(e.getTextContent).map(_ * Bohr2A))
    }

    val forces = firstUnder(out, "forces").map { f =>
      doubles(f.getTextContent).grouped(3)
        .map(_.map(_ * Ha2eV / Bohr2A).toSeq).toSeq
    }
    val stress = firstUnder(out, "stress").map { s =>
      doubles(s.getTextContent).grouped(3)
        .map(_.map(_ * Ha2eV / math.pow(Bohr2A, 3)).toSeq).toSeq
    }

    for {
      e <- energy
      c <- cell
      f <- forces
      st <- stress
    } yield Result(e * Ha2eV, positions, species, f, st, c)
  }

  /** Attach as the `qe` calculator's namespaced outputs. */
  def attach(c: Config, r: Result): Config =
    c.copy(
      positions = r.positions,
      cell = r.cell,
      energy = Some(r.energy),
      force = Some(r.forces),
      virial = Some(r.virial),
      params = c.params +
        ("qe_energy" -> r.energy.toString) + ("calc" -> "qe"))
}
