package graft.sources

import graft.core.{Config, Lattice}

/** XDATCAR MD-trajectory codec (SURVEY §2.1 S10; reference:
  * database/md.py:149–228 — stream frames, emit every
  * `samplerate`-th as a POSCAR).
  *
  * Layout: header (comment / scale / 3 cell rows / species / counts)
  * then repeated `Direct configuration N` + n fractional rows.
  */
object Xdatcar {

  final case class Frame(step: Int, config: Config)

  def read(text: String): Seq[Frame] = {
    val lines = text.linesIterator.toIndexedSeq
    val scale = lines(1).trim.toDouble
    val cell: Lattice.Mat3 = (2 to 4).map(i =>
      lines(i).trim.split("\\s+").take(3).map(_.toDouble * scale).toSeq)
    val species = lines(5).trim.split("\\s+").toSeq
    val counts = lines(6).trim.split("\\s+").map(_.toInt).toSeq
    val n = counts.sum
    val perAtom = species.zip(counts).flatMap { case (s, c) => Seq.fill(c)(s) }
    val frames = Seq.newBuilder[Frame]
    var i = 7
    while (i < lines.length) {
      val header = lines(i).trim
      if (header.toLowerCase.startsWith("direct configuration")) {
        val step = header.split("=").last.trim.toInt
        val frac = (i + 1 to i + n).map(r =>
          lines(r).trim.split("\\s+").take(3).map(_.toDouble).toSeq)
        val cart = frac.map(f => Lattice.rowMat(f, cell))
        frames += Frame(step, Config.of(perAtom, cell, cart,
          configType = Some("md_frame")))
        i += 1 + n
      } else i += 1
    }
    frames.result()
  }

  /** Every-`samplerate`-th frame (md.py:184–209 = O8). */
  def subsample(frames: Seq[Frame], samplerate: Int): Seq[Frame] =
    frames.filter(_.step % samplerate == 0)

  def writeFrame(step: Int, c: Config): String = {
    val sb = new StringBuilder
    sb.append(s"MD frames\n1.0\n")
    c.cell.foreach(r => sb.append("  %.16f %.16f %.16f\n".format(r(0), r(1), r(2))))
    val groups = c.species.distinct
    sb.append(groups.mkString(" ")).append('\n')
    sb.append(groups.map(g => c.species.count(_ == g)).mkString(" ")).append('\n')
    sb.append(s"Direct configuration=     $step\n")
    val inv = Lattice.inverse(c.cell)
    c.positions.foreach { p =>
      val f = Lattice.rowMat(p, inv)
      sb.append("  %.8f %.8f %.8f\n".format(f(0), f(1), f(2)))
    }
    sb.toString
  }
}
