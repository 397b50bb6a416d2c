package graft.sources

import graft.core.{Config, Lattice}

/** VASP OUTCAR result extraction (SURVEY §2.1 S6/S7; reference:
  * calculators/vasp.py:405–435 completion probe — the tail must
  * contain `free  energy` with `TOTEN` on the line — and 473–544
  * extraction attaching `vasp_energy/force/virial`, where
  * virial = stress × cell volume).
  *
  * Parses the final (converged) ionic step: last TOTEN, last
  * POSITION/TOTAL-FORCE block, last `in kB` stress row, last direct
  * lattice vectors + volume. Used by `VaspCalculator.extract` as an
  * ingest kernel: one OUTCAR text per task, no driver parsing.
  */
object Outcar {

  final case class Result(
      energy: Double,               // eV (free energy TOTEN)
      positions: Seq[Seq[Double]],  // Å, final step
      forces: Seq[Seq[Double]],     // eV/Å
      stressKb: Seq[Double],        // XX YY ZZ XY YZ ZX in kB
      cell: Lattice.Mat3,           // Å
      volume: Double) {             // Å³
    /** virial = stress × volume, 3×3 row-major in eV
      * (1 kB = 0.1 GPa; 1 eV/Å³ = 160.2176634 GPa). */
    def virial: Seq[Double] = {
      val s = stressKb.map(_ * 0.1 / 160.2176634 * volume)
      Seq(s(0), s(3), s(5),
          s(3), s(1), s(4),
          s(5), s(4), s(2))
    }
  }

  /** K16 version probe (vasp.py:52–90 vasp_version): the version is
    * the first whitespace token of the first non-blank line VASP
    * prints — identical to an OUTCAR's first line (` vasp.5.3.3
    * 18Dez12 (build ...)` → `vasp.5.3.3`). The reference execs the
    * binary in a temp dir and memoizes per path; executing an external
    * binary is outside the data plane here, so the probe takes the
    * output TEXT (an OUTCAR or the binary's captured stdout) and the
    * memo cache keys on the caller's path, matching `_versions`. */
  def vaspVersion(text: String): String =
    text.linesIterator
      .map(_.trim)
      .find(_.nonEmpty)
      .flatMap(_.split("\\s+").headOption)
      .getOrElse("")

  private val versionCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Memoized per-path variant (vasp.py:47–50 `_versions`); `read`
    * supplies the text only on a cache miss. */
  def vaspVersionOf(path: String, read: String => String): String =
    versionCache.computeIfAbsent(path, p => vaspVersion(read(p)))

  /** S7 completion probe (vasp.py:405–435): tail contains
    * `free  energy` and that line mentions TOTEN. */
  def isConverged(text: String): Boolean = {
    val i = text.lastIndexOf("free  energy")
    i >= 0 && text.substring(i, math.min(text.length, i + 80)).contains("TOTEN")
  }

  def parse(text: String): Option[Result] = {
    if (!isConverged(text)) return None
    val lines = text.linesIterator.toIndexedSeq

    val toten = lines.zipWithIndex.reverse.collectFirst {
      case (l, _) if l.contains("free  energy") && l.contains("TOTEN") =>
        l.split("=")(1).trim.split("\\s+")(0).toDouble
    }

    val forceStart = lines.lastIndexWhere(l =>
      l.contains("POSITION") && l.contains("TOTAL-FORCE"))
    val posForces =
      if (forceStart < 0) None
      else {
        val rows = lines.drop(forceStart + 2)
          .takeWhile(l => !l.trim.startsWith("-----"))
          .map(_.trim.split("\\s+").map(_.toDouble).toSeq)
        Some((rows.map(_.take(3)), rows.map(_.slice(3, 6))))
      }

    val stress = lines.reverse.collectFirst {
      case l if l.trim.startsWith("in kB") =>
        l.trim.stripPrefix("in kB").trim.split("\\s+").map(_.toDouble).toSeq
    }

    val latStart = lines.lastIndexWhere(_.contains("direct lattice vectors"))
    val cell =
      if (latStart < 0) None
      else Some((1 to 3).map(i =>
        lines(latStart + i).trim.split("\\s+").take(3).map(_.toDouble).toSeq))

    val volume = lines.reverse.collectFirst {
      case l if l.contains("volume of cell") =>
        l.split(":")(1).trim.split("\\s+")(0).toDouble
    }

    for {
      e <- toten
      (p, f) <- posForces
      s <- stress
      c <- cell
      v <- volume
    } yield Result(e, p, f, s, c, v)
  }

  /** Attach parsed results to a Config as the `vasp` calculator's
    * namespaced outputs (calculators/basic.py:70–96 contract). */
  def attach(c: Config, r: Result): Config =
    c.copy(
      positions = r.positions,
      cell = r.cell,
      energy = Some(r.energy),
      force = Some(r.forces),
      virial = Some(r.virial),
      params = c.params +
        ("vasp_energy" -> r.energy.toString) + ("calc" -> "vasp"))
}
