package graft.core

import graft.pipeline.Yaml
import graft.pipeline.Yaml.{YList, YMap}

/** K9 phonon band paths + K10 band.yaml ingest (reference:
  * kpoints.py:41–103 — `kpath`/`parsed_kpath` wrap the seekpath
  * service and stitch discontinuous segments as `A|B` labels;
  * phonons.py:306–333 `from_yaml` reads phonopy's band.yaml into
  * (q, w, path, Q)).
  *
  * The special points and default paths are the published
  * crystallographic tables (Setyawan & Curtarolo, "High-throughput
  * electronic band structure calculations", Comput. Mater. Sci. 49
  * (2010) 299–312 — the same tables seekpath's HPKOT paths extend)
  * for the five lattices the reference's specs exercise: sc, fcc,
  * bcc, hcp (hexagonal), and simple tetragonal. Fractional
  * coordinates are in the reciprocal basis of the standard primitive
  * cell.
  */
object BandPath {

  /** Special k-points per lattice (fractional, reciprocal-primitive). */
  val specialPoints: Map[String, Map[String, Seq[Double]]] = Map(
    "sc" -> Map(
      "GAMMA" -> Seq(0.0, 0.0, 0.0),
      "X" -> Seq(0.0, 0.5, 0.0),
      "M" -> Seq(0.5, 0.5, 0.0),
      "R" -> Seq(0.5, 0.5, 0.5)),
    "fcc" -> Map(
      "GAMMA" -> Seq(0.0, 0.0, 0.0),
      "K" -> Seq(0.375, 0.375, 0.75),
      "L" -> Seq(0.5, 0.5, 0.5),
      "U" -> Seq(0.625, 0.25, 0.625),
      "W" -> Seq(0.5, 0.25, 0.75),
      "X" -> Seq(0.5, 0.0, 0.5)),
    "bcc" -> Map(
      "GAMMA" -> Seq(0.0, 0.0, 0.0),
      "H" -> Seq(0.5, -0.5, 0.5),
      "P" -> Seq(0.25, 0.25, 0.25),
      "N" -> Seq(0.0, 0.0, 0.5)),
    "hcp" -> Map(
      "GAMMA" -> Seq(0.0, 0.0, 0.0),
      "A" -> Seq(0.0, 0.0, 0.5),
      "H" -> Seq(1.0 / 3, 1.0 / 3, 0.5),
      "K" -> Seq(1.0 / 3, 1.0 / 3, 0.0),
      "L" -> Seq(0.5, 0.0, 0.5),
      "M" -> Seq(0.5, 0.0, 0.0)),
    "tet" -> Map(
      "GAMMA" -> Seq(0.0, 0.0, 0.0),
      "A" -> Seq(0.5, 0.5, 0.5),
      "M" -> Seq(0.5, 0.5, 0.0),
      "R" -> Seq(0.0, 0.5, 0.5),
      "X" -> Seq(0.0, 0.5, 0.0),
      "Z" -> Seq(0.0, 0.0, 0.5)))

  /** Default paths as (from, to) segments; a segment whose start is
    * not the previous end is a discontinuity (rendered `end|start`). */
  val defaultPath: Map[String, Seq[(String, String)]] = Map(
    "sc" -> Seq("GAMMA" -> "X", "X" -> "M", "M" -> "GAMMA",
      "GAMMA" -> "R", "R" -> "X", "M" -> "R"),
    "fcc" -> Seq("GAMMA" -> "X", "X" -> "W", "W" -> "K", "K" -> "GAMMA",
      "GAMMA" -> "L", "L" -> "U", "U" -> "W", "W" -> "L", "L" -> "K",
      "U" -> "X"),
    "bcc" -> Seq("GAMMA" -> "H", "H" -> "N", "N" -> "GAMMA",
      "GAMMA" -> "P", "P" -> "H", "P" -> "N"),
    "hcp" -> Seq("GAMMA" -> "M", "M" -> "K", "K" -> "GAMMA",
      "GAMMA" -> "A", "A" -> "L", "L" -> "H", "H" -> "A",
      "L" -> "M", "K" -> "H"),
    "tet" -> Seq("GAMMA" -> "X", "X" -> "M", "M" -> "GAMMA",
      "GAMMA" -> "Z", "Z" -> "R", "R" -> "A", "A" -> "Z",
      "X" -> "R", "M" -> "A"))

  /** `kpath` (kpoints.py:74–103): names along the walk — a plain name
    * where segments join, an (end, start) pair at discontinuities —
    * plus the point-coordinate table. */
  def kpath(lattice: String): (Seq[Either[String, (String, String)]],
      Map[String, Seq[Double]]) = {
    val segs = defaultPath.getOrElse(lattice,
      throw new IllegalArgumentException(s"no band path for $lattice"))
    val names = scala.collection.mutable.ArrayBuffer[
      Either[String, (String, String)]](Left(segs.head._1))
    segs.sliding(2).foreach {
      case Seq((_, e0), (s1, _)) =>
        if (e0 == s1) names += Left(s1) else names += Right((e0, s1))
      case _ =>
    }
    names += Left(segs.last._2)
    (names.toSeq, specialPoints(lattice))
  }

  /** `parsed_kpath` (kpoints.py:41–72): labels with `\Gamma` fixed and
    * `A|B` junction rendering, plus coordinates per label (taking the
    * junction's first point, as the reference does). */
  def parsedKpath(lattice: String): (Seq[String], Seq[Seq[Double]]) = {
    def fix(s: String) = if (s == "GAMMA") "\\Gamma" else s
    val (names, pts) = kpath(lattice)
    val labels = names.map {
      case Left(n) => fix(n)
      case Right((a, b)) => s"${fix(a)}|${fix(b)}"
    }
    val band = names.map {
      case Left(n) => pts(n)
      case Right((a, _)) => pts(a)
    }
    (labels, band)
  }

  /** Parsed band.yaml content (phonons.py:306–333 from_yaml):
    * `q` distances along the path, `w` per-q band frequencies,
    * `path` q-positions, `Q` distances of the labeled special points. */
  final case class Bands(q: Seq[Double], w: Seq[Seq[Double]],
      path: Seq[Seq[Double]], Q: Seq[Double])

  /** K10: parse phonopy's band.yaml text. */
  def fromYaml(text: String): Bands = {
    val root = Yaml.parse(text)
    val phonon = root("phonon") match {
      case YList(xs) => xs.collect { case m: YMap => m }
      case other => throw new IllegalArgumentException(s"bad phonon: $other")
    }
    def nums(n: Yaml.Node): Seq[Double] = n match {
      case YList(xs) => xs.map(Yaml.num)
      case other => throw new IllegalArgumentException(s"bad list: $other")
    }
    val q = phonon.map(e => Yaml.num(e("distance")))
    val w = phonon.map { e =>
      e("band") match {
        case YList(bs) => bs.collect { case m: YMap => Yaml.num(m("frequency")) }
        case other => throw new IllegalArgumentException(s"bad band: $other")
      }
    }
    val path = phonon.map(e => nums(e("q-position")))
    val bigQ = phonon.filter(_.get("label").isDefined)
      .map(e => Yaml.num(e("distance")))
    Bands(q, w, path, bigQ)
  }
}
