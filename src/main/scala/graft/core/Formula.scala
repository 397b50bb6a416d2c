package graft.core

/** Chemical-formula helpers (SURVEY §2.9 K14, §2.4 J3;
  * reference: matdb/atoms.py:450–452 formula compression;
  * io.py:86–91 species↔int type maps for CFG io).
  */
object Formula {

  /** species list → compressed formula, elements alphabetical:
    * Seq("Pd","Ag","Pd","Ag") → "Ag2Pd2"; count 1 is omitted. */
  def compress(species: Seq[String]): String =
    species.groupBy(identity).toSeq.sortBy(_._1)
      .map { case (el, xs) => if (xs.length == 1) el else s"$el${xs.length}" }
      .mkString

  /** "Ag2Pd2" → Seq("Ag","Ag","Pd","Pd") (alphabetical expansion). */
  def expand(formula: String): Seq[String] = {
    val m = raw"([A-Z][a-z]?)(\d*)".r
    m.findAllMatchIn(formula).flatMap { g =>
      val count = if (g.group(2).isEmpty) 1 else g.group(2).toInt
      Seq.fill(count)(g.group(1))
    }.toSeq
  }

  /** Bidirectional species↔int map for MTP CFG io (io.py:86–91):
    * deterministic — sorted unique species, 0-based. */
  def typeMap(species: Seq[String]): Map[String, Int] =
    species.distinct.sorted.zipWithIndex.toMap

  def inverseTypeMap(species: Seq[String]): Map[Int, String] =
    typeMap(species).map(_.swap)
}
