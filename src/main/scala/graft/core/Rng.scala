package graft.core

import scala.util.Random

/** Deterministic RNG discipline (SURVEY §4 "random-seed plumbing";
  * reference: database/__init__.py:1640–1642 global ran_seed;
  * substitution.py:283, distortion.py:224, vacancy.py:306 per-group
  * seeds).
  *
  * Every distributed generator derives its stream from
  * (globalSeed, stable key) — never from partition index or time — so
  * results replay identically under any partitioning/cluster size.
  */
object Rng {

  /** Stable 64-bit mix of seed + key (FNV-1a over the key, xor-mixed). */
  def deriveSeed(seed: Long, key: String): Long = {
    var h = 1125899906842597L
    key.foreach(c => h = (h ^ c.toLong) * 1099511628211L)
    h ^ (seed * 0x9e3779b97f4a7c15L)
  }

  def forKey(seed: Long, key: String): Random =
    new Random(deriveSeed(seed, key))

  /** Fisher–Yates shuffle with the given RNG (scala.util.Random.shuffle
    * is already deterministic for a seeded Random; pinned here for
    * cross-version stability). */
  def shuffle[T](xs: Seq[T], r: Random): Seq[T] = {
    val a = xs.toArray[Any]
    var i = a.length - 1
    while (i > 0) {
      val j = r.nextInt(i + 1)
      val t = a(i); a(i) = a(j); a(j) = t
      i -= 1
    }
    a.toSeq.asInstanceOf[Seq[T]]
  }
}
