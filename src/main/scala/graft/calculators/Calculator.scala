package graft.calculators

import graft.core.{Config, Hashing, Rng}

/** External-compute connector interface (SURVEY §7 module 5;
  * reference contract: calculators/basic.py:70–168 — calculators
  * namespace outputs as `{key}_energy/{key}_force/{key}_virial` and
  * expose create/can_execute/is_executing/can_extract/extract).
  *
  * In the Spark engine this is a *library around the data plane*, not
  * an engine feature: `create` renders inputs, execution happens
  * outside (HPC/batch), `extract` parses results back into columns.
  * The driver loop is a reconciliation batch query over a status
  * table (SURVEY §2.10), not a SparkStrategy.
  */
trait Calculator extends Serializable {
  /** Namespace key for attached outputs (e.g. "vasp", "qe", "stub"). */
  def key: String
  def canExecute(c: Config): Boolean
  def canExtract(c: Config): Boolean
  /** Attach `{key}_energy`/force/virial results. */
  def extract(c: Config): Config
}

/** Deterministic fake DFT for hermetic tests (reference strategy:
  * tests/conftest.py:3–69 symlinks fake `vasp`/`mlp` binaries).
  *
  * Energy model: harmonic springs to a per-species reference point —
  * E = Σᵢ ½·k·|rᵢ − r̄|², F = −k·(rᵢ − r̄), plus a species offset.
  * Smooth, seed-stable, and with an analytically known Hessian
  * (k·I per atom), which the phonon kernel tests exploit.
  */
final case class StubCalculator(k: Double = 1.0, ranSeed: Long = 42L)
    extends Calculator {
  val key = "stub"
  def canExecute(c: Config): Boolean = c.n > 0
  def canExtract(c: Config): Boolean = c.n > 0

  def extract(c: Config): Config = {
    val centroid = (0 until 3).map(j => c.positions.map(_(j)).sum / c.n)
    val disp = c.positions.map(p => (0 until 3).map(j => p(j) - centroid(j)))
    val spOffset = c.species.map(s =>
      (Rng.deriveSeed(ranSeed, s"el:$s") % 1000).toDouble / 1000.0).sum
    val energy = 0.5 * k * disp.map(d => d.map(x => x * x).sum).sum + spOffset
    val force = disp.map(d => d.map(x => -k * x))
    val virial = (0 until 3).flatMap(a => (0 until 3).map(b =>
      -k * disp.map(d => d(a) * d(b)).sum))
    c.copy(
      energy = Some(energy),
      force = Some(force),
      virial = Some(virial),
      params = c.params +
        (s"${key}_energy" -> energy.toString) + ("calc" -> key))
  }
}
