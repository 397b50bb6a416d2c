package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.calculators.Calculator
import graft.core.Config
import graft.generators.Generators

/** Iterative active-learning loop (SURVEY §2.10; reference:
  * fitting/mtp.py:779–935 state machine, database/active.py:158–205
  * dedup-guarded append-only active set).
  *
  * Re-expressed as an idempotent driver loop over batch jobs — the
  * idiomatic Spark shape for bounded iterative ML. Per iteration:
  * relax/perturb candidates from the current set (stand-in for MTP
  * relax), grade them (stand-in for maxvol extrapolation), select
  * top-k, anti-join against everything seen (D1/G12), run the
  * calculator, append with an `iteration` column. State lives
  * entirely in the persisted parquet table, so a crashed loop resumes
  * from the last completed iteration (the reference's `status.txt`
  * becomes table contents).
  */
final class ActiveLoop(spark: SparkSession, calc: Calculator,
    tablePath: String, ranSeed: Long = 42L) {

  import spark.implicits._

  private def tableExists: Boolean =
    scala.util.Try(spark.read.parquet(tablePath).schema).isSuccess

  def current: DataFrame =
    if (tableExists) spark.read.parquet(tablePath)
    else spark.emptyDataFrame

  def currentIteration: Int =
    if (!tableExists) -1
    else current.agg(max(col("iteration"))).collect()(0) match {
      case r if r.isNullAt(0) => -1
      case r => r.getInt(0)
    }

  /** Seed iteration 0 from initial configs. */
  def bootstrap(seeds: Seq[Config]): Unit =
    if (currentIteration < 0) {
      val cal = calc
      val ds = spark.createDataset(seeds).map(cal.extract(_))
      ds.toDF().withColumn("iteration", lit(0))
        .write.mode("overwrite").parquet(tablePath)
    }

  /** One iteration: candidates → grade → select → dedup-append.
    * @return number of configs actually added. */
  def step(nCandidatesPerConfig: Int, selectK: Int): Long = {
    val iter = currentIteration + 1
    // locals only in the closures below — capturing fields would drag
    // `this` (and the non-serializable SparkSession) into the task
    val seed = ranSeed + iter
    val nCand = nCandidatesPerConfig
    val cal = calc
    val base = current.as[ConfigRow]
    val cands = base.flatMap { row =>
      Generators.distortion(row.toConfig, nCand,
        covDiag = 0.0016, volumeFactor = 1.0, rattle = 0.02,
        ranSeed = seed)
    }.dropDuplicates("uuid")
    // grade: stand-in extrapolation score = stub energy magnitude
    val graded = cands.map(cal.extract(_))
      .map(c => (c, math.abs(c.energy.getOrElse(0.0))))
      .toDF("config", "grade")
    val selected = graded.orderBy(col("grade").desc,
        col("config.uuid").asc).limit(selectK)
      .select(col("config.*"))
    // D1/G12 dedup-guarded append: never re-add a seen content hash
    val fresh = selected.join(current.select(col("uuid")),
      Seq("uuid"), "left_anti")
    val added = fresh.count()
    if (added > 0)
      fresh.withColumn("iteration", lit(iter))
        .write.mode("append").parquet(tablePath)
    added
  }

  /** Run until convergence (no additions) or the iteration budget —
    * mtp.py:362–368 `iter_threshold`. */
  def run(iterations: Int, nCandidatesPerConfig: Int = 3,
      selectK: Int = 8): Seq[Long] =
    (0 until iterations).map { _ =>
      step(nCandidatesPerConfig, selectK)
    }.takeWhile(_ > 0)
}

/** Row mirror of Config for Dataset reads from parquet (the open
  * maps survive; Option fields read back as nullable). */
final case class ConfigRow(
    uuid: String, groupUuid: String, n: Int, symbols: String,
    species: Seq[String], cell: Seq[Seq[Double]],
    positions: Seq[Seq[Double]], pbc: Seq[Boolean],
    energy: Option[Double], force: Option[Seq[Seq[Double]]],
    virial: Option[Seq[Double]], configType: Option[String],
    params: Map[String, String], properties: Map[String, Seq[Double]],
    iteration: Int) {
  def toConfig: Config = Config(uuid, groupUuid, n, symbols, species,
    cell, positions, pbc, energy, force, virial, configType, params,
    properties)
}
