package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Config
import graft.generators.Generators
import graft.pipeline.MaterialsPipeline

/** Materials-domain operator surface (SURVEY §2.2 generators, §2.5
  * dedup, §2.10 pipeline). Not SQL-expressible → no oracle entries;
  * the driver records rows-only checks and the ScalaTest specs carry
  * the golden assertions (determinism, physics invariants).
  *
  * These take the sfDir parameter for contract uniformity but operate
  * on the deterministic seed fixtures (the reference's seeds are
  * POSCAR files, not relational tables).
  */
object MaterialsOps {

  def g2Substitution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    MaterialsPipeline.generate(MaterialsPipeline.seedDs(s), ranSeed = 42L)
      .toDF()
      .select(col("uuid"), col("groupUuid"), col("symbols"), col("n"),
        col("configType"))
      .orderBy(col("uuid"))
  }

  def g3Vacancy(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    MaterialsPipeline.seedDs(s)
      .flatMap(c => Generators.vacancy(c, 0.25, nconfigs = 4, ranSeed = 42L))
      .toDF()
      .select(col("uuid"), col("symbols"), col("n"),
        col("params").getItem("removed").as("removed"))
      .orderBy(col("uuid"))
  }

  def g4Distortion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    MaterialsPipeline.seedDs(s)
      .flatMap(c => Generators.distortion(c, nconfigs = 4, covDiag = 0.0004,
        volumeFactor = 1.02, rattle = 0.001, ranSeed = 42L))
      .toDF()
      .select(col("uuid"), col("symbols"), col("n"), col("configType"))
      .orderBy(col("uuid"))
  }

  def g13Supercell(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    MaterialsPipeline.seedDs(s)
      .map(c => Generators.supercell(c, Seq(2, 2, 1)))
      .toDF()
      .select(col("uuid"), col("symbols"), col("n"))
      .orderBy(col("uuid"))
  }

  def m6EndToEnd(s: SparkSession, dir: String): DataFrame =
    MaterialsPipeline.endToEnd(s)

  def g8HessianEigen(s: SparkSession, dir: String): DataFrame =
    MaterialsPipeline.hessianSlice(s)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g2_substitution" -> (g2Substitution _),
    "g3_vacancy" -> (g3Vacancy _),
    "g4_distortion" -> (g4Distortion _),
    "g13_supercell" -> (g13Supercell _),
    "g8_hessian_eigen" -> (g8HessianEigen _),
    "m6_materials_e2e" -> (m6EndToEnd _),
  )

  /** Non-SQL-expressible: no oracle entries (driver does rows-only). */
  val oracle: Map[String, String] = Map.empty
}
