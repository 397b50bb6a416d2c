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

  /** G1 enumeration, distributed over the (size × HNF-class) grid:
    * the point-group-reduced sublattice classes are the Dataset axis;
    * each task enumerates symmetry-unique labelings for its own
    * sublattice (the Spark shape — at scale the grid is huge and
    * labelings never leave their task). Class reduction is O(HNF²·48)
    * integer checks on the driver — cheap next to the labeling walk. */
  def g1Enumerated(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pcell = graft.generators.Enumerated.primitiveCell("fcc", 4.05)._1
    val grid = for {
      n <- 2 to 4
      (hnf, idx) <- graft.generators.Enumerated.hnfClasses(pcell, n.toLong)
        .zipWithIndex
    } yield (n, idx, hnf.map(_.toSeq).toSeq)
    s.createDataset(grid).repartition(col("_2"))
      .flatMap { case (n, idx, hnfRows) =>
        val hnf: graft.core.Crystal.IMat = hnfRows.map(_.toArray).toArray
        graft.generators.Enumerated
          .labelingsFor("fcc", 4.05, Seq("Ag", "Pd"), hnf, idx)
          .map(e => (e.size, e.hnfIndex, e.labeling, e.config.uuid,
            e.config.symbols))
      }
      .toDF("size", "hnf_index", "labeling", "uuid", "symbols")
      .orderBy(col("size"), col("hnf_index"), col("labeling"))
  }

  /** G1 nconfigs sampling (enumerated.py:354–448): keyed-digest rank
    * over the distributed enumeration stream — md5(seed:uuid) orders
    * the structures pseudo-randomly but deterministically, and
    * orderBy+limit compiles to TakeOrderedAndProject (per-partition
    * top-n, no global sort materialization). Same grid-distributed
    * kernel as g1Enumerated. */
  def g1EnumSampled(s: SparkSession, dir: String): DataFrame = {
    val nconfigs = 12
    val seed = 42
    g1Enumerated(s, dir)
      .withColumn("__r", md5(concat_ws(":", lit(seed), col("uuid"))))
      .orderBy(col("__r"))
      .limit(nconfigs)
      .drop("__r")
      .orderBy(col("size"), col("hnf_index"), col("labeling"))
  }

  /** G9 prototype decoration: library × species permutations. */
  def g9Prototypes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val protos = graft.generators.Prototypes.generate(
      Seq("all"), Seq("Ag", "Pd"), Map("Ag" -> 4.09, "Pd" -> 3.89))
    s.createDataset(protos).toDF()
      .select(col("uuid"), col("symbols"), col("n"),
        col("params").getItem("prototype").as("prototype"),
        col("params").getItem("perm").as("perm"))
      .orderBy(col("prototype"), col("perm"))
  }

  def m6EndToEnd(s: SparkSession, dir: String): DataFrame =
    MaterialsPipeline.endToEnd(s)

  def g8HessianEigen(s: SparkSession, dir: String): DataFrame =
    MaterialsPipeline.hessianSlice(s)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g1_enumerated" -> (g1Enumerated _),
    "g1_enum_sampled" -> (g1EnumSampled _),
    "g9_prototypes" -> (g9Prototypes _),
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
