package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.calculators.StubCalculator
import graft.core.Config
import graft.generators.Generators
import graft.operators.Splits
import graft.pipeline.Yaml._

/** The §3.1 query lifecycle: YAML spec → logical plan (database →
  * ordered steps, step N consuming step N−1's rset — the reference's
  * `prev` chaining, database/__init__.py:521–537) → staged Spark jobs
  * → calculator extract → split.
  *
  * The reference's Controller builds this DAG from matdb.yml
  * (database/__init__.py:1585–1686); here the same spec shape drives
  * `Dataset[Config]` stages. Execution is eager per stage (each stage
  * is one Spark job over the previous stage's output), dedup is the
  * content-hash drop, and the final relation is split-tagged.
  */
object SpecPipeline {

  final case class Step(stepType: String, params: YMap)
  final case class DatabasePlan(name: String, steps: Seq[Step])
  final case class Plan(title: String, species: Seq[String], ranSeed: Long,
      trainFrac: Double, databases: Seq[DatabasePlan])

  def parsePlan(yaml: String): Plan = parsePlan(Yaml.parse(yaml))

  /** S11 hierarchical form: root spec file with `:link` includes
    * (io.py:345–440), e.g. `databases: ":agpd_dbs"`. */
  def parsePlanFile(context: String, yfile: String): Plan =
    Yaml.readSpec(context, yfile) match {
      case m: Yaml.YMap => parsePlan(m)
      case other =>
        throw new IllegalArgumentException(s"spec root must be a map: $other")
    }

  def parsePlan(root: YMap): Plan = {
    val species = root("species") match {
      case YList(xs) => xs.map(str)
      case other => Seq(str(other))
    }
    val splits = root.get("splits").collect { case m: YMap =>
      m.get("train").map(num).getOrElse(0.8)
    }.getOrElse(0.8)
    val dbs = root("databases") match {
      case YList(ds) => ds.map {
        case m: YMap =>
          val steps = m("steps") match {
            case YList(ss) => ss.map {
              case sm: YMap => Step(str(sm("type")), sm)
              case other => throw new IllegalArgumentException(s"bad step $other")
            }
            case other => throw new IllegalArgumentException(s"bad steps $other")
          }
          DatabasePlan(str(m("name")), steps)
        case other => throw new IllegalArgumentException(s"bad database $other")
      }
      case other => throw new IllegalArgumentException(s"bad databases $other")
    }
    Plan(
      title = root.get("title").map(str).getOrElse(""),
      species = species,
      ranSeed = root.get("ran_seed").map(num(_).toLong).getOrElse(42L),
      trainFrac = splits,
      databases = dbs)
  }

  /** Apply one generator step to the previous stage's rset. */
  private def applyStep(prev: Dataset[Config], step: Step, species: Seq[String],
      ranSeed: Long): Dataset[Config] = {
    import prev.sparkSession.implicits._
    val p = step.params
    def intOf(k: String, d: Int) = p.get(k).map(num(_).toInt).getOrElse(d)
    def dblOf(k: String, d: Double) = p.get(k).map(num).getOrElse(d)
    val out = step.stepType match {
      case "substitution" =>
        val stoich = p("stoich") match {
          case m: YMap => m.items.map { case (k, v) => k -> num(v) }.toMap
          case other => throw new IllegalArgumentException(s"bad stoich $other")
        }
        val n = intOf("nconfigs", 4)
        prev.flatMap(c => Generators.substitution(c, stoich, n, ranSeed))
      case "vacancy" =>
        val vac = dblOf("vac_per_atom", 0.25)
        val n = intOf("nconfigs", 2)
        prev.flatMap(c => Generators.vacancy(c, vac, n, ranSeed))
      case "distortion" =>
        val n = intOf("nconfigs", 2)
        val cov = dblOf("cov_diag", 0.0004)
        val vol = dblOf("volume_factor", 1.0)
        val rat = dblOf("rattle", 0.0)
        prev.flatMap(c => Generators.distortion(c, n, cov, vol, rat, ranSeed))
      case "supercell" =>
        val spec = p("multiple") match {
          case YList(xs) => xs.map(num(_).toInt)
          case other => throw new IllegalArgumentException(s"bad multiple $other")
        }
        prev.map(c => Generators.supercell(c, spec))
      case "strain" =>
        val ss = p("strains") match {
          case YList(xs) => xs.map(num)
          case other => throw new IllegalArgumentException(s"bad strains $other")
        }
        prev.flatMap(c => Generators.strains(c, ss))
      case other =>
        throw new IllegalArgumentException(s"unknown step type: $other")
    }
    out.dropDuplicates("uuid") // D1–D6 guard after every generator
  }

  /** K11/K13 grid fan-out: a database whose steps carry starred
    * parameters (`rattle*: "linspace(0, 0.2, 5)"`) expands into one
    * database variant per grid point, named `dbname-suffix` — the
    * reference's get_grid group expansion (utility.py:766–819 driving
    * e.g. the Hessian grids). */
  def expandGrids(plan: Plan): Plan = {
    val dbs = plan.databases.flatMap { db =>
      val perStep: Seq[Seq[(String, Step)]] = db.steps.map { st =>
        graft.functions.SpecialValues.getGrid(st.params, plan.ranSeed)
          .map { case (suffix, m) => (suffix, Step(st.stepType, m)) }
      }
      perStep.foldLeft(Seq(("", Seq.empty[Step]))) { (acc, g) =>
        for ((s0, steps) <- acc; (s1, st) <- g)
          yield (Seq(s0, s1).filter(_.nonEmpty).mkString("-"), steps :+ st)
      }.map { case (suffix, steps) =>
        DatabasePlan(
          if (suffix.isEmpty) db.name else s"${db.name}-$suffix", steps)
      }
    }
    plan.copy(databases = dbs)
  }

  /** Run the full lifecycle; returns the split-tagged summary per
    * (database, configType, bucket). */
  def run(spark: SparkSession, yaml: String,
      seeds: Seq[Config] = MaterialsPipeline.seeds): DataFrame = {
    import spark.implicits._
    val plan = expandGrids(parsePlan(yaml))
    val calc = StubCalculator(ranSeed = plan.ranSeed)
    val perDb = plan.databases.map { db =>
      var rset = spark.createDataset(seeds)
      db.steps.foreach { s => // J4: step N consumes step N−1's rset
        rset = applyStep(rset, s, plan.species, plan.ranSeed)
      }
      val calculated = rset.map(calc.extract(_))
      calculated.toDF().withColumn("db", lit(db.name))
    }
    val all = perDb.reduce(_ unionByName _)
    val assign = Splits.assign(all, "uuid", "main", plan.trainFrac, plan.ranSeed)
    all.join(assign.select(col("uuid"), col("bucket")), Seq("uuid"))
      .groupBy(col("db"), col("configType"), col("bucket"))
      .agg(count(lit(1)).as("n_configs"),
        round(avg(col("energy")), 6).as("avg_energy"))
      .orderBy(col("db"), col("configType"), col("bucket"))
  }
}
