package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{SpecPipeline, Yaml}

class SpecPipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions",
      "org.apache.spark.sql.graftx.GraftExtensions")
    .getOrCreate()

  private val specYaml =
    """title: AgPd test pipeline   # mirrors tests/AgPd/matdb.yml shape
      |species: [Ag, Pd]
      |ran_seed: 42
      |splits:
      |  train: 0.8
      |databases:
      |  - name: main
      |    steps:
      |      - type: substitution
      |        stoich: {Ag: 0.5, Pd: 0.5}
      |        nconfigs: 6
      |      - type: distortion
      |        nconfigs: 2
      |        volume_factor: 1.0
      |  - name: defects
      |    steps:
      |      - type: substitution
      |        stoich: {Ag: 0.5, Pd: 0.5}
      |        nconfigs: 4
      |      - type: vacancy
      |        vac_per_atom: 0.25
      |        nconfigs: 2
      |""".stripMargin

  test("yaml subset parser handles nesting, lists, inline maps") {
    val root = Yaml.parse(specYaml)
    assert(Yaml.str(root("title")) === "AgPd test pipeline")
    val dbs = root("databases").asInstanceOf[Yaml.YList]
    assert(dbs.items.length === 2)
    val main = dbs.items(0).asInstanceOf[Yaml.YMap]
    assert(Yaml.str(main("name")) === "main")
    val steps = main("steps").asInstanceOf[Yaml.YList]
    assert(steps.items.length === 2)
    val sub = steps.items(0).asInstanceOf[Yaml.YMap]
    assert(Yaml.str(sub("type")) === "substitution")
    val stoich = sub("stoich").asInstanceOf[Yaml.YMap]
    assert(Yaml.num(stoich("Ag")) === 0.5)
    assert(Yaml.num(sub("nconfigs")) === 6.0)
  }

  test("spec lifecycle: parse → staged generators → calc → split (§3.1)") {
    val result = SpecPipeline.run(spark, specYaml)
    val rows = result.collect()
    assert(rows.nonEmpty)
    val dbs = rows.map(_.getString(0)).toSet
    assert(dbs === Set("main", "defects"))
    // step chaining: main ends in distortion, defects in vacancy
    val typesByDb = rows.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getString(1)).toSet).toMap
    assert(typesByDb("main") === Set("dist"))
    assert(typesByDb("defects") === Set("vac"))
    // deterministic replay of the whole lifecycle
    val again = SpecPipeline.run(spark, specYaml).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("starred linspace params fan a database into a grid (K11/K13)") {
    val gridYaml =
      """title: grid test
        |species: [Ag, Pd]
        |ran_seed: 42
        |databases:
        |  - name: hess
        |    steps:
        |      - type: substitution
        |        stoich: {Ag: 0.5, Pd: 0.5}
        |        nconfigs: 2
        |      - type: distortion
        |        nconfigs: 1
        |        rattle*: "linspace(0, 0.2, 3)"
        |""".stripMargin
    val plan = SpecPipeline.expandGrids(SpecPipeline.parsePlan(gridYaml))
    // one database variant per grid point, suffix-named
    assert(plan.databases.map(_.name) ===
      Seq("hess-rat-1", "hess-rat-2", "hess-rat-3"))
    // the starred key is replaced by its scalar in each variant
    val rattles = plan.databases.map(
      _.steps.last.params("rattle")).map(Yaml.num)
    assert(rattles === Seq(0.0, 0.1, 0.2))
    // the lifecycle runs each variant end-to-end
    val rows = SpecPipeline.run(spark, gridYaml).collect()
    assert(rows.map(_.getString(0)).toSet ===
      Set("hess-rat-1", "hess-rat-2", "hess-rat-3"))
  }

  test("yaml :link includes assemble a hierarchical spec (S11)") {
    val dir = Files.createTempDirectory("spec").toString
    val sub = Files.createDirectory(java.nio.file.Paths.get(dir, "dbs"))
    Files.writeString(java.nio.file.Paths.get(dir, "main.yml"),
      """title: linked spec
        |context:
        |  databases: dbs
        |species: [Ag, Pd]
        |ran_seed: 42
        |databases: ":alloy"
        |""".stripMargin)
    Files.writeString(sub.resolve("alloy.yml"),
      """- name: main
        |  steps: ":steps_main"
        |""".stripMargin)
    Files.writeString(sub.resolve("steps_main.yml"),
      """- type: substitution
        |  stoich: {Ag: 0.5, Pd: 0.5}
        |  nconfigs: 4
        |""".stripMargin)
    val plan = SpecPipeline.parsePlanFile(dir, "main")
    assert(plan.title === "linked spec")
    assert(plan.databases.map(_.name) === Seq("main"))
    assert(plan.databases.head.steps.map(_.stepType) === Seq("substitution"))
    // missing link fails loudly with the reference's .yml-only rule
    Files.writeString(java.nio.file.Paths.get(dir, "broken.yml"),
      "databases: \":nope\"\nspecies: [Ag]\n")
    val e = intercept[IllegalArgumentException] {
      SpecPipeline.parsePlanFile(dir, "broken")
    }
    assert(e.getMessage.contains("nope"))
    // mutually-including specs fail with the include chain, not a
    // StackOverflowError
    Files.writeString(java.nio.file.Paths.get(dir, "a.yml"),
      "other: \":b\"\n")
    Files.writeString(java.nio.file.Paths.get(dir, "b.yml"),
      "other: \":a\"\n")
    val cyc = intercept[IllegalArgumentException] {
      graft.pipeline.Yaml.readSpec(dir, "a")
    }
    assert(cyc.getMessage.contains("cyclic"))
    assert(cyc.getMessage.contains("a.yml") && cyc.getMessage.contains("b.yml"))
  }

  test("unknown step type fails loudly") {
    val bad = specYaml.replace("type: vacancy", "type: nonsense")
    assertThrows[IllegalArgumentException] {
      SpecPipeline.run(spark, bad).collect()
    }
  }

  test("M7 text curation: YAML-driven stages, per-stage counts, split partition") {
    val dir = "/root/testdata/sf0.001"
    def runOnce() = graft.pipeline.TextPipeline.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val out = runOnce()
    assert(out.map(_._2).startsWith(Seq("ingest", "normalize", "redact",
      "dedup_exact", "dedup_simhash", "decontaminate", "stratified_sample")))
    assert(out.head._3 === 500) // sf0.001 documents
    val pipelineCounts = out.filterNot(_._2.startsWith("split:")).map(_._3)
    assert(pipelineCounts.forall(_ > 0))
    // counts never increase stage-over-stage
    assert(pipelineCounts.zip(pipelineCounts.tail).forall { case (a, b) => b <= a })
    // decontaminate drops at least the 6 bench docs (0, 97, …, 485)
    val decon = out.find(_._2 == "decontaminate").get._3
    val before = out(out.indexWhere(_._2 == "decontaminate") - 1)._3
    assert(decon <= before - 6)
    // split buckets partition the surviving corpus exactly
    val finalN = pipelineCounts.last
    assert(out.filter(_._2.startsWith("split:")).map(_._3).sum === finalN)
    // pinned seed ⇒ bit-identical audit table on re-run
    assert(runOnce() === out)
  }

  test("M7 curation: optional quality_filter and dedup_window stages match their kernels") {
    val dir = "/root/testdata/sf0.001"
    val yaml =
      """title: gated curation
        |ran_seed: 42
        |splits:
        |  train: 0.8
        |curation:
        |  - type: quality_filter
        |  - type: dedup_window
        |    window: 20
        |""".stripMargin
    val out = graft.pipeline.TextPipeline.run(spark, dir, yaml).collect()
      .map(r => (r.getString(1), r.getLong(2))).toMap
    val docs = Tables(spark, dir, "documents")
    val passN = graft.queries.TextOps.gopherRulesOf(docs)
      .where(col("pass")).count()
    assert(out("quality_filter") === passN)
    // window dedup runs on the FILTERED survivors, so recompute on them
    val survivors = docs.join(
      graft.queries.TextOps.gopherRulesOf(docs)
        .where(col("pass")).select(col("doc_id")), Seq("doc_id"))
    val dedupN = graft.queries.DedupOps.windowDedupOf(survivors, 20)
      .where(!col("is_dup")).count()
    assert(out("dedup_window") === dedupN)
    assert(dedupN > 0 && dedupN < out("ingest"))
  }

  test("M7 curation spec: unknown stage fails loudly") {
    val bad = graft.pipeline.TextPipeline.defaultYaml
      .replace("type: normalize", "type: frobnicate")
    assertThrows[IllegalArgumentException] {
      graft.pipeline.TextPipeline.run(spark, "/root/testdata/sf0.001", bad).collect()
    }
  }
}
