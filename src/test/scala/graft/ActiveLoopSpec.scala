package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.calculators.StubCalculator
import graft.pipeline.{ActiveLoop, MaterialsPipeline}

class ActiveLoopSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions",
      "org.apache.spark.sql.graftx.GraftExtensions")
    .getOrCreate()

  test("active loop grows the set, dedups, and resumes from state") {
    val path = Files.createTempDirectory("active").toString + "/active_set"
    val loop = new ActiveLoop(spark, StubCalculator(), path)
    loop.bootstrap(MaterialsPipeline.seeds)
    assert(loop.currentIteration === 0)
    val n0 = loop.current.count()
    assert(n0 === 2)

    val added1 = loop.step(nCandidatesPerConfig = 3, selectK = 4)
    assert(added1 > 0)
    assert(loop.currentIteration === 1)

    val added2 = loop.step(nCandidatesPerConfig = 3, selectK = 4)
    assert(added2 > 0)
    assert(loop.currentIteration === 2)

    val all = loop.current
    assert(all.count() === n0 + added1 + added2)
    // content-hash dedup: no uuid appears twice across iterations
    assert(all.select("uuid").distinct().count() === all.count())
    // iteration column tracks membership (active.py `iter_N`)
    assert(all.select("iteration").distinct().count() === 3)

    // resume: a NEW loop over the same path continues, not restarts
    val resumed = new ActiveLoop(spark, StubCalculator(), path)
    assert(resumed.currentIteration === 2)
    // bootstrap is a no-op on existing state
    resumed.bootstrap(MaterialsPipeline.seeds)
    assert(resumed.current.count() === all.count())
  }
}
