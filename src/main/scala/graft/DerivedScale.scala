package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.DerivedState
import graft.sources.Versioned

/** CDF-maintained derived state at scale (round 15, VERDICT r14 #5):
  * measures [[DerivedState.maintainMinhashBandState]] against a
  * MakeScale'd graftv documents table — the initial drain builds the
  * whole state ONCE; each later drain (small appends, a point
  * delete) must cost ∝ its batch, flat across increments, never
  * O(corpus). This replaces the r14 story (state built offline by a
  * bench tool, rebuilt on schema drift) with a maintained table: an
  * ingest pipeline appends documents and the dedup index follows the
  * change feed.
  *
  * Usage: runMain graft.DerivedScale <scaledSfDir> <srcTable>
  * <stateTable> <out.json> <label>
  */
object DerivedScale {
  private def r3(x: Double): Double = math.rint(x * 1000) / 1000

  def main(args: Array[String]): Unit = {
    val Array(srcDir, srcTbl, stateTbl, outJson, label) = args.take(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "24")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions",
        "org.apache.spark.sql.graftx.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def drain(): Double =
      timed(DerivedState.maintainMinhashBandState(spark, srcTbl,
        stateTbl))._2

    val docs = Tables(spark, srcDir, "documents")
      .select(col("doc_id"), col("text"))
    val nDocs = docs.count()
    // bulk ingest: ~99.9 % of the corpus in one commit
    val holdout = pmod(col("doc_id"), lit(1000))
    Versioned.commit(docs.where(holdout > 2), srcTbl, "append") // v1
    val buildSec = drain()
    val stateRows0 = Versioned.read(spark, stateTbl).count()
    System.err.println(f"[derived-scale] $label: $nDocs docs, initial " +
      f"build $buildSec%.1fs ($stateRows0 state rows)")

    // three ~0.1 % increments: per-drain cost must stay flat
    val incr = (0 to 2).map { i =>
      Versioned.commit(docs.where(holdout === i), srcTbl, "append")
      val s = drain()
      System.err.println(f"[derived-scale] $label incr$i: $s%.1fs")
      s
    }
    // a point delete propagates: state rows leave, cost ∝ batch
    Versioned.deleteWhere(spark, srcTbl,
      pmod(col("doc_id"), lit(5000)) === 7)
    val delSec = drain()
    val gone = Versioned.read(spark, stateTbl)
      .where(pmod(col("h_id"), lit(5000)) === 7).count()
    require(gone == 0L, s"delete drain left $gone stale state rows")
    // idempotence: an immediate re-drain is a no-op
    val (noop, noopSec) = timed(DerivedState
      .maintainMinhashBandState(spark, srcTbl, stateTbl))
    require(noop.isEmpty, "re-drain was not a no-op")

    val json =
      s"""{"label":"$label","n_docs":$nDocs,""" +
      s""""initial_build_sec":${r3(buildSec)},""" +
      s""""state_rows":$stateRows0,""" +
      s""""increment_sec":[${incr.map(r3).mkString(",")}],""" +
      s""""delete_drain_sec":${r3(delSec)},""" +
      s""""noop_drain_sec":${r3(noopSec)}}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outJson), json)
    System.err.println(s"[derived-scale] $json")
    spark.stop()
  }
}
