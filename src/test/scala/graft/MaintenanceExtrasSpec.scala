package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Versioned

/** Round-13 maintenance-surface extras (Delta statement parity):
  * `VACUUM … DRY RUN` (report, touch nothing) and
  * `RESTORE … TO TIMESTAMP AS OF` (the read-side monotone-stamp
  * lookup, session-zone literals, driving a rollback).
  */
class MaintenanceExtrasSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions",
      "org.apache.spark.sql.graftx.GraftExtensions")
    .getOrCreate()

  test("VACUUM DRY RUN reports the reclaim set without deleting") {
    import spark.implicits._
    val t = Files.createTempDirectory("graft-dryrun-").toString
    Versioned.commit(Seq((1L, "a")).toDF("id", "s"), t) // v1
    Versioned.commit(Seq((9L, "z")).toDF("id", "s"), t, "overwrite") // v2
    // library dry run with the grace waived: v1's files are
    // unreferenced from the retained horizon — reported, NOT deleted
    val would = Versioned.vacuum(t, retainVersions = 1, graceMs = 0L,
      dryRun = true)
    assert(would.nonEmpty)
    would.foreach(f => assert(
      Files.exists(java.nio.file.Paths.get(t, f)), f))
    // the real pass then reclaims exactly that set
    val did = Versioned.vacuum(t, retainVersions = 1, graceMs = 0L)
    assert(did === would)
    did.foreach(f => assert(
      !Files.exists(java.nio.file.Paths.get(t, f)), f))

    // SQL form (default grace spares young files → 0, dry_run=true)
    val row = spark.sql(s"VACUUM graftv.`$t` RETAIN 1 VERSIONS DRY RUN")
      .head()
    assert(row.getInt(0) >= 0)
    assert(row.getBoolean(1))
  }

  test("RESTORE TO TIMESTAMP AS OF rolls back through the monotone " +
    "stamp lookup") {
    import spark.implicits._
    val t = Files.createTempDirectory("graft-restts-").toString
    Versioned.commit(Seq((1L, "a")).toDF("id", "s"), t) // v1
    Thread.sleep(30) // real stamp gap (time-travel spec discipline)
    val midMs = System.currentTimeMillis()
    Thread.sleep(30)
    Versioned.commit(Seq((2L, "b")).toDF("id", "s"), t) // v2
    assert(Versioned.read(spark, t).count() === 2L)
    // an instant between the commits resolves to v1; RESTORE is
    // non-destructive (v3 = v1's live set)
    val iso = java.time.Instant.ofEpochMilli(midMs).toString
    val v = spark.sql(s"RESTORE graftv.`$t` TO TIMESTAMP AS OF '$iso'")
      .head().getInt(0)
    assert(v === 3)
    assert(Versioned.read(spark, t).count() === 1L)
    assert(Versioned.versions(t) === Seq(1, 2, 3))
    // an instant before the first commit is a loud error
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"RESTORE graftv.`$t` TO TIMESTAMP AS OF '1999-01-01'")
    }
    assert(e.getMessage.contains("predates"))
  }
}
