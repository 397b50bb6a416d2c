package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stats-driven small-file compaction + byte-bounded streaming
  * admission (round 16) — both consumers of the log's per-file size
  * pseudo-stats:
  *
  *  - `Versioned.compact` / `OPTIMIZE t COMPACT [TARGET n MB]`:
  *    binpack ONLY the files under target/2 (plus DV'd ones, whose
  *    masks drop) into ~target-byte outputs; right-sized files carry
  *    by reference — cost ∝ small-file bytes, the steady-state
  *    maintenance of a streamed-into table;
  *  - `option("maxBytesPerTrigger", n)`: admit versions per
  *    micro-batch until their added bytes exceed the cap (≥1 version
  *    always), sizes read from the log with zero data I/O.
  */
class VersionedCompactSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions",
      "org.apache.spark.sql.graftx.GraftExtensions")
    .getOrCreate()

  private def tmp(): String =
    Files.createTempDirectory("r16-compact-").toString

  private def sizeOf(t: String, f: String): Long =
    java.nio.file.Files.size(java.nio.file.Paths.get(t, f))

  test("compact binpacks only small files; right-sized files carry " +
      "by reference; packed result is a no-op next time") {
    import spark.implicits._
    val t = tmp()
    (0 until 6).foreach { i =>
      Versioned.commit(Seq((i.toLong, s"v$i")).toDF("id", "v")
        .repartition(1), t)
    }
    Versioned.commit((100L until 5100L).map(i => (i, s"big$i"))
      .toDF("id", "v").repartition(1), t)
    val before = Versioned.snapshot(t)
    assert(before.files.size === 7)
    val bigFile = before.files.maxBy(sizeOf(t, _))
    val target = sizeOf(t, bigFile) // smalls ≪ target/2, big ≥
    val v = Versioned.compact(spark, t, targetBytes = target)
    val after = Versioned.snapshot(t)
    assert(after.version === v)
    assert(after.files.contains(bigFile), "the big file must carry")
    assert(after.files.size === 2,
      s"6 smalls pack into 1: ${after.files}")
    val got = Versioned.read(spark, t).select(col("id")).collect()
      .map(_.getLong(0)).sorted
    assert(got.length === 5006 && got.take(6).toSeq ===
      (0L until 6L).toSeq)
    // the packed file is itself below target/2 now, but a LONE small
    // clean file has nothing to merge with → no-op, no phantom commit
    assert(Versioned.compact(spark, t, targetBytes = target) === v)
  }

  test("compact folds DV-carrying files in and drops their masks") {
    import spark.implicits._
    val t = tmp()
    (0 until 4).foreach { i =>
      Versioned.commit((i * 10 until i * 10 + 10)
        .map(j => (j.toLong, s"v$j")).toDF("id", "v").repartition(1), t)
    }
    spark.conf.set("spark.graft.dv.enabled", "true")
    try Versioned.deleteWhere(spark, t, col("id") === 5L)
    finally spark.conf.unset("spark.graft.dv.enabled")
    assert(Versioned.snapshot(t).dvs.nonEmpty)
    Versioned.compact(spark, t, targetBytes = 1L << 20)
    val after = Versioned.snapshot(t)
    assert(after.dvs.isEmpty, "packing a masked file purges its DV")
    assert(after.files.size === 1)
    val ids = Versioned.read(spark, t).select(col("id")).collect()
      .map(_.getLong(0)).sorted
    assert(ids.length === 39 && !ids.contains(5L))
  }

  test("OPTIMIZE t COMPACT [TARGET n MB] parses and routes") {
    import spark.implicits._
    val t = tmp()
    (0 until 5).foreach { i =>
      Versioned.commit(Seq((i.toLong, s"v$i")).toDF("id", "v")
        .repartition(1), t)
    }
    spark.sql("DROP TABLE IF EXISTS r16_compact_tbl")
    spark.sql(s"CREATE TABLE r16_compact_tbl USING graftv LOCATION '$t'")
    try {
      val v = spark.sql("OPTIMIZE r16_compact_tbl COMPACT TARGET 1 MB")
        .head().getInt(0)
      assert(v === 6)
      assert(Versioned.snapshot(t).files.size === 1)
      assert(spark.sql("SELECT count(*) AS n FROM r16_compact_tbl")
        .head().getLong(0) === 5L)
    } finally spark.sql("DROP TABLE IF EXISTS r16_compact_tbl")
  }

  test("maxBytesPerTrigger drains a backlog in byte-bounded version " +
      "batches") {
    import spark.implicits._
    val t = tmp()
    val ckpt = tmp() + "/ck"
    (0 until 6).foreach { i =>
      Versioned.commit(Seq((i.toLong, s"v$i")).toDF("id", "v")
        .repartition(1), t)
    }
    val sizes = Versioned.snapshot(t).files.map(sizeOf(t, _))
    val cap = sizes.sorted.take(2).sum + 1 // ~2 files per batch
    val batches =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val q = spark.readStream.format("graftv")
      .option("maxBytesPerTrigger", cap.toString)
      .load(t)
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (mb: DataFrame, batchId: Long) =>
        batches.add((batchId, mb.count())); ()
      }.start()
    assert(q.awaitTermination(120000), "AvailableNow did not stop")
    val drained = batches.toArray(Array.empty[(Long, Long)])
    assert(drained.map(_._2).sum === 6L, s"all rows drain: $drained")
    assert(drained.count(_._2 > 0) >= 3,
      s"a ~2-file cap over 6 one-file versions needs ≥3 data " +
        s"batches, got $drained")
    assert(drained.forall(_._2 <= 3L),
      s"no batch may blow far past the cap: $drained")
  }
}
