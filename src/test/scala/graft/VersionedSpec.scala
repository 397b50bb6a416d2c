package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Versioned

class VersionedSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpTable(): String =
    Files.createTempDirectory("versioned-spec-").toString

  test("append/append/overwrite/restore: every version reads back") {
    import spark.implicits._
    val t = tmpTable()
    val v1 = Versioned.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), t)
    val v2 = Versioned.commit(Seq((3L, "c")).toDF("id", "s"), t)
    val v3 = Versioned.commit(Seq((9L, "z")).toDF("id", "s"), t, "overwrite")
    val v4 = Versioned.restore(t, v2)
    assert(Seq(v1, v2, v3, v4) === Seq(1, 2, 3, 4))
    def ids(v: Int) = Versioned.read(spark, t, Some(v))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(1) === Seq(1L, 2L))
    assert(ids(2) === Seq(1L, 2L, 3L))
    assert(ids(3) === Seq(9L))
    assert(ids(4) === Seq(1L, 2L, 3L)) // restore == v2's live set
    // latest (no asOf) is the restore
    assert(Versioned.read(spark, t).count() === 3L)
  }

  test("append with a different schema fails loudly; overwrite may evolve") {
    import spark.implicits._
    val t = tmpTable()
    Versioned.commit(Seq((1L, "a")).toDF("id", "s"), t)
    val e = intercept[IllegalArgumentException] {
      Versioned.commit(Seq((2L, 0.5)).toDF("id", "x"), t)
    }
    assert(e.getMessage.contains("schema mismatch"))
    Versioned.commit(Seq((2L, 0.5)).toDF("id", "x"), t, "overwrite")
    assert(Versioned.read(spark, t).columns.toSeq === Seq("id", "x"))
  }

  test("snapshot replay is bounded by the checkpoint interval") {
    import spark.implicits._
    val t = tmpTable()
    (1 to 25).foreach(i => Versioned.commit(Seq((i.toLong, s"r$i"))
      .toDF("id", "s"), t))
    val s25 = Versioned.snapshot(t)
    assert(s25.version === 25)
    assert(s25.baseVersion === 20) // v20 self-checkpointed
    assert(s25.replayedManifests <= Versioned.CheckpointInterval)
    assert(Versioned.read(spark, t).count() === 25L)
    // time travel across the checkpoint boundary still exact
    assert(Versioned.read(spark, t, Some(13)).count() === 13L)
  }

  test("concurrent commits all land with distinct versions (optimistic retry)") {
    import spark.implicits._
    val t = tmpTable()
    Versioned.commit(Seq((0L, "seed")).toDF("id", "s"), t)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val vs = Await.result(Future.sequence((1 to 8).map(i => Future {
      Versioned.commit(Seq((i.toLong, s"w$i")).toDF("id", "s"), t)
    })), 120.seconds)
    assert(vs.sorted === (2 to 9)) // 8 distinct versions, no losses
    assert(Versioned.read(spark, t).count() === 9L) // all appends merged
  }

  test("readers never see a torn manifest: publish is link-after-write") {
    import spark.implicits._
    val t = tmpTable()
    Versioned.commit(Seq((1L, "a")).toDF("id", "s"), t)
    // only the published manifest is in _log (no .tmp residue)
    val names = {
      val s = Files.list(Paths.get(t, "_log"))
      try { import scala.jdk.CollectionConverters._
        s.iterator.asScala.map(_.getFileName.toString).toVector }
      finally s.close()
    }
    assert(names === Vector("v000001.json"))
  }

  test("vacuum drops files unreachable from the retained horizon") {
    import spark.implicits._
    val t = tmpTable()
    Versioned.commit(Seq((1L, "a")).toDF("id", "s"), t) // v1
    Versioned.commit(Seq((9L, "z")).toDF("id", "s"), t, "overwrite") // v2
    val dead = Versioned.vacuum(t, retainVersions = 1)
    assert(dead.exists(_.endsWith(".parquet"))) // v1's data is gone
    assert(Versioned.read(spark, t).collect().map(_.getLong(0)).toSeq
      === Seq(9L)) // latest unharmed
    // v1's manifest survives as audit trail, but its scan now fails
    assert(Versioned.versions(t) === Seq(1, 2))
    intercept[Exception] {
      Versioned.read(spark, t, Some(1)).collect()
    }
  }

  test("v1_time_travel query matches its relational twin") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val got = Versioned.timeTravel(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = Tables(spark, dir, "documents")
    def expect(pred: org.apache.spark.sql.Column) = {
      val r = docs.where(pred)
        .agg(count(lit(1)), sum(col("doc_id")), sum(col("n_chars"))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val e1 = expect(col("doc_id") % 3 === 0)
    val e2 = expect(col("doc_id") % 3 <= 1)
    val e3 = expect(col("doc_id") % 2 === 0)
    assert(got.toSeq === Seq(
      (1, e1._1, e1._2, e1._3), (2, e2._1, e2._2, e2._3),
      (3, e3._1, e3._2, e3._3), (4, e2._1, e2._2, e2._3)))
  }
}
