package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType, IntegerType, LongType}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Versioned

/** Round 14 (VERDICT r13 #6): TYPE WIDENING on schema evolution —
  * int→long and float→double along the safe lattice
  * (byte<short<int<long, float<double; Delta's type-widening
  * discipline, the reference's coerce-to-int64/float64 persist
  * posture, atoms.py:37–65). Old files keep their narrower PHYSICAL
  * type and promote at scan time; narrowing is a loud error; time
  * travel reads each version under its own DDL. */
class VersionedWidenSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions",
      "org.apache.spark.sql.graftx.GraftExtensions")
    .getOrCreate()

  private def tmp(): String =
    Files.createTempDirectory("graftv-widen-").toString

  test("mergeSchema append with a WIDER column type widens the table; " +
    "old int32 files read back as BIGINT") {
    import spark.implicits._
    val t = tmp()
    // v1: `v` is INT (physical int32 in the file)
    Versioned.commit(Seq((1L, 10), (2L, 20)).toDF("id", "v"), t)
    assert(Versioned.read(spark, t).schema("v").dataType == IntegerType)
    // v2: source carries `v` as BIGINT — widens under mergeSchema
    Versioned.commit(Seq((3L, 3000000000L)).toDF("id", "v"), t,
      mergeSchema = true)
    val out = Versioned.read(spark, t)
    assert(out.schema("v").dataType == LongType)
    assert(out.orderBy("id").as[(Long, Long)].collect().toSeq ==
      Seq((1L, 10L), (2L, 20L), (3L, 3000000000L)))
    // time travel: v1 still reads under its own (narrow) DDL
    assert(Versioned.read(spark, t, Some(1))
      .schema("v").dataType == IntegerType)
    // a NARROWER source appends fine (store-widened into the table
    // type at read; the merged DDL keeps BIGINT)
    Versioned.commit(Seq((4L, 40)).toDF("id", "v"), t,
      mergeSchema = true)
    val out2 = Versioned.read(spark, t)
    assert(out2.schema("v").dataType == LongType)
    assert(out2.count() == 4)
    // a non-widening type change stays a loud error
    val e = intercept[IllegalArgumentException] {
      Versioned.commit(Seq((5L, "x")).toDF("id", "v"), t,
        mergeSchema = true)
    }
    assert(e.getMessage.contains("widen"))
  }

  test("merge WITH SCHEMA EVOLUTION widens float -> double") {
    import spark.implicits._
    val t = tmp()
    Versioned.commit(Seq((1L, 1.5f), (2L, 2.5f)).toDF("id", "score"), t)
    assert(Versioned.read(spark, t).schema("score").dataType == FloatType)
    Versioned.mergeClauses(
      Seq((2L, 9.25), (3L, 3.5)).toDF("id", "score"), t, Seq("id"),
      matched = Seq(Versioned.WhenMatched.Update(None)),
      notMatched = Seq(Versioned.WhenNotMatched.Insert(None)),
      mergeSchema = true)
    val out = Versioned.read(spark, t)
    assert(out.schema("score").dataType == DoubleType)
    assert(out.orderBy("id").as[(Long, Double)].collect().toSeq ==
      Seq((1L, 1.5), (2L, 9.25), (3L, 3.5)))
  }

  test("SQL ALTER TABLE ALTER COLUMN TYPE widens; narrowing is loud") {
    import spark.implicits._
    val t = tmp()
    spark.sql("DROP TABLE IF EXISTS g_widen_tbl")
    try {
      Seq((1L, 7, 0.5f), (2L, 8, 1.5f)).toDF("id", "n", "x")
        .write.format("graftv").mode("append").save(t)
      spark.sql(s"CREATE TABLE g_widen_tbl (id BIGINT, n INT, x FLOAT) " +
        s"USING graftv LOCATION '$t'")
      spark.sql("ALTER TABLE g_widen_tbl ALTER COLUMN n TYPE BIGINT")
      spark.sql("ALTER TABLE g_widen_tbl ALTER COLUMN x TYPE DOUBLE")
      val out = Versioned.read(spark, t)
      assert(out.schema("n").dataType == LongType)
      assert(out.schema("x").dataType == DoubleType)
      assert(out.orderBy("id").as[(Long, Long, Double)].collect().toSeq ==
        Seq((1L, 7L, 0.5), (2L, 8L, 1.5)))
      // post-widening appends store the wide type; pre-widening files
      // still promote — mixed-physical table reads uniformly
      spark.sql("INSERT INTO g_widen_tbl VALUES (3, 4000000000, 2.5)")
      assert(Versioned.read(spark, t).where(col("id") === 3)
        .select("n").as[Long].head() == 4000000000L)
      // narrowing is a loud error naming the lattice
      val e = intercept[Exception] {
        spark.sql("ALTER TABLE g_widen_tbl ALTER COLUMN n TYPE INT")
      }
      assert(e.getMessage.contains("widen"))
      // non-TYPE alter-column changes are loud for graftv targets
      val e2 = intercept[Exception] {
        spark.sql(
          "ALTER TABLE g_widen_tbl ALTER COLUMN n COMMENT 'nope'")
      }
      assert(e2.getMessage.contains("TYPE"))
      // time travel: version 1 still reads n as INT
      assert(spark.sql(
        "SELECT n FROM g_widen_tbl VERSION AS OF 1")
        .schema("n").dataType == IntegerType)
    } finally spark.sql("DROP TABLE IF EXISTS g_widen_tbl")
  }

  test("widened tables flow through CDF, constraints, and merge") {
    import spark.implicits._
    val t = tmp()
    Versioned.commit(Seq((1L, 10), (2L, 20)).toDF("id", "v"), t) // v1 int
    Versioned.alterColumnType(t, "v", "BIGINT") // v2 metadata
    Versioned.addConstraint(spark, t, "vcap", "v < 6000000000") // v3
    // merge over the widened column: old int32 file rewrites under
    // the BIGINT read schema, constraint enforces on the fresh files
    Versioned.merge(Seq((2L, 5000000000L), (9L, 90L)).toDF("id", "v"),
      t, Seq("id")) // v4
    assert(Versioned.read(spark, t).orderBy("id")
      .as[(Long, Long)].collect().toSeq ==
      Seq((1L, 10L), (2L, 5000000000L), (9L, 90L)))
    // CDF across the widening: the example reader promotes the old
    // file's int32 values under the widened required DDL
    val chg = Versioned.readChanges(spark, t, 3, 4)
    assert(chg.schema("v").dataType == LongType)
    assert(chg.where(col("_change_type") === "update_postimage")
      .select("v").as[Long].head() == 5000000000L)
    // constraint still enforced post-widening
    val e = intercept[IllegalArgumentException] {
      Versioned.commit(Seq((10L, 7000000000L)).toDF("id", "v"), t)
    }
    assert(e.getMessage.contains("vcap"))
  }
}
