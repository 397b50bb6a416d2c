package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Versioned

/** Round 14 (VERDICT r13 #3): RENAME COLUMN / DROP COLUMN via column
  * mapping — Delta's column-mapping discipline (reference analog:
  * `_conform_atoms`'s rename projection,
  * database/__init__.py:1107–1157). Logical names move in METADATA-
  * ONLY commits; data files keep their stable PHYSICAL names, so zero
  * files rewrite, time travel reads each version under its own names,
  * and a dropped column's bytes can never resurrect into a later
  * same-named column. */
class VersionedRenameSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions",
      "org.apache.spark.sql.graftx.GraftExtensions")
    .getOrCreate()

  private def tmp(): String =
    Files.createTempDirectory("graftv-rename-").toString

  test("rename is metadata-only: zero files rewritten, values intact, " +
    "time travel reads the old name") {
    import spark.implicits._
    val t = tmp()
    Versioned.commit(Seq((1L, 10L, "a"), (2L, 20L, "b"))
      .toDF("id", "v", "note"), t) // v1
    val filesBefore = Versioned.snapshot(t).files.toSet
    Versioned.renameColumn(t, "v", "score") // v2 metadata-only
    val snap = Versioned.snapshot(t)
    assert(snap.files.toSet === filesBefore, "rename rewrote files")
    val out = Versioned.read(spark, t)
    assert(out.schema.fieldNames.toSeq === Seq("id", "score", "note"))
    assert(out.orderBy("id").as[(Long, Long, String)].collect().toSeq ===
      Seq((1L, 10L, "a"), (2L, 20L, "b")))
    // time travel: v1 under its own name
    val v1 = Versioned.read(spark, t, Some(1))
    assert(v1.schema.fieldNames.toSeq === Seq("id", "v", "note"))
    assert(v1.where(col("id") === 1).select("v").as[Long].head() === 10L)
  }

  test("appends, merge, filters, and CDF all work across a rename") {
    import spark.implicits._
    val t = tmp()
    Versioned.commit(Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), t) // v1
    Versioned.renameColumn(t, "v", "score") // v2
    // append with the NEW logical name (file stores the old physical)
    Versioned.commit(Seq((3L, 30L)).toDF("id", "score"), t) // v3
    // merge across old and new files, keyed + filtered on logical names
    Versioned.merge(Seq((2L, 99L), (4L, 40L)).toDF("id", "score"),
      t, Seq("id")) // v4
    val out = Versioned.read(spark, t)
    assert(out.orderBy("id").as[(Long, Long)].collect().toSeq ===
      Seq((1L, 10L), (2L, 99L), (3L, 30L), (4L, 40L)))
    // DSv2 read with a pushed filter on the renamed column
    val dsv2 = spark.read.format("graftv").load(t)
      .where(col("score") >= 30)
    assert(dsv2.orderBy("id").as[(Long, Long)].collect().toSeq ===
      Seq((2L, 99L), (3L, 30L), (4L, 40L)))
    // CDF across the rename range reads under the head logical names
    val chg = Versioned.readChanges(spark, t, 2, 4)
    assert(chg.schema.fieldNames.contains("score"))
    assert(chg.where(col("_change_type") === "update_postimage")
      .select("score").as[Long].head() === 99L)
    // deleteWhere on the logical name (stats pruning via physOf)
    Versioned.deleteWhere(spark, t, col("score") === 40L) // v5
    assert(Versioned.read(spark, t).count() === 3)
  }

  test("drop is metadata-only; re-adding the SAME name null-fills " +
    "instead of resurrecting the dropped bytes") {
    import spark.implicits._
    val t = tmp()
    Versioned.commit(Seq((1L, 111L, "a"), (2L, 222L, "b"))
      .toDF("id", "secret", "note"), t) // v1
    val filesBefore = Versioned.snapshot(t).files.toSet
    Versioned.dropColumn(t, "secret") // v2 metadata-only
    assert(Versioned.snapshot(t).files.toSet === filesBefore)
    val out = Versioned.read(spark, t)
    assert(out.schema.fieldNames.toSeq === Seq("id", "note"))
    // time travel still sees the dropped column
    assert(Versioned.read(spark, t, Some(1))
      .schema.fieldNames.contains("secret"))
    // RE-ADD a column of the same logical name: fresh physical, so
    // the old files' 111/222 bytes must NOT come back
    Versioned.addColumns(t, "`secret` BIGINT") // v3
    val re = Versioned.read(spark, t)
    assert(re.schema.fieldNames.toSeq === Seq("id", "note", "secret"))
    assert(re.select("secret").collect().forall(_.isNullAt(0)),
      "dropped bytes resurrected into the re-added column")
    // new values land under the fresh physical name and read back
    Versioned.commit(Seq((3L, "c", 333L)).toDF("id", "note", "secret"), t)
    assert(Versioned.read(spark, t).where(col("id") === 3)
      .select("secret").as[Long].head() === 333L)
    // the DATA-path evolution door cannot smuggle the name back in
    val t2 = tmp()
    Versioned.commit(Seq((1L, 5L, "x")).toDF("id", "gone", "note"), t2)
    Versioned.dropColumn(t2, "gone")
    val e = intercept[IllegalArgumentException] {
      Versioned.commit(Seq((2L, "y", 7L)).toDF("id", "note", "gone"),
        t2, mergeSchema = true)
    }
    assert(e.getMessage.contains("retired"))
  }

  test("rename/drop guard rails: partition columns, constraints, " +
    "unknown and duplicate names are loud") {
    import spark.implicits._
    val t = tmp()
    Versioned.commit(Seq((1L, 10L, "p0"), (2L, 20L, "p1"))
      .toDF("id", "v", "pb"), t, partitionBy = Seq("pb"))
    intercept[IllegalArgumentException] {
      Versioned.renameColumn(t, "pb", "bucket") // partition column
    }
    intercept[IllegalArgumentException] {
      Versioned.dropColumn(t, "pb")
    }
    intercept[IllegalArgumentException] {
      Versioned.renameColumn(t, "nope", "x") // unknown
    }
    intercept[IllegalArgumentException] {
      Versioned.renameColumn(t, "v", "id") // duplicate target
    }
    Versioned.addConstraint(spark, t, "vpos", "v >= 0")
    val e = intercept[IllegalArgumentException] {
      Versioned.renameColumn(t, "v", "score")
    }
    assert(e.getMessage.contains("vpos"))
    intercept[IllegalArgumentException] { Versioned.dropColumn(t, "v") }
    // dropping the constraint unblocks both
    Versioned.dropConstraint(t, "vpos")
    Versioned.renameColumn(t, "v", "score")
    assert(Versioned.read(spark, t).schema.fieldNames
      .contains("score"))
  }

  test("SQL faces: RENAME COLUMN and DROP COLUMN over a catalog table") {
    import spark.implicits._
    val t = tmp()
    spark.sql("DROP TABLE IF EXISTS g_rename_tbl")
    try {
      Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("id", "v", "note")
        .write.format("graftv").mode("append").save(t)
      spark.sql("CREATE TABLE g_rename_tbl (id BIGINT, v BIGINT, " +
        s"note STRING) USING graftv LOCATION '$t'")
      spark.sql("ALTER TABLE g_rename_tbl RENAME COLUMN v TO score")
      assert(Versioned.read(spark, t).schema.fieldNames.toSeq ===
        Seq("id", "score", "note"))
      // INSERT with the new name through the DSv2 write path
      spark.sql("INSERT INTO g_rename_tbl VALUES (3, 30, 'c')")
      assert(Versioned.read(spark, t).where(col("id") === 3)
        .select("score").as[Long].head() === 30L)
      spark.sql("ALTER TABLE g_rename_tbl DROP COLUMN note")
      assert(Versioned.read(spark, t).schema.fieldNames.toSeq ===
        Seq("id", "score"))
      // IF EXISTS tolerates unknown, plain DROP is loud
      spark.sql("ALTER TABLE g_rename_tbl DROP COLUMN IF EXISTS ghost")
      intercept[Exception] {
        spark.sql("ALTER TABLE g_rename_tbl DROP COLUMN ghost")
      }
      // UPDATE/DELETE through SQL on the renamed column
      spark.sql(s"UPDATE graftv.`$t` SET score = score + 1 WHERE id = 1")
      assert(Versioned.read(spark, t).where(col("id") === 1)
        .select("score").as[Long].head() === 11L)
    } finally spark.sql("DROP TABLE IF EXISTS g_rename_tbl")
  }
}
