package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Versioned

/** DIFFERENTIAL read-path fuzz (round 16, VERDICT r15 #2): the
  * library reader (`Versioned.read`/`readChanges`) and the DSv2
  * connector (`spark.read.format("graftv")`) are two implementations
  * of one contract, and three of round 15's four ADVICE bugs were
  * divergence between them (overwrite-after-rename, change-feed
  * colMap as-of). This fuzz runs a seeded 40-op lifecycle/DML history
  * over a NESTED + ARRAY schema — appends, DV and COW deletes, DV
  * updates with nested predicates, merges, nested/parent/top-level
  * renames, OPTIMIZE, restore — and after EVERY op asserts the two
  * doors agree (schema and row multiset); at the end it sweeps every
  * historical version and every per-version change-feed range through
  * both doors. No reference model: the invariant IS the agreement. */
class VersionedDifferentialSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions",
      "org.apache.spark.sql.graftx.GraftExtensions")
    .getOrCreate()

  private def canonJson(df: DataFrame): Vector[String] =
    df.select(to_json(struct(df.columns.map(col).toIndexedSeq: _*)))
      .collect().map(_.getString(0)).toVector.sorted

  private def assertAgree(lib: DataFrame, ds: DataFrame,
      ctx: String): Unit = {
    assert(lib.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      ds.schema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"$ctx: schemas diverged")
    assert(canonJson(lib) === canonJson(ds), s"$ctx: rows diverged")
  }

  test("library and DSv2 readers agree after every op of a seeded " +
    "nested/array DV lifecycle, across history and the change feed") {
    val rnd = new scala.util.Random(20261602L)
    val t = Files.createTempDirectory("versioned-diff-").toString
    var nextId = 0L

    // current LOGICAL schema, re-derived after every op (restore
    // rolls names back; mapping renames but never reorders)
    def schemaNow(): StructType =
      StructType.fromDDL(Versioned.snapshot(t).schemaDdl)
    def names(): (String, String, String, String) = {
      val st = schemaNow()
      val meta = st.fields.find(_.dataType.isInstanceOf[StructType]).get
      val tags = st.fields.find(_.dataType.isInstanceOf[ArrayType]).get
      val v = st.fields.find(f => f.dataType == LongType &&
        f.name != "id").get
      val src = meta.dataType.asInstanceOf[StructType]
        .fields.find(_.dataType == StringType).get
      (meta.name, src.name, tags.name, v.name)
    }
    def freshDf(n: Int): DataFrame = {
      val st = schemaNow()
      val rows = (0 until n).map { _ =>
        nextId += 1
        Row(nextId,
          Row(s"s${nextId % 4}", nextId % 7),
          Seq(nextId, nextId * 2),
          rnd.nextInt(1000).toLong)
      }
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1 + rnd.nextInt(2)), st)
    }
    def withMode[A](dv: Boolean)(f: => A): A = {
      spark.conf.set("spark.graft.dv.enabled", dv.toString)
      try f finally spark.conf.unset("spark.graft.dv.enabled")
    }

    // v1: seed under the ORIGINAL names
    Versioned.commit(
      spark.createDataFrame(
        spark.sparkContext.parallelize((1 to 8).map { i =>
          nextId += 1
          Row(nextId, Row(s"s${i % 4}", i.toLong % 7),
            Seq(nextId, nextId * 2), (i * 10).toLong)
        }, 2),
        StructType.fromDDL("id BIGINT, meta STRUCT<src: STRING, " +
          "w: BIGINT>, tags ARRAY<BIGINT>, v BIGINT")), t)

    var renames, dvOps, restores = 0
    var nameSeq = 0
    def freshName(pfx: String): String = { nameSeq += 1; s"$pfx$nameSeq" }

    (0 until 40).foreach { i =>
      val (meta, src, _, v) = names()
      rnd.nextInt(9) match {
        case 0 => // append
          Versioned.commit(freshDf(1 + rnd.nextInt(3)), t)
        case 1 => // DV point delete on an id residue
          val m = 3 + rnd.nextInt(4)
          withMode(true) {
            Versioned.deleteWhere(spark, t,
              col("id") % m === rnd.nextInt(m))
          }
          dvOps += 1
        case 2 => // COW delete
          val m = 3 + rnd.nextInt(4)
          withMode(false) {
            Versioned.deleteWhere(spark, t,
              col("id") % m === rnd.nextInt(m))
          }
        case 3 => // DV update, sometimes predicated on the RENAMED
          // nested field (the r16 dvUpdate alias seam)
          val pred =
            if (rnd.nextBoolean())
              col(s"$meta.$src") === s"s${rnd.nextInt(4)}"
            else col("id") % (2 + rnd.nextInt(3)) === 0
          withMode(true) {
            Versioned.updateWhere(spark, t, pred,
              Map(v -> (col(v) + lit(1L))))
          }
          dvOps += 1
        case 4 => // merge upsert on id (source under CURRENT names)
          Versioned.merge(freshDf(1 + rnd.nextInt(2)), t, Seq("id"))
        case 5 => // nested rename (child of the struct)
          Versioned.renameColumn(t, s"$meta.$src", freshName("ns"))
          renames += 1
        case 6 => // parent/top-level rename
          if (rnd.nextBoolean())
            Versioned.renameColumn(t, meta, freshName("m"))
          else Versioned.renameColumn(t, v, freshName("val"))
          renames += 1
        case 7 => // OPTIMIZE (purges any DV masks)
          Versioned.optimize(spark, t, numFiles = 1 + rnd.nextInt(2))
        case 8 => // restore (schema + rows + masks roll back)
          val vs = Versioned.versions(t)
          Versioned.restore(t, vs(rnd.nextInt(vs.length)))
          restores += 1
      }
      assertAgree(Versioned.read(spark, t),
        spark.read.format("graftv").load(t), s"op $i snapshot")
    }
    assert(renames >= 5 && dvOps >= 5 && restores >= 2,
      s"fuzz must exercise the lifecycle (renames=$renames, " +
        s"dvOps=$dvOps, restores=$restores)")

    // every historical version agrees through both doors
    val versions = Versioned.versions(t).sorted
    versions.foreach { ver =>
      assertAgree(Versioned.read(spark, t, Some(ver)),
        spark.read.format("graftv").option("versionAsOf", ver).load(t),
        s"versionAsOf $ver")
    }

    // every per-version change-feed range agrees — or both refuse
    // (re-baseline commits); the colMap must resolve AS OF range end
    var cdfAgreed = 0
    var bothRefused = 0
    versions.filter(_ >= 2).foreach { ver =>
      val lib =
        try Some(Versioned.readChanges(spark, t, ver - 1, ver))
        catch { case _: RuntimeException => None }
      val ds =
        try {
          val df = spark.read.format("graftv")
            .option("readChangeFeed", "true")
            .option("startingVersion", ver - 1)
            .option("endingVersion", ver).load(t)
          df.collect() // refusal may surface at execution
          Some(df)
        } catch { case _: Exception => None }
      (lib, ds) match {
        case (Some(a), Some(b)) =>
          assertAgree(a, b, s"change feed ($ver-1, $ver]")
          cdfAgreed += 1
        case (None, None) => bothRefused += 1
        case (l, d) => fail(s"change feed ($ver-1, $ver]: one door " +
          s"refused and the other answered (lib=${l.isDefined}, " +
          s"dsv2=${d.isDefined})")
      }
    }
    assert(cdfAgreed > 0 && bothRefused > 0,
      s"fuzz must exercise both CDF agreement ($cdfAgreed) and " +
        s"matched refusals ($bothRefused)")
  }

  test("bloom-armed differential: point lookups agree through both " +
    "doors across a seeded DV/COW/merge/optimize/restore history") {
    val rnd = new scala.util.Random(20261603L)
    val t = Files.createTempDirectory("versioned-diff-bloom-").toString
    var nextId = 0L
    val schema = StructType.fromDDL("id BIGINT, v BIGINT")
    def freshDf(n: Int): DataFrame = {
      val rows = (0 until n).map { _ =>
        nextId += 1
        Row(nextId, nextId * 10)
      }
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1 + rnd.nextInt(2)), schema)
    }
    def withMode[A](dv: Boolean)(f: => A): A = {
      spark.conf.set("spark.graft.dv.enabled", dv.toString)
      try f finally spark.conf.unset("spark.graft.dv.enabled")
    }
    spark.conf.set("spark.graft.bloom.columns", "id")
    try {
      Versioned.commit(freshDf(12), t)
      (0 until 25).foreach { i =>
        rnd.nextInt(7) match {
          case 0 | 1 => Versioned.commit(freshDf(2 + rnd.nextInt(4)), t)
          case 2 => // DV point delete of one EXACT id (the bloom door)
            withMode(true) {
              Versioned.deleteWhere(spark, t,
                col("id") === (1L + rnd.nextLong(nextId)))
            }
          case 3 => // COW point delete
            withMode(false) {
              Versioned.deleteWhere(spark, t,
                col("id") === (1L + rnd.nextLong(nextId)))
            }
          case 4 => // small merge (the exact-key probe regime)
            Versioned.merge(freshDf(1 + rnd.nextInt(2)), t, Seq("id"))
          case 5 => Versioned.optimize(spark, t,
            numFiles = 1 + rnd.nextInt(3))
          case 6 =>
            val vs = Versioned.versions(t)
            Versioned.restore(t, vs(rnd.nextInt(vs.length)))
        }
        assertAgree(Versioned.read(spark, t),
          spark.read.format("graftv").load(t), s"bloom op $i snapshot")
        // point lookups: one likely-present id, one absent, one
        // IN-list mixing both — the DSv2 door rides the bloom tier
        // (with its false positives), the library door filters
        // post-scan; they must agree anyway
        val present = 1L + rnd.nextLong(nextId)
        val absent = nextId + 1000 + rnd.nextInt(1000)
        Seq(col("id") === present, col("id") === absent,
          col("id").isin(present, absent, 1L)).foreach { pred =>
          assertAgree(Versioned.read(spark, t).where(pred),
            spark.read.format("graftv").load(t).where(pred),
            s"bloom op $i point lookup $pred")
        }
      }
    } finally spark.conf.unset("spark.graft.bloom.columns")
  }
}
