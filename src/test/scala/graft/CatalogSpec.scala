package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.calculators.StubCalculator
import graft.core.Config
import graft.fit.Validate
import graft.operators.Catalog
import graft.pipeline.MaterialsPipeline
import graft.sources.Xdatcar
import graft.functions.{AflowDsl, DbFilter}

class CatalogSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions",
      "org.apache.spark.sql.graftx.GraftExtensions")
    .getOrCreate()

  private def configs = {
    import spark.implicits._
    val calc = StubCalculator()
    MaterialsPipeline.generate(MaterialsPipeline.seedDs(spark), 42L)
      .map(calc.extract(_))
  }

  test("catalog find resolves fnmatch patterns and uuid fast-path (F5/J1)") {
    val cat = Catalog.fromConfigs(configs.toDF(), "agpd")
    assert(cat.count() > 0)
    assert(Catalog.find(cat, "sub.agpd").count() === cat.count())
    assert(Catalog.find(cat, "su*.ag??").count() === cat.count())
    assert(Catalog.find(cat, "vac.agpd").count() === 0)
    val someUuid = cat.select("uuid").collect()(0).getString(0)
    assert(Catalog.find(cat, someUuid).count() === 1)
  }

  test("catalog status rollup aggregates the hierarchy (A1)") {
    val cat = Catalog.fromConfigs(configs.toDF(), "agpd")
    val roll = Catalog.statusRollup(cat).collect()
    val grand = roll.find(r => r.isNullAt(0) && r.isNullAt(1)).get
    val leaves = roll.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
    assert(grand.getLong(2) === leaves.map(_.getLong(2)).sum)
  }

  test("XDATCAR round-trip + every-Nth subsample (S10/O8)") {
    val a = 4.05
    val base = Config.of(Seq("Ag", "Pd"),
      Seq(Seq(a, 0, 0), Seq(0, a, 0), Seq(0, 0, a)),
      Seq(Seq(0.0, 0.0, 0.0), Seq(a / 2, a / 2, a / 2)))
    val text = (1 to 10).map { step =>
      val moved = base.copy(positions = base.positions.map(_.map(_ + step * 0.01)))
      if (step == 1) Xdatcar.writeFrame(step, moved)
      else Xdatcar.writeFrame(step, moved).linesIterator.toSeq.drop(7)
        .mkString("", "\n", "\n")
    }.mkString
    val frames = Xdatcar.read(text)
    assert(frames.length === 10)
    assert(frames.map(_.step) === (1 to 10))
    val sub = Xdatcar.subsample(frames, 3)
    assert(sub.map(_.step) === Seq(3, 6, 9))
    // geometry survives the fractional round-trip
    assert(math.abs(frames.head.config.positions(1)(0) - (a / 2 + 0.01)) < 1e-6)
  }

  test("validation metrics: zero for identical sets, exact for known shift (A5)") {
    import spark.implicits._
    val ref = configs
    val zero = Validate.metrics(ref, ref).collect()(0)
    assert(zero.getDouble(1) === 0.0) // e_rms
    assert(zero.getDouble(3) === 0.0) // f_rms
    val shifted = ref.map(c => c.copy(energy = c.energy.map(_ + 0.5)))
    val m = Validate.metrics(ref, shifted).collect()(0)
    assert(math.abs(m.getDouble(1) - 0.5) < 1e-9) // e_rms = shift
    assert(math.abs(m.getDouble(2) - 0.5) < 1e-9) // e_mae = shift
  }

  test("AflowDsl and DbFilter compile to correct predicates (F3/F4 unit)") {
    import spark.implicits._
    import AflowDsl._
    val df = Seq(("widget small", 5, "Brand#3"), ("bolt large", 15, "Brand#13"),
      ("widget large", 25, "Brand#2")).toDF("name", "sz", "brand")
    val p = Or(And(Cmp("name", "%", "widget"), Not(Cmp("sz", "<", 10))),
      Cmp("brand", "<", "3"))
    val got = df.where(AflowDsl.compile(p)).select("name").as[String]
      .collect().sorted
    // "bolt large" matches via brand suffix: "Brand#13" ends with "3"
    assert(got.toSeq === Seq("bolt large", "widget large", "widget small"))
    val f = DbFilter(df, Seq(DbFilter.Filter("sz", ">",
      DbFilter.ScalarRef(df, avg(col("sz"))))))
    assert(f.select("name").as[String].collect().toSeq === Seq("widget large"))
    // string form with |db|agg(attr)| object reference (basic.py:164–204)
    val parsed = DbFilter.parse("sz > |parts|avg(sz)|", Map("parts" -> df))
    val f2 = DbFilter(df, Seq(parsed))
    assert(f2.select("name").as[String].collect().toSeq === Seq("widget large"))
    val lit = DbFilter.parse("sz <= 5", Map.empty)
    assert(DbFilter(df, Seq(lit)).count() === 1)
    // nested-list DSL text form parses to the same predicate
    val parsedDsl = AflowDsl.parse(
      """[["name","%","widget"],"&",["!",["sz","<",10]]]""")
    val got2 = df.where(AflowDsl.compile(parsedDsl)).select("name")
      .as[String].collect().sorted
    assert(got2.toSeq === Seq("widget large"))
  }
}
