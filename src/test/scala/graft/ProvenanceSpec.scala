package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Provenance

class ProvenanceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions",
      "org.apache.spark.sql.graftx.GraftExtensions")
    .getOrCreate()

  test("manifest sidecar carries a verifiable content version (S12/D7)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("prov").toString
    val df = (1 to 100).map(i => (i.toLong, s"row$i")).toDF("id", "v")
    val m = Provenance.writeWithManifest(df, s"$dir/rset",
      sources = Seq("unit-test"), params = Map("seed" -> "42"))
    assert(m.rowCount === 100)
    val json = Files.readString(Paths.get(s"$dir/rset.manifest.json"))
    assert(json.contains(m.versionHash))
    assert(json.contains("\"seed\": \"42\""))
    // verify_hash round-trip (database/__init__.py:1944–1976)
    assert(Provenance.verify(spark, s"$dir/rset", m.versionHash))
    // tamper → hash mismatch
    val tampered = spark.read.parquet(s"$dir/rset").limit(99)
    tampered.write.mode("overwrite").parquet(s"$dir/rset2")
    assert(!Provenance.verify(spark, s"$dir/rset2", m.versionHash))
  }
}
