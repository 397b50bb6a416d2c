package graft.sources

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import graft.core.Hashing

/** Dataset provenance manifests (SURVEY §2.1 S12; reference:
  * utility.py:933–983 `dbcat` writes a `<db>.json` sidecar with
  * version uuid, source files, params and timestamp; dbconfig
  * database/utility.py:167–183).
  *
  * Here: a JSON sidecar next to each materialized parquet dataset,
  * carrying a deterministic content version (the D7 relation hash) so
  * downstream consumers can verify inputs (`verify_hash`,
  * database/__init__.py:1944–1976).
  */
object Provenance {

  final case class Manifest(versionHash: String, sources: Seq[String],
      params: Map[String, String], rowCount: Long, timestamp: String)

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  def toJson(m: Manifest): String = {
    val params = m.params.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${jstr(k)}: ${jstr(v)}" }.mkString("{", ", ", "}")
    val sources = m.sources.map(jstr).mkString("[", ", ", "]")
    s"""{"version_hash": ${jstr(m.versionHash)}, "sources": $sources, """ +
      s""""params": $params, "row_count": ${m.rowCount}, """ +
      s""""timestamp": ${jstr(m.timestamp)}}"""
  }

  /** Write `df` to parquet + a manifest sidecar whose version is the
    * distributed content hash (deterministic under partitioning). */
  def writeWithManifest(df: DataFrame, path: String, sources: Seq[String],
      params: Map[String, String]): Manifest = {
    df.write.mode("overwrite").parquet(path)
    val written = df.sparkSession.read.parquet(path)
    val m = Manifest(
      versionHash = Hashing.tableHash(written),
      sources = sources,
      params = params,
      rowCount = written.count(),
      timestamp = java.time.Instant.now().toString)
    Files.writeString(Paths.get(s"$path.manifest.json"), toJson(m))
    m
  }

  /** `verify_hash`: recompute and compare the content version. */
  def verify(spark: org.apache.spark.sql.SparkSession, path: String,
      expected: String): Boolean =
    Hashing.tableHash(spark.read.parquet(path)) == expected
}
