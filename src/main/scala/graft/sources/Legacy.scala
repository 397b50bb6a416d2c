package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.core.Config

/** Legacy-database ingest (SURVEY §2.3 F10 / §2.7 O6; reference:
  * database/legacy.py:32–74 key renames, 141–150 shuffle-limit,
  * 166–240 `_conform_atoms` on old-format files).
  *
  * Old corpora arrive as multi-frame extended-XYZ with
  * differently-namespaced keys; ingest = parse → conform renames →
  * optional deterministic limit sample (keyed-digest rank, the O6
  * engine-independent form).
  */
object Legacy {

  /** Rename legacy params to the ref_* family (F10; the typed
    * energy/force/virial columns are already conformed by ExtXyz). */
  def conform(c: Config, energyKey: String = "dft_energy"): Config = {
    val renamed = c.params.map {
      case (k, v) if k == energyKey => "ref_energy" -> v
      case (k, v) if k.endsWith("_energy") => "ref_energy" -> v
      case (k, v) if k.endsWith("_virial") => "ref_virial" -> v
      case kv => kv
    }
    c.copy(params = renamed, configType = c.configType.orElse(Some("legacy")))
  }

  /** Ingest a legacy extxyz payload (e.g. from wholeTextFiles) into a
    * Dataset[Config] with conformed keys. */
  def ingest(spark: SparkSession, xyzTexts: Seq[String],
      limit: Option[Int] = None): Dataset[Config] = {
    import spark.implicits._
    val ds = spark.createDataset(xyzTexts)
      .flatMap(t => ExtXyz.read(t))
      .map(conform(_))
    limit match {
      case Some(n) =>
        // deterministic "shuffle then take first n" (legacy.py:141–150)
        // via content-keyed rank — replays identically on any engine
        ds.sort(org.apache.spark.sql.functions.md5(
          org.apache.spark.sql.functions.concat_ws(":",
            org.apache.spark.sql.functions.lit("legacy"),
            org.apache.spark.sql.functions.col("uuid"))))
          .limit(n)
      case None => ds
    }
  }
}
