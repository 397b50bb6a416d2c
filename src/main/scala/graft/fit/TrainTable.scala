package graft.fit

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Config, Formula}
import graft.sources.Cfg

/** Training-table compilation (SURVEY §3.2; reference:
  * fitting/basic.py:393–448 `compile`, database/__init__.py:1107–1157
  * `_conform_atoms` renames, io.py:57–141 CFG export).
  */
object TrainTable {

  /** F10 rename projection: promote `{key}_energy` params to the
    * `ref_energy` param (the hot `energy` column is already typed —
    * here we conform the namespaced keys like the reference does). */
  def conform(ds: Dataset[Config], calcKey: String): Dataset[Config] = {
    import ds.sparkSession.implicits._
    ds.map { c =>
      val renamed = c.params.map {
        case (k, v) if k == s"${calcKey}_energy" => "ref_energy" -> v
        case (k, v) if k == s"${calcKey}_virial" => "ref_virial" -> v
        case kv => kv
      }
      c.copy(params = renamed)
    }
  }

  /** Union the trainable rsets (U1/U3): splittable rows go through the
    * split assignment; non-splittable (hessian eigen) rows are
    * train-only (database/__init__.py:97–99, 1401–1424). */
  def trainUnion(splittable: DataFrame, nonsplittable: DataFrame,
      trainIds: DataFrame, idCol: String): DataFrame =
    splittable.join(trainIds.select(idCol), Seq(idCol), "left_semi")
      .unionByName(nonsplittable, allowMissingColumns = true)

  /** Export a Dataset[Config] to MTP .cfg text lines (S4): one string
    * per config — `ds.map(toCfg)` keeps the sink distributed
    * (`coalesce` only if a single file is required). */
  def toCfgLines(ds: Dataset[Config], species: Seq[String]): Dataset[String] = {
    import ds.sparkSession.implicits._
    val tm = Formula.typeMap(species)
    ds.map(c => Cfg.write(c, tm))
  }
}
