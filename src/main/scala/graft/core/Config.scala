package graft.core

import org.apache.spark.sql.types._

/** The row type of the engine: one material configuration
  * (SURVEY §1.2; reference: matdb/atoms.py:74–107, serialized schema
  * atoms.py:406–458).
  *
  * Fixed columns carry the hot keys (energy/force/virial, the
  * reference's `{key}_energy` family after `_conform_atoms` renames,
  * database/__init__.py:1107–1157); the open `params`/`properties`
  * dicts (atoms.py:218–236) spill into MapType columns so the schema
  * stays stable at scale (no merge-on-read explosions).
  */
final case class Config(
    uuid: String,
    groupUuid: String,
    n: Int,
    symbols: String,                       // compressed formula, e.g. "Ag2Pd2"
    species: Seq[String],                  // per-atom element symbols
    cell: Seq[Seq[Double]],                // 3x3 lattice vectors (rows)
    positions: Seq[Seq[Double]],           // n x 3 cartesian
    pbc: Seq[Boolean],                     // length 3
    energy: Option[Double],
    force: Option[Seq[Seq[Double]]],       // n x 3
    virial: Option[Seq[Double]],           // 9, row-major 3x3
    configType: Option[String],
    params: Map[String, String],
    properties: Map[String, Seq[Double]]) {

  def withSpecies(sp: Seq[String]): Config =
    copy(species = sp, symbols = Formula.compress(sp))
}

object Config {

  /** Parquet/DataFrame schema (FIXTURES.md A1). */
  val schema: StructType = StructType(Seq(
    StructField("uuid", StringType, nullable = false),
    StructField("groupUuid", StringType, nullable = false),
    StructField("n", IntegerType, nullable = false),
    StructField("symbols", StringType, nullable = false),
    StructField("species", ArrayType(StringType), nullable = false),
    StructField("cell", ArrayType(ArrayType(DoubleType)), nullable = false),
    StructField("positions", ArrayType(ArrayType(DoubleType)), nullable = false),
    StructField("pbc", ArrayType(BooleanType), nullable = false),
    StructField("energy", DoubleType, nullable = true),
    StructField("force", ArrayType(ArrayType(DoubleType)), nullable = true),
    StructField("virial", ArrayType(DoubleType), nullable = true),
    StructField("configType", StringType, nullable = true),
    StructField("params", MapType(StringType, StringType), nullable = false),
    StructField("properties", MapType(StringType, ArrayType(DoubleType)), nullable = false)))

  /** Fresh config from structure data; uuid is the deterministic
    * content hash (the reference uses uuid4 + a separate content hash;
    * a content-derived id is idempotent under re-runs, which is what
    * the dedup-append pipeline actually needs). */
  def of(species: Seq[String], cell: Seq[Seq[Double]],
      positions: Seq[Seq[Double]], groupUuid: String = "",
      configType: Option[String] = None): Config = {
    val c = Config(
      uuid = "", groupUuid = groupUuid, n = species.length,
      symbols = Formula.compress(species), species = species,
      cell = cell, positions = positions,
      pbc = Seq(true, true, true),
      energy = None, force = None, virial = None,
      configType = configType, params = Map.empty, properties = Map.empty)
    c.copy(uuid = Hashing.contentHash(c))
  }
}
