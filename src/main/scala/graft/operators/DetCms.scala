package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic count-min sketch (Cormode–Muthukrishnan
  * 2005) — the round-8 "quantize before you decide" conversion for
  * sk3, completing the sketch family's hash-level oracles (sk1/sk2
  * via [[DetHll]], sk4's theta sketches exact in the driver-gate
  * regime). Every decision is exact integer arithmetic on md5-derived
  * buckets, so the register table, the min-count estimates, and the
  * φ-support threshold replay bit-for-bit in DuckDB SQL.
  *
  * Construction (d = 4 rows × w = 16³ = 4096 buckets):
  *  - bucket(i, token) = the first 3 hex chars of
  *    md5("cms:" || i || ":" || token), KEPT AS A STRING — buckets
  *    only ever need equality (grouping and the estimate join), so no
  *    hex parse exists for two engines to disagree on (the DetHll
  *    discipline);
  *  - register state: cnt(i, bucket) = Σ n(token) over tokens hashing
  *    there — exact BIGINT sums of exact token counts, reassociation-
  *    free; registers are ADDITIVE across sources/partitions by
  *    construction (cell-wise integer sum), so the merge identity is
  *    associativity of +, not a property to hope for;
  *  - estimate(t) = min_i cnt(i, bucket(i, t)) — the classic CMS
  *    upper bound (never under-counts), as a 4-way integer MIN;
  *  - support threshold: est·10⁶ ≥ φµ·N as exact integer comparison
  *    (φµ = φ in millionths, N = corpus token mass).
  *
  * 100 TB shape: the register build pre-aggregates exact per-token
  * counts first (map-side combine makes that shuffle vocab-bounded
  * per partition, Heaps' law overall), then explodes d short-key rows
  * per vocab entry — the register table is ≤ d·w = 16384 rows total
  * regardless of corpus size. The candidate tier reuses sk3's
  * pigeonhole-complete per-source support filter (a token with global
  * mass ≥ φ·N has per-source mass ≥ φ·N/S somewhere), so no true
  * heavy hitter can be missed; the CMS gate only ever OVER-admits.
  * Reference semantics: the reference's analytics layer exposes
  * frequent-pattern summaries over grouped configuration tables
  * (matdb/database/controller.py steps/summaries); this is the
  * stream-frequency analog a training-data pipeline needs.
  */
object DetCms {

  /** Depth (independent hash rows). */
  val D = 4
  /** Width: 3 hex chars = 4096 buckets per row. */
  val W = 4096

  private def bucketCol(row: Int, tok: Column): Column =
    substring(md5(concat(lit(s"cms:$row:"), tok)), 1, 3)

  /** Register table from an exact per-token count relation
    * `counts(token, n)`: (r int, bucket string, cnt long) — ≤ d·w
    * rows. Additive: registers(a ∪ b) = cell-wise sum of
    * registers(a) + registers(b). */
  def registers(counts: DataFrame): DataFrame = {
    val rb = explode(array((0 until D).map(i =>
      struct(lit(i).as("r"), bucketCol(i, col("token")).as("bucket"))): _*))
    counts
      .select(rb.as("rb"), col("n"))
      .groupBy(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .agg(sum(col("n")).as("cnt"))
  }

  /** Min-count estimate for each row of `cand(token)` against a
    * register table: (token, est_count long). The join is d
    * short-key equi-lookups; the register side broadcasts (≤ 16384
    * rows at any corpus size). */
  def estimate(cand: DataFrame, regs: DataFrame): DataFrame = {
    val probes = cand.select(col("token"), explode(array((0 until D).map(i =>
      struct(lit(i).as("r"), bucketCol(i, col("token")).as("bucket"))): _*))
      .as("rb"))
      .select(col("token"), col("rb.r").as("r"), col("rb.bucket").as("bucket"))
    probes
      .join(broadcast(regs), Seq("r", "bucket"))
      .groupBy(col("token"))
      .agg(min(col("cnt")).as("est_count"))
  }

  /** sk3 heavy hitters over a `(source, text)` relation with support
    * threshold `phiMicro` millionths of the token mass. Candidate
    * tier: pigeonhole-complete per-source support filter (exact
    * integers); estimate tier: deterministic CMS min-count; gate:
    * est·10⁶ ≥ φµ·N. Output (token, est_count), est desc. */
  /** The sk3 tokenizer, shared with the streaming register twin so
    * batch and per-micro-batch token streams are the same relation. */
  def tokensOf(docs: DataFrame): DataFrame = docs
    .select(col("source"), explode(split(col("text"), " ")).as("token"))
    .where(length(col("token")) > 0)

  def heavyHittersOf(docs: DataFrame, phiMicro: Long): DataFrame = {
    val toks = tokensOf(docs)
    val totals = toks.agg(
      count(lit(1)).as("n_mass"),
      countDistinct(col("source")).as("n_src"))
    val counts = toks.groupBy(col("token")).agg(count(lit(1)).as("n"))
    val regs = registers(counts)
    val cand = toks.groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("sn"))
      .crossJoin(broadcast(totals))
      .where(col("sn") * col("n_src") * lit(1000000L) >=
        lit(phiMicro) * col("n_mass"))
      .select(col("token")).distinct()
    estimate(cand, regs)
      .crossJoin(broadcast(totals))
      .where(col("est_count") * lit(1000000L) >= lit(phiMicro) * col("n_mass"))
      .select(col("token"), col("est_count"))
      .orderBy(col("est_count").desc, col("token"))
  }

  // ------------------------------------------------------------------
  // DuckDB SQL twin
  // ------------------------------------------------------------------

  /** Complete sk3 oracle: deterministic CMS heavy hitters over
    * document tokens at φ = phiMicro/10⁶. Mirrors heavyHittersOf
    * stage for stage; every count/threshold is BIGINT. */
  def oracleSk3(phiMicro: Long): String =
    s"""WITH toks0 AS (
       | SELECT source, unnest(string_split(text, ' ')) AS token
       | FROM documents),
       |tk AS MATERIALIZED (
       | SELECT source, token FROM toks0 WHERE length(token) > 0),
       |tot AS (
       | SELECT COUNT(*)::BIGINT AS n_mass,
       |  COUNT(DISTINCT source)::BIGINT AS n_src FROM tk),
       |vocab AS MATERIALIZED (
       | SELECT token, COUNT(*)::BIGINT AS n FROM tk GROUP BY token),
       |regs AS MATERIALIZED (
       | SELECT rr.r, substr(md5('cms:' || rr.r || ':' || v.token), 1, 3)
       |   AS bucket, SUM(v.n)::BIGINT AS cnt
       | FROM vocab v, range(0, $D) rr(r) GROUP BY 1, 2),
       |cand AS (
       | SELECT DISTINCT s.token
       | FROM (SELECT source, token, COUNT(*)::BIGINT AS sn
       |       FROM tk GROUP BY source, token) s, tot
       | WHERE s.sn * tot.n_src * 1000000 >= $phiMicro * tot.n_mass),
       |est AS (
       | SELECT p.token, MIN(g.cnt) AS est_count
       | FROM (SELECT c.token, rr.r,
       |        substr(md5('cms:' || rr.r || ':' || c.token), 1, 3) AS bucket
       |       FROM cand c CROSS JOIN range(0, $D) rr(r)) p
       | JOIN regs g ON g.r = p.r AND g.bucket = p.bucket
       | GROUP BY p.token)
       |SELECT e.token, e.est_count FROM est e, tot
       |WHERE e.est_count * 1000000 >= $phiMicro * tot.n_mass
       |ORDER BY e.est_count DESC, e.token""".stripMargin
}
