package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic HyperLogLog (Flajolet et al. 2007;
  * bias/threshold discipline after Heule–Nunkesser–Hall, HLL++) —
  * the round-7 "quantize before you decide" conversion for the
  * sketch family: every decision the sketch makes is exact integer
  * or fixed-expression-tree arithmetic on md5-derived bits, so the
  * per-key sketch STATE and the estimate replay bit-for-bit in
  * DuckDB SQL, upgrading sk1/sk2 from rows-only error-bound checks
  * to full hash-level oracles.
  *
  * Construction (m = 2^12 = 4096 registers):
  *  - h = md5("hll:" || token): bucket = the first 3 hex chars KEPT
  *    AS A STRING (buckets only ever need equality — no hex parse to
  *    disagree on), rho = 1 + leading zero bits of the next 13 hex
  *    chars (52 bits), computed as 4·(leading '0' chars) + a 16-way
  *    nibble CASE — ltrim + CASE, portable to any engine.
  *  - register state: MAX(rho) per bucket — the only aggregation,
  *    and a max of small ints is reassociation-free.
  *  - sum term: 2^(40 − min(rho, 40)) per present bucket, 2^40 per
  *    empty one. S = Σ terms ≤ m·2^40 = 2^52 — every partial sum an
  *    exact-in-double integer, so SUM order cannot matter.
  *  - raw estimate: round(alpha_m·m²·2^40 / S) — the numerator is ONE
  *    Scala-computed double literal shared verbatim with the SQL
  *    twin, so the whole estimate is a single IEEE divide + round.
  *  - small-range correction, the part that normally needs ln():
  *    linear counting's m·ln(m/V) is the asymptotic form of the EXACT
  *    coupon-collector expectation m·(H_m − H_V); H_m − H_V =
  *    Σ_{k=V+1..m} 1/k, which we take QUANTIZED: S2 = Σ round(2^28/k)
  *    (each term a single IEEE divide+round of exact operands, the
  *    sum ≤ 2^28·H_m ≈ 2.4e9 exact), est = round(m·S2 / 2^28) with
  *    m·S2 ≤ 9.9e12 < 2^52 exact. No transcendental ever evaluated
  *    at runtime — libm ulp drift cannot flip a rounded row.
  *  - switchover: corrected iff V > 0 AND 2·raw ≤ 5·m (the 2.5m
  *    HLL++ threshold as an exact integer comparison).
  *
  * 100 TB shape: one token-shuffle to (key, bucket) registers —
  * ≤ m rows per key regardless of corpus size — then O(m) arithmetic
  * per key; sketches merge by per-bucket MAX without rescanning
  * (sk2's union row is computed from the per-source register tables
  * only, and its ORACLE recomputes the direct single-pass sketch —
  * their hash-equality is the lossless-merge identity, now checked
  * per round instead of asserted in a spec). */
object DetHll {

  val B = 12
  val M: Int = 1 << B // 4096
  /** Bucket-term scale 2^40 and coupon scale 2^28 (see overflow
    * budget in the object doc). */
  val Two40: Long = 1L << 40
  val Two28: Long = 1L << 28
  /** alpha_m·m²·2^40 for m = 4096 (alpha from Flajolet et al. §4) as
    * the single shared double literal. */
  val RawNum: Double =
    0.7213 / (1.0 + 1.079 / M) * M.toDouble * M.toDouble * Two40.toDouble

  /** rho(tail) for a 13-hex-char column: 1 + leading zero bits.
    * Leading-zero CHARS counted as 13 − length(ltrim(tail, '0')) —
    * a linear scan, ~3× cheaper per token than the r7
    * regexp_extract('^0*') form (the sk1/sk2 determinism-tax fix,
    * r8); identical semantics in Spark and DuckDB. */
  private def rhoCol(tail: Column): Column = {
    val l = lit(13) - length(ltrim(tail, "0"))
    val c = tail.substr(l + 1, lit(1))
    val z = when(c === "1", 3).when(c.isin("2", "3"), 2)
      .when(c.isin("4", "5", "6", "7"), 1).otherwise(0)
    when(l === 13, 53).otherwise(lit(4) * l + z + 1).cast("int")
  }

  /** Per-key register table: (keys..., bucket string, mx int). The
    * ONLY corpus-sized shuffle; output is ≤ m rows per key. */
  def registers(df: DataFrame, keys: Seq[String], tok: Column): DataFrame = {
    val h = md5(concat(lit("hll:"), tok))
    df.select(keys.map(col) :+ h.as("hx"): _*)
      .select(keys.map(col) :+ substring(col("hx"), 1, 3).as("bucket")
        :+ rhoCol(substring(col("hx"), 4, 13)).as("rho"): _*)
      .groupBy((keys.map(col) :+ col("bucket")): _*)
      .agg(max(col("rho")).as("mx"))
  }

  /** [[registers]] + per-bucket input-row counts (`__bn`) — the fused
    * sk1 shape (round 17): every input row lands in exactly one
    * (key, bucket) group, so `sum(__bn)` at the key level IS the
    * exact per-key row count and the exact-count twin stops being a
    * second full scan of the input (guide §1.2: one pass serves both
    * sides). The extra count rides the SAME partial aggregation —
    * shuffle volume is unchanged (≤ m rows per key either way). */
  def registersWithCount(df: DataFrame, keys: Seq[String],
      tok: Column): DataFrame = {
    val h = md5(concat(lit("hll:"), tok))
    df.select(keys.map(col) :+ h.as("hx"): _*)
      .select(keys.map(col) :+ substring(col("hx"), 1, 3).as("bucket")
        :+ rhoCol(substring(col("hx"), 4, 13)).as("rho"): _*)
      .groupBy((keys.map(col) :+ col("bucket")): _*)
      .agg(max(col("rho")).as("mx"), count(lit(1)).as("__bn"))
  }

  /** Fold a register table to per-key sketch statistics + the
    * deterministic estimate: (keys..., approx long, hll_empty long,
    * hll_sum_q40 long). */
  def estimate(regs: DataFrame, keys: Seq[String],
      approxName: String): DataFrame =
    estimateAgg(regs, keys, approxName, Nil, Nil)

  /** [[estimate]] over a [[registersWithCount]] table, carrying the
    * exact input-row count as `nName` — sketch and exact count fold
    * in ONE key-level aggregation over one register pass. */
  def estimateWithCount(regs: DataFrame, keys: Seq[String],
      approxName: String, nName: String): DataFrame =
    estimateAgg(regs, keys, approxName,
      Seq(sum(col("__bn")).as(nName)), Seq(col(nName)))

  private def estimateAgg(regs: DataFrame, keys: Seq[String],
      approxName: String, extraAggs: Seq[Column],
      extraOut: Seq[Column]): DataFrame = {
    val term = expr("shiftleft(1L, int(40 - least(mx, 40)))")
    val st = regs
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("present"),
        (sum(term).as("s_present") +: extraAggs): _*)
      .withColumn("hll_empty", lit(M.toLong) - col("present"))
      .withColumn("hll_sum_q40",
        col("s_present") + col("hll_empty") * lit(Two40))
    val raw = round(lit(RawNum) / col("hll_sum_q40").cast("double"), 0)
      .cast("long")
    // coupon-collector correction: m·Σ_{k=V+1..m} round(2^28/k)/2^28
    val s2 = when(col("hll_empty") < lit(M.toLong),
      aggregate(sequence(col("hll_empty") + 1, lit(M.toLong)), lit(0L),
        (acc, k) => acc + round(lit(Two28.toDouble) / k.cast("double"), 0)
          .cast("long"))).otherwise(lit(0L))
    val lc = round((lit(M.toLong) * s2).cast("double") / lit(Two28.toDouble), 0)
      .cast("long")
    val corrected = when(col("hll_empty") > 0 &&
      raw * 2 <= lit(5L * M), lc).otherwise(raw)
    st.select(keys.map(col) ++ (corrected.as(approxName)
      +: col("hll_empty") +: col("hll_sum_q40") +: extraOut): _*)
  }

  // ------------------------------------------------------------------
  // DuckDB SQL twin
  // ------------------------------------------------------------------

  /** Shared CTE chain from a `toks(g, tok)` relation to
    * `est(g, approx, hll_empty, hll_sum_q40)`. The caller supplies
    * the toks CTE and joins `est` back to whatever else it needs. */
  def estSql(toksRel: String): String =
    s"""hx AS (SELECT g, md5('hll:' || tok) AS hx FROM $toksRel),
       |lz AS (
       | SELECT g, substr(hx, 1, 3) AS bucket, substr(hx, 4, 13) AS tail,
       |  13 - length(ltrim(substr(hx, 4, 13), '0')) AS l
       | FROM hx),
       |br AS (
       | SELECT g, bucket,
       |  CASE WHEN l = 13 THEN 53
       |   ELSE 4 * l
       |    + (CASE substr(tail, l + 1, 1)
       |        WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
       |        WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
       |        WHEN '7' THEN 1 ELSE 0 END) + 1 END AS rho
       | FROM lz),
       |regs AS MATERIALIZED (
       | SELECT g, bucket, MAX(rho) AS mx FROM br GROUP BY g, bucket),
       |st AS MATERIALIZED (
       | SELECT g, COUNT(*)::BIGINT AS present,
       |  SUM(1::BIGINT << (40 - LEAST(mx, 40)))::BIGINT AS s_present
       | FROM regs GROUP BY g),
       |st2 AS (
       | SELECT g, present, ($M - present) AS hll_empty,
       |  s_present + ($M - present) * ${Two40}::BIGINT AS hll_sum_q40
       | FROM st),
       |est AS MATERIALIZED (
       | SELECT g,
       |  CASE WHEN hll_empty > 0
       |        AND 2 * ROUND($RawNum / hll_sum_q40::DOUBLE)::BIGINT <= ${5L * M}
       |   THEN ROUND(($M::BIGINT * (
       |     SELECT COALESCE(SUM(ROUND(${Two28}.0 / k.k)::BIGINT), 0)
       |     FROM range(1, $M + 1) k(k) WHERE k.k > hll_empty))::DOUBLE
       |     / ${Two28}.0)::BIGINT
       |   ELSE ROUND($RawNum / hll_sum_q40::DOUBLE)::BIGINT END AS approx,
       |  hll_empty, hll_sum_q40
       | FROM st2)""".stripMargin

  /** Complete sk1 oracle: per-returnflag deterministic HLL over
    * l_partkey, plus the exact row count. */
  def oracleSk1: String =
    s"""WITH toks AS (
       | SELECT l_returnflag AS g, l_partkey::VARCHAR AS tok FROM lineitem),
       |${estSql("toks")},
       |cnt AS (SELECT g, COUNT(*)::BIGINT AS n FROM toks GROUP BY g)
       |SELECT e.g AS l_returnflag, e.approx AS approx_parts, c.n,
       | e.hll_empty, e.hll_sum_q40
       |FROM est e JOIN cnt c USING (g)
       |ORDER BY l_returnflag""".stripMargin

  /** Complete sk2 oracle: per-source deterministic HLL over document
    * tokens + the `__union__` row. The oracle computes the union
    * DIRECTLY (one sketch over all sources); the Spark side computes
    * it by MERGING the per-source register tables — hash equality of
    * the two is the lossless-merge identity, checked per round. */
  def oracleSk2: String =
    s"""WITH toks0 AS (
       | SELECT source, unnest(string_split(text, ' ')) AS tok
       | FROM documents),
       |toksrc AS (SELECT source AS g, tok FROM toks0 WHERE length(tok) > 0),
       |toks AS (
       | SELECT g, tok FROM toksrc
       | UNION ALL SELECT '__union__' AS g, tok FROM toksrc),
       |${estSql("toks")},
       |ex AS (SELECT g, COUNT(DISTINCT tok)::BIGINT AS exact_distinct
       |       FROM toksrc GROUP BY g)
       |SELECT e.g AS source, e.approx AS est_distinct,
       | x.exact_distinct, e.hll_empty, e.hll_sum_q40
       |FROM est e LEFT JOIN ex x USING (g)
       |ORDER BY source""".stripMargin
}
