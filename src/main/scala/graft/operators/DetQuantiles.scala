package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic approximate quantiles — the round-8
  * "quantize before you decide" conversion (SCALING rule 11) for the
  * last non-sketch rows-only entry, `a9_quantiles_approx`.
  *
  * The engine-specific Greenwald–Khanna sketch behind
  * `approx_percentile` stays the production library tier
  * (`queries/Extras.a9QuantilesGk` — fixed-size mergeable summary,
  * the plan that survives a billion-row group); this kernel is its
  * oracle-checkable twin: a deterministic bottom-k (KMV-style)
  * sample-quantile sketch in which every decision is md5 ordering or
  * exact integer arithmetic, so the sample CONTENT and the estimates
  * replay bit-for-bit in DuckDB SQL.
  *
  * Construction (per group g, sample size k):
  *  - rank key rk = md5("q:" || unique row id) — a deterministic
  *    uniform [0,1) draw per row, identical in any engine.
  *  - sample = the k rows with smallest rk (bottom-k). Bottom-k is a
  *    uniform without-replacement sample and is MERGEABLE exactly:
  *    bottomK(A ∪ B) = bottomK(bottomK(A) ∪ bottomK(B)) — the same
  *    lossless-merge identity DetHll's registers have, spec-asserted
  *    in DetQuantilesSpec.
  *  - estimate at φ = p/q: the order statistic at integer rank
  *    ceil(φ·m) = (p·m + q − 1) div q of the sample sorted by
  *    (value, rk) — m = min(k, n) the realized sample size, the
  *    rank arithmetic exact integers, the (value, rk) tiebreak total.
  *    No interpolation, no float rank math: the estimate IS a corpus
  *    value passed through untouched.
  *  - error: a uniform m-sample puts the φ order statistic within
  *    rank error O(sqrt(φ(1−φ)/m)) of the true quantile w.h.p.
  *    (Chernoff on the binomial rank count) — ~1.6 % at the median
  *    for k = 1024; DetQuantilesSpec asserts the observed rank error
  *    vs the exact percentile, sk1-style.
  *
  * 100 TB shape: one shuffle on the group key; the per-group sort
  * feeding row_number is the same shuffle-sort the exact-percentile
  * plan already pays, and the output is ≤ k rows per group. The
  * scale path beyond that is a pre-filter on a hash-prefix threshold
  * chosen from the (cheap, first-pass) group counts with a
  * Chernoff-safe margin — a pure optimization that cannot change the
  * bottom-k content as long as it keeps ≥ k rows, verified by a
  * count and widened on shortfall. */
object DetQuantiles {

  /** Default sample size: rank error ~ 1/sqrt(1024) ≈ 3 % worst-case
    * envelope, well inside the spec's tolerance at sf0.01+. */
  val K = 1024

  /** φ targets as exact rationals (name, p, q). */
  val Phis: Seq[(String, Int, Int)] =
    Seq(("q25", 1, 4), ("q50", 1, 2), ("q90", 9, 10))

  /** Per-group bottom-k sample: (g, v, rk) with the k smallest
    * md5("q:" || id) keys per group. */
  def bottomK(df: DataFrame, group: String, value: String, id: Column,
      k: Int = K): DataFrame = {
    val keyed = df.select(col(group).as("g"), col(value).as("v"),
      md5(concat(lit("q:"), id.cast("string"))).as("rk"))
    val w = Window.partitionBy(col("g")).orderBy(col("rk"))
    keyed.withColumn("pos", row_number().over(w))
      .where(col("pos") <= k).drop("pos")
  }

  /** Estimates from a bottom-k sample table joined with exact group
    * counts: (g, q25, q50, q90, n) — see object doc for semantics. */
  def estimate(sample: DataFrame, counts: DataFrame,
      k: Int = K): DataFrame = {
    val wv = Window.partitionBy(col("g")).orderBy(col("v"), col("rk"))
    val ranked = sample.withColumn("vr", row_number().over(wv))
      .join(broadcast(counts), "g")
      .withColumn("m", least(lit(k.toLong), col("n")))
    val qCols = Phis.map { case (nm, p, q) =>
      round(max(when(col("vr") ===
        expr(s"($p * m + ${q - 1}) div $q"), col("v"))), 4).as(nm)
    }
    ranked.groupBy(col("g"))
      .agg(qCols.head, qCols.tail :+ max(col("n")).as("n"): _*)
  }

  /** End-to-end: deterministic sample quantiles of `value` per
    * `group`, `id` a unique row key. */
  def quantiles(df: DataFrame, group: String, value: String, id: Column,
      k: Int = K): DataFrame = {
    val counts = df.groupBy(col(group).as("g")).agg(count(lit(1)).as("n"))
    estimate(bottomK(df, group, value, id, k), counts, k)
      .withColumnRenamed("g", group)
      .orderBy(col(group))
  }

  /** DuckDB SQL twin over a table with the same (group, value, id)
    * columns — textually mirrors quantiles() step for step. */
  def oracleSql(table: String, group: String, value: String, id: String,
      k: Int = K): String = {
    val qSel = Phis.map { case (nm, p, q) =>
      s"ROUND(MAX(CASE WHEN vr = ($p * m + ${q - 1}) // $q THEN v END), 4) AS $nm"
    }.mkString(",\n | ")
    s"""WITH keyed AS (
       | SELECT $group AS g, $value AS v, md5('q:' || $id) AS rk
       | FROM $table),
       |counts AS (SELECT g, count(*) AS n FROM keyed GROUP BY g),
       |sample AS (
       | SELECT g, v, rk,
       |  ROW_NUMBER() OVER (PARTITION BY g ORDER BY rk) AS pos
       | FROM keyed QUALIFY pos <= $k),
       |ranked AS (
       | SELECT s.g, s.v, s.rk, c.n, LEAST($k, c.n) AS m,
       |  ROW_NUMBER() OVER (PARTITION BY s.g ORDER BY s.v, s.rk) AS vr
       | FROM sample s JOIN counts c USING (g))
       |SELECT g AS $group,
       | $qSel,
       | MAX(n) AS n
       |FROM ranked GROUP BY g ORDER BY $group""".stripMargin
  }
}
