package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Interleaved A/B micro-bench for the round-16 rewrites: each lap
  * runs OLD then NEW of every pair through the noop sink, so host-
  * level speed drift (this sandbox swings ±30% within minutes)
  * cancels within a lap. Old formulations are inlined verbatim from
  * the pre-r16 code. Evidence for OPTIMIZATION_r16.md; not part of
  * the bench/driver surface. */
object AbBench {
  private def dot(x: Column, y: Column): Column =
    org.apache.spark.sql.graftx.VectorExpressions.dotProduct(x, y)

  /** s5_bm25 exactly as it stood before round 16. */
  def s5Old(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val toks = split(col("text"), " ")
    val isQ = pmod(col("doc_id"), lit(101)) === 0 && col("doc_id") < 5050
    val tf = docs.select(col("doc_id"), explode(toks).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val dlen = docs.select(col("doc_id"), size(toks).cast("long").as("dl"))
    val corpusIds = docs.where(!isQ).select(col("doc_id"))
    val stats = docs.where(!isQ)
      .agg(count(lit(1)).as("n_docs"), avg(size(toks)).as("avgdl"))
    val dfreq = tf.join(corpusIds, "doc_id")
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    val qterms = tf
      .where(pmod(col("doc_id"), lit(101)) === 0 && col("doc_id") < 5050)
      .select(col("doc_id").as("query_id"), col("token"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val sat = (col("tf") * lit(2.2)) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_micro").desc, col("doc_id").asc)
    tf.join(corpusIds, "doc_id")
      .join(broadcast(qterms), "token")
      .join(dfreq, "token")
      .join(dlen, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"),
        round(idf * sat * lit(1e6), 0).cast("long").as("ts"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("ts")).as("score_micro"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 10)
      .orderBy(col("query_id"), col("rk"))
  }

  /** d11 kernel as before round 16 (no shared repartition). */
  def d11Old(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val k = 20
    val wins = docs.select(col("doc_id"), explode(array_distinct(
        graft.operators.MinHash.shingleCol(col("text"), k))).as("win"))
      .select(col("doc_id"), md5(col("win")).as("h"))
    val firsts = wins.groupBy(col("h")).agg(min(col("doc_id")).as("first_doc"))
    val perDoc = wins.join(firsts, "h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("first_doc") < col("doc_id"), 1L).otherwise(0L))
          .as("n_shared"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)) > 0).as("is_dup"))
      .orderBy(col("doc_id"))
  }

  /** d15 kernel as before round 16 (no shared repartition) + its old
    * trailing sort. */
  def d15Old(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val k = 20; val maxTok = 1000000L
    val base = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
    val wins = base.where(size(col("t")) >= k)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("t")) - (k - 1)), i =>
          struct(i.as("i"),
            md5(array_join(slice(col("t"), i, lit(k)), " ")).as("h")))).as("w"))
      .select(col("doc_id"), col("w.i").as("i"), col("w.h").as("h"))
    val guardedI = when(col("i") < maxTok, col("i")).otherwise(raise_error(
      concat(lit("d15: overflow (doc_id "), col("doc_id").cast("string"),
        lit(")"))))
    val posKey = col("doc_id") * lit(maxTok) + guardedI
    val firsts = wins.groupBy(col("h")).agg(min(posKey).as("first_key"))
    val dups = wins.join(firsts, "h")
      .where(posKey =!= col("first_key"))
      .select(col("doc_id"), col("i").as("lo"), (col("i") + k).as("hi"))
    val wPrev = Window.partitionBy(col("doc_id")).orderBy(col("lo"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.partitionBy(col("doc_id")).orderBy(col("lo"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val spans = dups
      .withColumn("prev_hi", max(col("hi")).over(wPrev))
      .withColumn("is_new",
        when(col("prev_hi").isNull || col("lo") > col("prev_hi"), 1L)
          .otherwise(0L))
      .withColumn("span_id", sum(col("is_new")).over(wCum))
      .groupBy(col("doc_id"), col("span_id"))
      .agg(min(col("lo")).as("lo"), max(col("hi")).as("hi"))
    val spanArr = spans.groupBy(col("doc_id"))
      .agg(collect_list(struct(col("lo"), col("hi"))).as("spans"),
        count(lit(1)).as("n_spans"),
        sum(col("hi") - col("lo")).cast("long").as("n_removed"))
    val indexed = transform(col("t"), (tk, ix) =>
      struct(tk.as("tk"), (ix + 1).as("ix")))
    val kept = when(col("spans").isNull, col("t")).otherwise(
      transform(filter(indexed, x =>
        !exists(col("spans"), sp =>
          x("ix") >= sp("lo") && x("ix") < sp("hi"))),
        x => x("tk")))
    base.join(spanArr, Seq("doc_id"), "left")
      .select(col("doc_id"), size(col("t")).cast("long").as("n_tok"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        md5(array_join(kept, " ")).as("cleaned_md5"))
      .orderBy(col("doc_id"))
  }

  /** mm2 as before round 16: no pinned signature table (every consumer
    * re-decodes), same banding/join/verify. */
  def mm2Old(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val maxHamming = 10
    val hashed = graft.operators.Multimodal.imageVariants(spark, dir)
      .mapPartitions(_.map { case (id, payload) =>
        (id, graft.operators.Multimodal.phash64(
          graft.operators.Multimodal.decodeImage(payload))) })
    val nBands = 4
    def bandVal(ph: Long, b: Int): Int = ((ph >>> (16 * b)) & 0xFFFF).toInt
    val idx = hashed.flatMap { case (id, ph) =>
      (0 until nBands).map(b => (b, bandVal(ph, b), id, ph))
    }.toDF("band_idx", "band_key", "media_a", "ph_a")
    val prb = hashed.flatMap { case (id, ph) =>
      for {
        b <- 0 until nBands
        v = bandVal(ph, b)
        probe <- Seq(v) ++
          (0 until 16).map(i => v ^ (1 << i)) ++
          (for { i <- 0 until 16; j <- i + 1 until 16 }
            yield v ^ (1 << i) ^ (1 << j))
      } yield (b, probe, id, ph)
    }.toDF("band_idx", "band_key", "media_b", "ph_b")
    val idxCapped = graft.operators.MinHash.capBucketMembers(
      idx, Seq("band_idx", "band_key"), "media_a")
    idxCapped.hint("merge").join(prb, Seq("band_idx", "band_key"))
      .where(col("media_a") < col("media_b"))
      .select(col("media_a"), col("media_b"),
        bit_count(col("ph_a").bitwiseXOR(col("ph_b"))).cast("long").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
      .orderBy(col("media_a"), col("media_b"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions",
        "org.apache.spark.sql.graftx.GraftExtensions")
      // 64k AQE floor: engine session default (GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val pairs: Seq[(String, (SparkSession, String) => DataFrame,
        (SparkSession, String) => DataFrame)] = Seq(
      ("s5_bm25", s5Old _,
        (s: SparkSession, d: String) => graft.queries.SimilarityOps.s5Bm25(s, d)),
      ("d11_window_dedup", d11Old _,
        (s: SparkSession, d: String) => graft.queries.DedupOps.d11WindowDedup(s, d)),
      ("d15_substring_strip", d15Old _,
        (s: SparkSession, d: String) => graft.queries.DedupOps.d15SubstringStrip(s, d)),
      ("mm2_image_phash", mm2Old _,
        (s: SparkSession, d: String) =>
          graft.operators.Multimodal.imagePhashPairs(s, d)))

    def t1(f: (SparkSession, String) => DataFrame): Double = {
      val t0 = System.nanoTime()
      f(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val laps = 5
    val res = scala.collection.mutable.Map[String, (List[Double], List[Double])]()
      .withDefaultValue((Nil, Nil))
    (1 to laps).foreach { lap =>
      pairs.foreach { case (n, old, nw) =>
        val to = t1(old); val tn = t1(nw)
        val (os, ns) = res(n); res(n) = (os :+ to, ns :+ tn)
        println(f"[ab] lap $lap $n%-22s old $to%6.3f  new $tn%6.3f")
      }
    }
    println("=== medians (old -> new) ===")
    pairs.foreach { case (n, _, _) =>
      val (os, ns) = res(n)
      def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
      println(f"[ab] $n%-22s ${med(os)}%6.3f -> ${med(ns)}%6.3f  (x${med(os) / med(ns)}%.2f)")
    }
    spark.stop()
  }
}
