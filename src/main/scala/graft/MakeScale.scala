package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builds a scaled copy of the text/embedding tables for the second
  * bench scale point (the driver ships sf ≤ 0.1; scaling exponents
  * need a larger corpus).
  *
  * Each copy is re-keyed and every token gets a per-copy suffix, so
  * WITHIN-copy duplicate structure is preserved exactly while copies
  * share no tokens/shingles — pair counts and dedup work scale
  * linearly with the copy count, which is what makes the measured
  * exponent interpretable (cross-copy near-dups would add an O(c²)
  * term that says nothing about the operators). Embedding labels are
  * offset per copy for the same reason (d5 blocks by label).
  *
  * Suffixes are ALPHABETIC (`qa`, `qb`, …) so the scaled corpus keeps
  * the base corpus's character-class statistics: an earlier `_0`
  * suffix put a non-alpha char in every token, which made
  * `[^a-zA-Z ]`-style normalization regexes do real replacement work
  * only at scale and distorted the regex-heavy operators' measured
  * exponents (t4 looked super-linear purely from the corpus
  * transform).
  *
  * Usage: runMain graft.MakeScale <srcSfDir> <dstDir> <copies> [full]
  * — "full" additionally scales the relational/event tables (re-keyed,
  * events time-shifted per copy) and copies the dims through.
  */
object MakeScale {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val copies = args(2).toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val idOff = 100000000L

    def alphaSuffix(i: Int): String =
      "q" + ('a' + i / 26).toChar + ('a' + i % 26).toChar
    val docs = spark.read.parquet(s"$src/documents.parquet")
    (0 until copies).map { i =>
      docs.select(
        (col("doc_id") + lit(i * idOff)).as("doc_id"),
        array_join(transform(split(col("text"), " "),
          t => concat(t, lit(alphaSuffix(i)))), " ").as("text"),
        col("lang"),
        concat(col("source"), lit(s"_$i")).as("source"),
        col("n_chars"))
    }.reduce(_ unionByName _)
      .repartition(32, col("doc_id"))
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    (0 until copies).map { i =>
      emb.select(
        (col("vec_id") + lit(i * idOff)).as("vec_id"),
        (col("label") + lit(i * 1000)).as("label"),
        col("embedding"))
    }.reduce(_ unionByName _)
      .repartition(32, col("vec_id"))
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

    // Relational/event tables (opt-in via 4th arg "full"): fact tables
    // are re-keyed per copy; events are additionally TIME-SHIFTED one
    // year per copy and re-keyed on user_id, so sessions / as-of
    // matches / range-join pairs never cross copies — the workload
    // scales linearly by construction, which is what makes the
    // measured exponent about the operator, not the corpus transform.
    // Dimension tables (region…part) copy through unscaled: at any
    // scale the dims stay broadcast-sized, exactly like production.
    if (args.length > 3 && args(3) == "full") {
      val yearNanos = 31557600L * 1000000000L // 365.25 d — ts is epoch-nanos
      // NOTE the physical schema asymmetry this creates: the base
      // events.parquet stores ts as a parquet TIMESTAMP (nanos in the
      // round-1..4 fixtures, micros from round 5); Tables normalizes
      // either to the engine-facing epoch-nanos LongType, and writing
      // the shifted value emits plain BIGINT epoch-nanos. Spark
      // queries see the identical LongType either way (Tables passes
      // raw longs through), but scaled dirs are BENCH-ONLY inputs —
      // the DuckDB oracle (epoch_us/date_trunc on a real timestamp)
      // runs exclusively against the base sf dirs.
      val orders = spark.read.parquet(s"$src/orders.parquet")
      (0 until copies).map { i =>
        orders.withColumn("o_orderkey", col("o_orderkey") + lit(i * idOff))
      }.reduce(_ unionByName _)
        .repartition(32, col("o_orderkey"))
        .write.mode("overwrite").parquet(s"$dst/orders.parquet")

      val lineitem = spark.read.parquet(s"$src/lineitem.parquet")
      (0 until copies).map { i =>
        lineitem.withColumn("l_orderkey", col("l_orderkey") + lit(i * idOff))
      }.reduce(_ unionByName _)
        .repartition(32, col("l_orderkey"))
        .write.mode("overwrite").parquet(s"$dst/lineitem.parquet")

      val events = Tables(spark, src, "events")
      (0 until copies).map { i =>
        events.select(
          (col("event_id") + lit(i * idOff)).as("event_id"),
          (col("ts") + lit(i * yearNanos)).as("ts"),
          (col("user_id") + lit(i * idOff)).as("user_id"),
          col("event_type"), col("value"), col("props"))
      }.reduce(_ unionByName _)
        .repartition(32, col("event_id"))
        .write.mode("overwrite").parquet(s"$dst/events.parquet")

      Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
        spark.read.parquet(s"$src/$t.parquet")
          .write.mode("overwrite").parquet(s"$dst/$t.parquet")
      }
    }

    println(s"[makescale] wrote $dst at ${copies}x of $src")
    spark.stop()
  }
}
