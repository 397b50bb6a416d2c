package graft.fit

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** T14: BPE tokenizer training — the subword-vocabulary step every
  * LLM data pipeline runs before token counting, packing, or mix
  * budgeting can be denominated in model tokens (t7's regex
  * pre-tokenizer approximates this; t14 learns the actual merge
  * table). Byte-pair encoding per Sennrich et al. 2016: start from
  * characters, repeatedly merge the most frequent adjacent symbol
  * pair; encoding replays merges in learned order.
  *
  * 100 TB shape (the IVF/PQ quantizer discipline, Similarity.scala
  * `centroids`): training runs DRIVER-LOCAL on a capped keyed-digest
  * sample — xxhash64-ordered, so deterministic and corpus-size-
  * independent — because merge learning is inherently sequential
  * (each round depends on the last) and the sample bounds it to
  * O(cap) regardless of corpus size; tokenizer trainers are sampled
  * in production for exactly this reason. The APPLY side is the
  * distributed part and never touches per-occurrence work: one
  * shuffle groups the corpus to DISTINCT words with counts (Zipf:
  * distinct words ≪ running words), each distinct word is encoded
  * exactly once, and token counts re-aggregate weighted by word
  * frequency — bounded-cardinality shuffles only (|vocab| ≤
  * |alphabet| + nMerges symbols).
  *
  * Determinism: sample pinned by (seed, cap); ties in pair counts
  * break to the lexicographically smallest pair, so the merge list —
  * and therefore every encoding — is bit-stable across runs and
  * partitionings. Not SQL-expressible (iterative fixpoint training)
  * → rows-only driver check; BpeSpec asserts hand-derived merges,
  * tie-breaking, and encode/train consistency. */
object Bpe {

  val SampleDocs = 2048
  val NMerges = 200
  private val Seed = 0x7142L

  /** Merge every non-overlapping left-to-right occurrence of `pair`
    * in `syms` — used identically by training and encoding, so the
    * two can't disagree on merge application. */
  private[graft] def mergePair(syms: Vector[String], pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Learn up to `nMerges` merges from word frequencies. Stops early
    * when no adjacent pair remains. */
  private[graft] def train(wordFreq: Map[String, Long], nMerges: Int): Seq[(String, String)] = {
    var seqs: Map[Vector[String], Long] = wordFreq
      .groupMapReduce { case (w, _) => w.map(_.toString).toVector } { case (_, f) => f } (_ + _)
    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < nMerges && !done) {
      val counts = collection.mutable.HashMap.empty[(String, String), Long]
      seqs.foreach { case (s, f) =>
        var i = 0
        while (i + 1 < s.length) {
          counts.updateWith((s(i), s(i + 1)))(c => Some(c.getOrElse(0L) + f)); i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // highest count; ties break to the lexicographically smallest
        // pair — the determinism pin
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        seqs = seqs.groupMapReduce { case (s, _) => mergePair(s, best) } (_._2) (_ + _)
        round += 1
      }
    }
    merges.result()
  }

  /** Encode one word by replaying merges in learned order: always
    * apply the lowest-rank pair present (the standard BPE encode). */
  private[graft] def encode(word: String, rank: Map[(String, String), Int]): Vector[String] = {
    var syms = word.map(_.toString).toVector
    var continue = syms.length >= 2
    while (continue) {
      var bestRank = Int.MaxValue
      var bestPair: (String, String) = null
      var i = 0
      while (i + 1 < syms.length) {
        val p = (syms(i), syms(i + 1))
        val r = rank.getOrElse(p, Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPair = p }
        i += 1
      }
      if (bestPair == null) continue = false
      else {
        syms = mergePair(syms, bestPair)
        if (syms.length < 2) continue = false
      }
    }
    syms
  }

  /** The t14 kernel over an arbitrary (doc_id, text) relation —
    * spec-testable with hand-derivable corpora. Output: the learned
    * vocabulary as (token, n_occurrences over the FULL corpus,
    * merge_rank −1 for single characters), ordered by count desc then
    * token. */
  /** Shared trainer: capped keyed-digest sample → driver-local merge
    * learning → broadcast (pair-rank, merged-token-rank) maps.
    * Bounded by the cap, independent of corpus size. */
  private def trainBroadcast(docs: DataFrame, sampleDocs: Int,
      nMerges: Int): (org.apache.spark.broadcast.Broadcast[Map[(String, String), Int]],
        org.apache.spark.broadcast.Broadcast[Map[String, Int]]) = {
    val s = docs.sparkSession
    import s.implicits._
    val sampleTexts: Array[String] = docs
      .withColumn("__h", xxhash64(col("doc_id"), lit(Seed)))
      .orderBy(col("__h")).limit(sampleDocs)
      .select(col("text")).as[String].collect()
    val wordFreq: Map[String, Long] = sampleTexts.iterator
      .flatMap(_.split(" ").iterator).filter(_.nonEmpty)
      .foldLeft(Map.empty[String, Long].withDefaultValue(0L)) {
        (m, w) => m.updated(w, m(w) + 1L)
      }
    require(wordFreq.nonEmpty, "bpe: empty sample — no text to train on")
    val merges = train(wordFreq, nMerges)
    val rank: Map[(String, String), Int] = merges.zipWithIndex.toMap
    val mergedRank: Map[String, Int] =
      merges.zipWithIndex.map { case ((a, b), i) => (a + b, i) }.toMap
    (s.sparkContext.broadcast(rank), s.sparkContext.broadcast(mergedRank))
  }

  def bpeVocabOf(docs: DataFrame, sampleDocs: Int, nMerges: Int): DataFrame = {
    val s = docs.sparkSession
    val (rankB, mergedB) = trainBroadcast(docs, sampleDocs, nMerges)

    // distributed apply: shuffle to DISTINCT words once, encode each
    // exactly once, re-aggregate token counts weighted by word count
    val words = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    val encodeTok = udf((w: String) => encode(w, rankB.value))
    val rankOf = udf((t: String) => mergedB.value.getOrElse(t, -1))
    words
      .select(explode(encodeTok(col("w"))).as("token"), col("n"))
      .groupBy(col("token")).agg(sum(col("n")).as("n_occurrences"))
      .select(col("token"), col("n_occurrences"),
        rankOf(col("token")).as("merge_rank"))
      .orderBy(col("n_occurrences").desc, col("token"))
  }

  /** Rows-only query `t14_bpe_train`. */
  def t14BpeTrain(s: SparkSession, dir: String): DataFrame =
    bpeVocabOf(Tables(s, dir, "documents").select(col("doc_id"), col("text")),
      SampleDocs, NMerges)

  /** T19: the trained tokenizer APPLIED per document — the token
    * budget every pretraining pipeline actually bills by (t7's regex
    * count is the model-free approximation; this is the real subword
    * count under the corpus's own learned merges). Encode-once
    * discipline: the UDF encodes each DISTINCT word exactly once
    * (vocab-sized work however large the corpus), and per-doc counts
    * come from a corpus-sized equi-join on the short word key plus
    * one doc_id agg. Totality: word-less docs keep a row (0, 0).
    * Rows-only (iterative merge learning has no SQL twin); BpeSpec
    * pins encode losslessness and the t14 cross-identity — summed
    * t19 token counts equal t14's summed vocabulary occurrences. */
  def bpeEncodeOf(docs: DataFrame, sampleDocs: Int, nMerges: Int): DataFrame = {
    val s = docs.sparkSession
    val (rankB, _) = trainBroadcast(docs, sampleDocs, nMerges)
    val tok = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
    val nTokUdf = udf((w: String) => encode(w, rankB.value).length)
    val wordCost = tok.select(col("w")).distinct()
      .withColumn("n_tok", nTokUdf(col("w")))
    val per = tok.join(wordCost, "w")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_tok")).as("n_bpe_tokens"))
    docs.select(col("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"),
        round(coalesce(col("n_bpe_tokens"), lit(0L))
          * lit(1e6) / greatest(coalesce(col("n_words"), lit(0L)), lit(1L)), 0)
          .cast("long").as("tokens_per_word_micro"))
      .orderBy(col("doc_id"))
  }

  /** Rows-only query `t19_bpe_encode`. */
  def t19BpeEncode(s: SparkSession, dir: String): DataFrame =
    bpeEncodeOf(Tables(s, dir, "documents").select(col("doc_id"), col("text")),
      SampleDocs, NMerges)
}
