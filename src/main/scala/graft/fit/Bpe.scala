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
  * partitionings. The t14/t19 ENTRIES are hash-level oracles since
  * r8 (deterministic md5-sampled twins + bounded unrolled-round SQL,
  * see the r8 block below); this 200-merge xxhash64-sampled surface
  * stays the production tier, spec-pinned by BpeSpec. */
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

  // ------------------------------------------------------------------
  // r8 deterministic twins: the t14/t19 oracle conversion.
  //
  // What blocked a BPE oracle was never the algorithm — it was (a)
  // the xxhash64 sample key (absent in DuckDB) and (b) "iterative
  // fixpoint has no SQL twin". (a) falls to an md5-keyed sample; (b)
  // falls to the IntKmeans discipline: the loop is BOUNDED (merge
  // learning by nMerges; encoding by the max word length, 8 in the
  // fixtures and guarded loudly), so each round unrolls into
  // MATERIALIZED CTEs — pair-count → arg-best → greedy non-overlap
  // merge (the chain-parity rule: within a run of consecutive
  // candidate positions, keep the even offsets — exactly mergePair's
  // left-to-right greed) → renumber. Every decision is integer
  // counting, md5 ordering, or ASCII string comparison (the sample
  // filters to printable ASCII, so Scala's UTF-16 ordering and
  // DuckDB's UTF-8 binary collation agree), so the learned merge
  // table and every token count replay bit-for-bit.
  // ------------------------------------------------------------------

  val DetSampleDocs = 256
  val DetMerges = 12
  /** Encode fixpoint bound: ≥ max word length − 1 (fixtures: 8);
    * encodeBounded fails loudly if a word needs more rounds, which
    * would mean the SQL twin truncated. */
  val DetEncodeRounds = 8

  /** md5-keyed, ASCII-filtered training sample word frequencies —
    * deterministic and engine-portable (see block comment). */
  private[graft] def detWordFreq(docs: DataFrame,
      sampleDocs: Int): Map[String, Long] = {
    val s = docs.sparkSession
    import s.implicits._
    val texts = docs
      .withColumn("__h", md5(concat(lit("bpe:"), col("doc_id").cast("string"))))
      .orderBy(col("__h")).limit(sampleDocs)
      .select(col("text")).as[String].collect()
    texts.iterator.flatMap(_.split(" ").iterator)
      .filter(w => w.nonEmpty && w.forall(c => c >= 0x21 && c <= 0x7e))
      .foldLeft(Map.empty[String, Long].withDefaultValue(0L)) {
        (m, w) => m.updated(w, m(w) + 1L)
      }
  }

  /** encode() with a loud round bound — the Spark side of the t19
    * oracle must fail rather than silently diverge from the
    * DetEncodeRounds-deep SQL unroll. */
  private[graft] def encodeBounded(word: String,
      rank: Map[(String, String), Int], maxRounds: Int): Vector[String] = {
    // the SQL twin symbolizes by CODEPOINT (DuckDB substr/length) while
    // this side symbolizes by UTF-16 unit — identical only for ASCII,
    // and unlike the training sample the encode pass sees EVERY corpus
    // word. Fail loudly instead of silently diverging on a surrogate
    // pair (same discipline as the round bound below).
    require(word.forall(c => c < 0x80),
      s"bpe: non-ASCII word '$word' - the unrolled SQL twin counts " +
        "codepoints, the JVM side UTF-16 units; the t19 oracle only " +
        "holds for all-ASCII corpora")
    var syms = word.map(_.toString).toVector
    var rounds = 0
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
        rounds += 1
        require(rounds <= maxRounds,
          s"bpe: word '$word' needs > $maxRounds encode rounds - " +
            "the SQL twin's unroll depth (DetEncodeRounds) is too small")
        syms = mergePair(syms, bestPair)
        if (syms.length < 2) continue = false
      }
    }
    syms
  }

  /** Oracle query `t14_bpe_train` (hash-level since r8): the learned
    * merge TABLE — (merge_rank, lhs, rhs, merged) — from the
    * deterministic sample; the merge list IS the trained tokenizer,
    * and it replays in SQL via the unrolled twin (oracleT14). The
    * 200-merge xxhash64-sampled vocabulary surface stays the
    * production tier (bpeVocabOf, spec-pinned). */
  def t14BpeTrain(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wf = detWordFreq(
      Tables(s, dir, "documents").select(col("doc_id"), col("text")),
      DetSampleDocs)
    require(wf.nonEmpty, "bpe: empty sample - no text to train on")
    train(wf, DetMerges).zipWithIndex
      .map { case ((a, b), i) => (i, a, b, a + b) }
      .toDF("merge_rank", "lhs", "rhs", "merged")
      .orderBy(col("merge_rank"))
  }

  /** Production-tier vocabulary surface (the former t14 entry shape). */
  def t14BpeVocab(s: SparkSession, dir: String): DataFrame =
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

  /** Oracle query `t19_bpe_encode` (hash-level since r8): per-doc
    * subword token counts under the deterministic 12-merge tokenizer.
    * Same distributed shape as bpeEncodeOf (encode each DISTINCT word
    * once, corpus-sized equi-join on the word key, one doc_id agg);
    * the trainer is detWordFreq + train, the encoder encodeBounded —
    * both replayed in SQL by oracleT19's train + encode unrolls. The
    * 200-merge production tier stays as bpeEncodeOf. */
  def t19BpeEncode(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    val wf = detWordFreq(docs, DetSampleDocs)
    require(wf.nonEmpty, "bpe: empty sample - no text to train on")
    val rank = train(wf, DetMerges).zipWithIndex.toMap
    val rankB = docs.sparkSession.sparkContext.broadcast(rank)
    val tok = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
    val nTokUdf = udf((w: String) =>
      encodeBounded(w, rankB.value, DetEncodeRounds).length)
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

  // ------------------------------------------------------------------
  // DuckDB SQL twins (generated: one CTE block per unrolled round)
  // ------------------------------------------------------------------

  /** Training CTE chain: samp → wf → seq0 → (pc/best/cand/keep/seq)×R.
    * seq$r carries (word, f, pos, sym) with dense 1-based positions. */
  private def trainSql(nMerges: Int, sampleDocs: Int): String = {
    val base =
      s"""samp AS (
         | SELECT text FROM documents
         | ORDER BY md5('bpe:' || doc_id) LIMIT $sampleDocs),
         |words0 AS (
         | SELECT unnest(string_split(text, ' ')) AS word FROM samp),
         |wf AS MATERIALIZED (
         | SELECT word, COUNT(*)::BIGINT AS f FROM words0
         | WHERE length(word) > 0
         |  AND regexp_matches(word, '^[\\x21-\\x7e]+$$')
         | GROUP BY word),
         |seq0a AS (
         | SELECT word, f,
         |  unnest(generate_series(1, length(word))) AS pos
         | FROM wf),
         |seq0 AS MATERIALIZED (
         | SELECT word, f, pos, substr(word, pos, 1) AS sym FROM seq0a)""".stripMargin
    val rounds = (0 until nMerges).map { r =>
      s"""pc$r AS (
         | SELECT a.sym AS x, b.sym AS y, SUM(a.f) AS c
         | FROM seq$r a JOIN seq$r b
         |  ON b.word = a.word AND b.pos = a.pos + 1
         | GROUP BY 1, 2),
         |best$r AS (SELECT x, y FROM pc$r ORDER BY c DESC, x, y LIMIT 1),
         |cand$r AS (
         | SELECT s.word, s.pos
         | FROM seq$r s JOIN seq$r t
         |  ON t.word = s.word AND t.pos = s.pos + 1
         | JOIN best$r b ON s.sym = b.x AND t.sym = b.y),
         |keep$r AS (
         | SELECT word, pos FROM (
         |  SELECT word, pos, pos - MIN(pos) OVER (PARTITION BY word, grp)
         |    AS off
         |  FROM (
         |   SELECT word, pos,
         |    pos - ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS grp
         |   FROM cand$r) g) z
         | WHERE off % 2 = 0),
         |seq${r + 1} AS MATERIALIZED (
         | SELECT word, f,
         |  ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS pos, sym
         | FROM (
         |  SELECT s.word, s.f, s.pos,
         |   CASE WHEN k.pos IS NOT NULL THEN s.sym || nx.sym
         |    ELSE s.sym END AS sym
         |  FROM seq$r s
         |  LEFT JOIN keep$r k ON k.word = s.word AND k.pos = s.pos
         |  LEFT JOIN keep$r kp ON kp.word = s.word AND kp.pos = s.pos - 1
         |  LEFT JOIN seq$r nx ON nx.word = s.word AND nx.pos = s.pos + 1
         |  WHERE kp.pos IS NULL) z)""".stripMargin
    }.mkString(",\n")
    val mergeRows = (0 until nMerges).map { r =>
      s"SELECT $r AS merge_rank, x, y FROM best$r"
    }.mkString("\n  UNION ALL ")
    s"""$base,
       |$rounds,
       |mr AS MATERIALIZED (
       |  $mergeRows)""".stripMargin
  }

  /** Complete t14 oracle: the merge table. */
  def oracleT14: String =
    s"""WITH ${trainSql(DetMerges, DetSampleDocs)}
       |SELECT merge_rank, x AS lhs, y AS rhs, x || y AS merged
       |FROM mr ORDER BY merge_rank""".stripMargin

  /** Complete t19 oracle: train unroll (mr) + encode unroll over the
    * full corpus's distinct words + per-doc re-aggregation. Each
    * encode round merges every word's LOWEST-RANK present pair
    * (greedy non-overlap) — one round per CTE block, DetEncodeRounds
    * deep; converged words pass through unchanged. */
  def oracleT19: String = {
    val enc = (0 until DetEncodeRounds).map { e =>
      s"""erank$e AS (
         | SELECT s.word, MIN(m.merge_rank) AS rk
         | FROM eseq$e s JOIN eseq$e t
         |  ON t.word = s.word AND t.pos = s.pos + 1
         | JOIN mr m ON m.x = s.sym AND m.y = t.sym
         | GROUP BY s.word),
         |ecand$e AS (
         | SELECT s.word, s.pos
         | FROM eseq$e s JOIN eseq$e t
         |  ON t.word = s.word AND t.pos = s.pos + 1
         | JOIN erank$e r ON r.word = s.word
         | JOIN mr m ON m.merge_rank = r.rk
         |  AND m.x = s.sym AND m.y = t.sym),
         |ekeep$e AS (
         | SELECT word, pos FROM (
         |  SELECT word, pos, pos - MIN(pos) OVER (PARTITION BY word, grp)
         |    AS off
         |  FROM (
         |   SELECT word, pos,
         |    pos - ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS grp
         |   FROM ecand$e) g) z
         | WHERE off % 2 = 0),
         |eseq${e + 1} AS MATERIALIZED (
         | SELECT word,
         |  ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS pos, sym
         | FROM (
         |  SELECT s.word, s.pos,
         |   CASE WHEN k.pos IS NOT NULL THEN s.sym || nx.sym
         |    ELSE s.sym END AS sym
         |  FROM eseq$e s
         |  LEFT JOIN ekeep$e k ON k.word = s.word AND k.pos = s.pos
         |  LEFT JOIN ekeep$e kp ON kp.word = s.word AND kp.pos = s.pos - 1
         |  LEFT JOIN eseq$e nx ON nx.word = s.word AND nx.pos = s.pos + 1
         |  WHERE kp.pos IS NULL) z)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${trainSql(DetMerges, DetSampleDocs)},
       |cw AS (
       | SELECT doc_id, unnest(string_split(text, ' ')) AS w
       | FROM documents),
       |cwf AS MATERIALIZED (
       | SELECT w AS word FROM cw WHERE length(w) > 0 GROUP BY 1),
       |eseq0a AS (
       | SELECT word, unnest(generate_series(1, length(word))) AS pos
       | FROM cwf),
       |eseq0 AS MATERIALIZED (
       | SELECT word, pos, substr(word, pos, 1) AS sym FROM eseq0a),
       |$enc,
       |wtok AS MATERIALIZED (
       | SELECT word, COUNT(*)::BIGINT AS n_tok
       | FROM eseq$DetEncodeRounds GROUP BY word),
       |perdoc AS (
       | SELECT c.doc_id, COUNT(*)::BIGINT AS n_words,
       |  SUM(t.n_tok)::BIGINT AS n_bpe_tokens
       | FROM cw c JOIN wtok t ON t.word = c.w
       | WHERE length(c.w) > 0
       | GROUP BY c.doc_id)
       |SELECT d.doc_id,
       | COALESCE(p.n_words, 0) AS n_words,
       | COALESCE(p.n_bpe_tokens, 0) AS n_bpe_tokens,
       | CAST(ROUND(COALESCE(p.n_bpe_tokens, 0) * 1e6
       |   / GREATEST(COALESCE(p.n_words, 0), 1), 0) AS BIGINT)
       |  AS tokens_per_word_micro
       |FROM documents d LEFT JOIN perdoc p USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }
}
