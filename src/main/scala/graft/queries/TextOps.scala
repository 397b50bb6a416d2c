package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Text-analysis operators for a large-scale training-data pipeline:
  * token stats, quality scoring, language-ID heuristic, document
  * fingerprinting. All pure column expressions (whole-stage codegen,
  * no UDFs) — at 100 TB these run as a single scan with no shuffle
  * except the final order (which exists only for oracle determinism).
  */
object TextOps {

  private def toks: Column = split(col("text"), " ")

  /** Sort FIRST, project AFTER: a trailing `.orderBy` above an
    * expensive projection makes the range-partition SAMPLING job
    * evaluate the whole projection a second time (measured 2× on the
    * regex/hash queries at the 25× scale point). Sorting the narrow
    * (doc_id, …) scan and projecting on top evaluates each expression
    * exactly once; Project is order-preserving, so output order and
    * values — and every oracle hash — are unchanged. */
  private def sortedDocs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .orderBy(col("doc_id")) // the range exchange also spreads the single-split file

  /** Per-doc token statistics (token counting via whitespace split). */
  def t1TokenStats(s: SparkSession, dir: String): DataFrame =
    sortedDocs(s, dir)
      .withColumn("n_tok", size(toks).cast("long"))
      .withColumn("n_nospace", length(regexp_replace(col("text"), " ", "")).cast("long"))
      .select(col("doc_id"), col("n_tok"), col("n_nospace"),
        (col("n_nospace") / col("n_tok")).as("avg_tok_len"))

  /** BPE-style pre-tokenizer regex (the GPT-2 pattern's RE2-safe
    * core: a token is an optionally-space-prefixed letter run, digit
    * run, or punctuation run, else a space run). Kept to constructs
    * Java regex and RE2 treat identically (no lookaround, no
    * contraction alternates) so the DuckDB oracle is byte-equivalent. */
  private val bpeRe = " ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+| +"

  /** T7: token counting under the BPE-ish regex vs the whitespace
    * split — subword-adjacent counts are what an LLM data pipeline
    * budgets by (whitespace counts under-estimate punctuation-heavy
    * and digit-heavy documents). Pure codegen expressions. */
  def t7BpeTokens(s: SparkSession, dir: String): DataFrame =
    sortedDocs(s, dir)
      .withColumn("n_tok_ws", size(toks).cast("long"))
      .withColumn("n_tok_bpe",
        size(regexp_extract_all(col("text"), lit(bpeRe), lit(0))).cast("long"))
      .select(col("doc_id"), col("n_tok_ws"), col("n_tok_bpe"),
        round(col("n_tok_bpe").cast("double") / col("n_tok_ws"), 6)
          .as("bpe_per_ws"))

  private val stopwords = Seq("the", "a", "of", "and", "to", "in")

  /** The t2/t13 stopword set, exposed for fixture builders (round 16:
    * MakeScale preserves these verbatim so quality gates see a real
    * stop-hit signal on scaled corpora). */
  private[graft] def t13Stopwords: Seq[String] = stopwords

  /** The t2 quality heuristic over a `text` column — (stop_ratio,
    * quality) as unrounded expressions. Single source of truth:
    * `fit.QualityModel`'s weak labels are DOCUMENTED as "the t2
    * heuristic ≥ 0.3", so they must share this definition rather than
    * copy it. */
  private[graft] def qualityParts: (Column, Column) = {
    val nTok = size(toks).cast("double")
    val stopHits = size(filter(toks,
      t => stopwords.map(w => t === lit(w)).reduce(_ || _))).cast("double")
    val stopRatio = stopHits / nTok
    val lenScore = least(nTok / lit(100.0), lit(1.0))
    (stopRatio, stopRatio * lit(0.5) + lenScore * lit(0.5))
  }

  /** The t2 kernel over an arbitrary `(doc_id, text)` relation:
    * stopword ratio + length saturation, binned by the shared rule.
    * The facade (api.Graft.text.qualityScore) delegates here. */
  def qualityScoreOf(docs: DataFrame): DataFrame = {
    val (stopRatio, quality) = qualityParts
    val score = round(quality, 6)
    docs.select(col("doc_id"), round(stopRatio, 6).as("stop_ratio"),
      score.as("quality"),
      when(score >= 0.4, "good").when(score >= 0.25, "fair")
        .otherwise("low").as("quality_bin"))
  }

  /** Quality scoring: stopword ratio + length saturation, binned. */
  def t2QualityScore(s: SparkSession, dir: String): DataFrame =
    qualityScoreOf(sortedDocs(s, dir))

  /** M14 quality-stratified mix report — the "what does my corpus
    * look like through the quality lens" audit run BEFORE committing
    * to filter thresholds: per (source, t2 quality bin) document and
    * token inventories with global token shares. Reuses t2's shared
    * quality expression and bin rule (single source of truth — the
    * same discipline that ties o10 and m10's weak labels to t2), so
    * the report can never drift from the score the filters actually
    * apply. One (source, bin) agg over the corpus scan; the total
    * rides a broadcast single-row join. */
  def m14QualityMixReport(s: SparkSession, dir: String): DataFrame = {
    val (_, quality) = qualityParts
    val score = round(quality, 6)
    val binned = Tables(s, dir, "documents")
      .select(col("source"), size(toks).cast("long").as("n_tok"),
        when(score >= 0.4, "good").when(score >= 0.25, "fair")
          .otherwise("low").as("quality_bin"))
    val agg = binned.groupBy(col("source"), col("quality_bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
    val tot = agg.agg(sum(col("n_tokens")).as("tot"))
    agg.crossJoin(broadcast(tot))
      .select(col("source"), col("quality_bin"), col("n_docs"),
        col("n_tokens"),
        round(col("n_tokens") * lit(1e6) / col("tot"), 0).cast("long")
          .as("share_ppm"))
  }

  /** O10 quality-weighted Bernoulli sampling — the curation move
    * between hard gates (t13 keep/drop) and uniform sampling (o6):
    * every document is kept with probability equal to its t2 quality
    * score, so low-quality mass is down-weighted without a cliff (the
    * soft-filtering discipline of DCLM/FineWeb ablations). The keep
    * test is PURE INTEGER: quality becomes micro-units
    * (⌊q·10⁶+0.5⌋) and compares against an engine-exact affine
    * digest of doc_id (Numerical-Recipes LCG constants, distinct
    * from m11's pair so mix sampling and quality sampling stay
    * independent) — the m11 discipline, so Spark and the oracle keep
    * the SAME documents bit-for-bit. Deliberately NO round(q, 6)
    * before scaling: round is the one step the engines implement
    * differently (BigDecimal HALF_UP vs double arithmetic); every
    * remaining op (÷, ×, +, LEAST, floor) is correctly-rounded IEEE
    * on identical inputs, so p_micro is bit-identical by
    * construction. One codegen scan; the only shuffle is the
    * determinism sort. */
  def o10WeightedSample(s: SparkSession, dir: String): DataFrame = {
    val (_, quality) = qualityParts
    val pMicro = floor(quality * lit(1000000L) + lit(0.5)).cast("long")
    val digest = pmod(pmod(col("doc_id") * lit(1664525L) + lit(1013904223L),
      lit(2147483647L)), lit(1000000L))
    sortedDocs(s, dir)
      .select(col("doc_id"), col("source"), pMicro.as("p_micro"),
        digest.as("digest"), (digest < pMicro).as("keep"))
  }

  /** T15 corpus-health report — the Zipf/vocabulary dashboard a data
    * pipeline checks before training (Heaps/Zipf diagnostics catch
    * boilerplate floods and tokenizer mismatches long before loss
    * curves do): per source — token mass, vocabulary size, type-token
    * ratio, top-1 token share, and the Zipf slope (least-squares of
    * ln freq on ln rank; a healthy natural-language corpus sits near
    * −1). The corpus collapses in the (source, token) count; ranking
    * and the regression run on the VOCABULARY-bounded relation
    * (Heaps' law: vocab grows ≪ corpus), windows keyed by source. */
  def t15Zipf(s: SparkSession, dir: String): DataFrame = {
    val tok = Tables(s, dir, "documents")
      .select(col("source"), explode(toks).as("token"))
      .where(length(col("token")) > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("n").desc, col("token"))
    tok.groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(w))
      .groupBy(col("source"))
      .agg(
        sum(col("n")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        round(count(lit(1)).cast("double") / sum(col("n")), 6)
          .as("type_token_ratio"),
        round(max(when(col("rank") === 1, col("n"))).cast("double")
          / sum(col("n")), 6).as("top1_share"),
        round(expr("regr_slope(ln(n), ln(rank))"), 6).as("zipf_slope"))
  }

  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "die", "und", "nicht"),
    "fr" -> Seq("le", "la", "et", "les"),
    "es" -> Seq("el", "los", "que", "y"))

  /** Language-ID n-gram/stopword heuristic, reported as a confusion
    * matrix against the labelled `lang` column. */
  def t3LangId(s: SparkSession, dir: String): DataFrame = {
    val hits = langMarkers.map { case (l, ws) =>
      l -> size(filter(toks, t => ws.map(w => t === lit(w)).reduce(_ || _)))
    }
    val Seq(en, de, fr, es) = hits.map(_._2)
    val pred = when(en > 0 && en >= de && en >= fr && en >= es, "en")
      .when(de > 0 && de >= fr && de >= es, "de")
      .when(fr > 0 && fr >= es, "fr")
      .when(es > 0, "es")
      .otherwise("unknown")
    Tables(s, dir, "documents")
      .withColumn("pred_lang", pred)
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
  }

  /** Document fingerprints: raw, normalized, and order-invariant
    * bag-of-words (the D1 content-hash generalized to text;
    * ref: database/active.py:181–184). */
  def t4Fingerprint(s: SparkSession, dir: String): DataFrame =
    sortedDocs(s, dir)
      .select(col("doc_id"),
        md5(col("text")).as("fp_raw"),
        // native byte-filter ≡ regexp_replace(text, "[^a-zA-Z ]", "")
        // (graftx.KeepAlphaSpace scaladoc has the equivalence proof;
        // the DuckDB oracle keeps the regex form and hash-matches)
        md5(lower(org.apache.spark.sql.graftx.KeepAlphaSpace
          .keepAlphaSpace(col("text")))).as("fp_norm"),
        md5(array_join(array_sort(array_distinct(toks)), " ")).as("fp_bag"))

  /** T5 repetition / boilerplate signal (the Gopher/C4-style quality
    * gate): duplicate word-3-gram fraction and duplicate-token
    * fraction per document. High values = templated or repetitive
    * text a curation pipeline drops. Pure codegen expressions —
    * historically a per-row UDF (the interpreted-lambda trade); the
    * native graftx.Shingles kernel made the whole thing
    * built-ins-only, identical outputs (oracle hash-matches). */
  def t5Repetition(s: SparkSession, dir: String): DataFrame = {
    val grams = org.apache.spark.sql.graftx.Shingles.shingles(toks, 3)
    val ng = size(grams)
    val dupG = when(ng > 0,
      lit(1.0) - size(array_distinct(grams)).cast("double") / ng)
      .otherwise(0.0)
    val nt = size(toks)
    val dupT = when(nt > 0,
      lit(1.0) - size(array_distinct(toks)).cast("double") / nt)
      .otherwise(0.0)
    sortedDocs(s, dir)
      .select(col("doc_id"),
        ng.cast("long").as("n_grams"),
        round(dupG, 6).as("dup_gram_frac"),
        round(dupT, 6).as("dup_tok_frac"))
  }

  /** T6 text normalization/cleaning (the C4-style canonicalization
    * pass run before dedup and tokenization): lowercase, strip
    * non-printable/control characters, collapse whitespace runs, trim.
    * Pure codegen'd column expressions; the cleaned text feeds the
    * same fingerprint as t4, so normalization-equivalent docs collide. */
  def t6Normalize(s: SparkSession, dir: String): DataFrame = {
    val cleaned = trim(regexp_replace(regexp_replace(
      lower(col("text")),
      "[\\p{Cntrl}]", ""), // control chars out
      " {2,}", " ")) // collapse space runs
    sortedDocs(s, dir)
      .select(col("doc_id"),
        cleaned.as("clean_text"),
        (cleaned =!= col("text")).as("changed"),
        md5(cleaned).as("clean_fp"))
  }

  /** T8 PII redaction (the scrub pass a curation pipeline runs before
    * anything leaves the raw zone): emails, IPv4s, and phone-shaped
    * number runs replaced by typed placeholder tags, plus a per-doc
    * redaction count for audit. Patterns are kept to constructs Java
    * regex and RE2 treat identically ([0-9] classes, no lookaround,
    * ASCII \\b) so the DuckDB oracle is byte-equivalent. Pure codegen
    * expressions — single scan, no shuffle. */
  private[queries] val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
  private[queries] val ipRe = "\\b[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}\\b"
  private[queries] val phoneRe = "\\+[0-9]{7,15}|\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  /** The redaction projection over any text column (spec-testable on
    * synthetic fixtures; t8 applies it to the documents table). */
  def redact(text: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(
      text, emailRe, "<EMAIL>"), ipRe, "<IP>"), phoneRe, "<PHONE>")

  def redactCount(text: Column): Column =
    (size(regexp_extract_all(text, lit(emailRe), lit(0))) +
      size(regexp_extract_all(text, lit(ipRe), lit(0))) +
      size(regexp_extract_all(text, lit(phoneRe), lit(0)))).cast("long")

  def t8PiiRedact(s: SparkSession, dir: String): DataFrame =
    sortedDocs(s, dir)
      .select(col("doc_id"), redact(col("text")).as("redacted_text"),
        redactCount(col("text")).as("n_redactions"))

  /** T9 vocabulary construction: token → document frequency (docs
    * containing it) and collection frequency (total occurrences), top
    * 50 by df with a deterministic token tie-break. Two partial-agg
    * shuffles (doc×token, then token) — the classic distributed
    * wordcount shape; the result is vocab-sized however big the
    * corpus is. */
  def t9VocabDf(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"), explode(toks).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
      .orderBy(col("df").desc, col("token"))
      .limit(50)

  /** T10 per-document tf-idf weight (the quality/importance score a
    * training-mix sampler keys on). Determinism across engines: idf is
    * quantized to integer micro-units — idf_q = round(1e6·ln(N/df)) —
    * so the per-doc score Σ tf·idf_q is pure integer arithmetic and
    * immune to float summation order; a 1-ulp libm ln() difference
    * could only matter exactly on a .5 boundary. N arrives as a
    * broadcast single-row aggregate (lazy — no driver count at build
    * time). */
  def t10TfIdf(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val tf = docs
      .select(col("doc_id"), explode(toks).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    tf.join(dfreq, "token") // token side is vocab-sized; AQE broadcasts it
      .crossJoin(broadcast(n))
      .withColumn("idf_q",
        round(log(col("n_docs").cast("double") / col("df")) * 1e6, 0)
          .cast("long"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf") * col("idf_q")).as("score_micro"))
  }

  /** T10 with the min-df MODEL CAP (opt-in scale path): tokens seen
    * in fewer than `minDf` documents are dropped from the idf model
    * table before the scoring join. This is real LM-scoring practice
    * (a vocabulary floor), and it is what keeps the model side
    * broadcast-sized as the corpus grows: the UNCAPPED model table
    * tracks raw vocab — which the MakeScale suffix construction
    * multiplies by the copy count, the traced cause of t10/t11's
    * ~0.55 measured exponents — while the capped table tracks the
    * head of the Zipf curve, which saturates. Docs whose every token
    * is below the floor score 0 (kept total via left join — a
    * sampler needs a row per doc). */
  def t10TfIdfCapped(s: SparkSession, dir: String): DataFrame =
    tfidfCappedOf(Tables(s, dir, "documents"), minDf = 5L)

  /** The capped-t10 kernel (spec-testable; `minDf = 1` degenerates to
    * t10's semantics plus zero-rows for token-less docs). */
  def tfidfCappedOf(docs: DataFrame, minDf: Long): DataFrame = {
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val tf = docs
      .select(col("doc_id"), explode(toks).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      .where(col("df") >= minDf)
    val scored = tf.join(dfreq, "token")
      .crossJoin(broadcast(n))
      .withColumn("idf_q",
        round(log(col("n_docs").cast("double") / col("df")) * 1e6, 0)
          .cast("long"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf") * col("idf_q")).as("score_micro"))
    docs.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("score_micro"), lit(0L)).as("score_micro"))
  }

  /** T11 bigram-LM quality score — the CCNet-style perplexity filter
    * with the LM estimated from the corpus itself (no external model
    * exists in this environment, and ESTIMATE-then-SCORE is the real
    * pipeline's shape anyway: counts are one aggregation pass over
    * the corpus, scoring is a join against the vocab²-sized model
    * table): per-doc cross-entropy under the MLE bigram model,
    * −avg ln(c(w1,w2)/c(w1·)). High xent = improbable token
    * transitions = the docs a perplexity gate drops. Determinism
    * across engines: per-bigram log-probs quantize to integer
    * micro-nats (the t10 discipline) so the per-doc sum is integer
    * arithmetic; the final divide is one correctly-rounded double op
    * mirrored operation-for-operation in the oracle. */
  def t11LmXent(s: SparkSession, dir: String): DataFrame =
    lmXentOf(Tables(s, dir, "documents"))

  /** The t11 kernel over an arbitrary (doc_id, text) relation —
    * spec-testable with a hand-computable corpus. */
  def lmXentOf(docs: DataFrame): DataFrame = {
    val bi = docs
      .select(col("doc_id"),
        explode(org.apache.spark.sql.graftx.Shingles.shingles(toks, 2))
          .as("bigram"))
    val cb = bi.groupBy(col("bigram")).agg(count(lit(1)).as("cb"))
    val c1 = cb
      .groupBy(substring_index(col("bigram"), " ", 1).as("w1"))
      .agg(sum(col("cb")).as("c1"))
    val lp = cb
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .join(c1, "w1") // vocab²-sized model table; AQE broadcasts it
      .select(col("bigram"),
        round(log(col("cb").cast("double") / col("c1")) * 1e6, 0)
          .cast("long").as("lp_q"))
    bi.join(lp, "bigram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp_q")).as("lp_sum"))
      .select(col("doc_id"), col("n_bigrams"),
        round(-col("lp_sum").cast("double") / col("n_bigrams") / 1e6, 6)
          .as("xent_nats"))
  }

  /** T11 with the min-count MODEL CAP (opt-in scale path, the t10
    * discipline): bigrams seen fewer than `minCount` times are
    * dropped from the log-prob model table — marginals c(w1·) stay
    * the TRUE totals over all bigrams (the standard formulation:
    * capping prunes the numerator table, not the denominator mass).
    * Out-of-model bigrams simply don't score; per-doc xent averages
    * over the scored bigrams (`n_scored`), and all-OOV docs report
    * (0, 0.0) — kept total via left join. */
  def t11LmXentCapped(s: SparkSession, dir: String): DataFrame =
    lmXentCappedOf(Tables(s, dir, "documents"), minCount = 3L)

  /** The capped-t11 kernel (spec-testable with a hand corpus). */
  def lmXentCappedOf(docs: DataFrame, minCount: Long): DataFrame = {
    val bi = docs
      .select(col("doc_id"),
        explode(org.apache.spark.sql.graftx.Shingles.shingles(toks, 2))
          .as("bigram"))
    val cbAll = bi.groupBy(col("bigram")).agg(count(lit(1)).as("cb"))
    val c1 = cbAll
      .groupBy(substring_index(col("bigram"), " ", 1).as("w1"))
      .agg(sum(col("cb")).as("c1"))
    val lp = cbAll.where(col("cb") >= minCount)
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .join(c1, "w1")
      .select(col("bigram"),
        round(log(col("cb").cast("double") / col("c1")) * 1e6, 0)
          .cast("long").as("lp_q"))
    val scored = bi.join(lp, "bigram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_scored"), sum(col("lp_q")).as("lp_sum"))
      .select(col("doc_id"), col("n_scored"),
        round(-col("lp_sum").cast("double") / col("n_scored") / 1e6, 6)
          .as("xent_nats"))
    docs.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_scored"), lit(0L)).as("n_scored"),
        coalesce(col("xent_nats"), lit(0.0)).as("xent_nats"))
  }

  /** T16 per-document keyword extraction: top-3 tokens by tf·idf with
    * deterministic tie-break (weight desc, then token) — the classic
    * tf-idf keyword summarizer a corpus-exploration / topic-tagging
    * pass runs per document. Weights reuse t10's integer-micro-unit
    * idf quantization, so ranking is pure integer comparison and
    * immune to float summation order. Scale shape: the rank window
    * partitions by doc_id (never SinglePartition) and the `rank <= 3`
    * predicate plans as a WindowGroupLimit, so each group's buffer is
    * pruned to 3 rows before the full sort materializes. */
  def t16Keywords(s: SparkSession, dir: String): DataFrame =
    keywordsOf(Tables(s, dir, "documents"), topK = 3)

  /** The t16 kernel over an arbitrary (doc_id, text) relation —
    * spec-testable with a hand-computable corpus. */
  def keywordsOf(docs: DataFrame, topK: Int): DataFrame = {
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val tf = docs
      .select(col("doc_id"), explode(toks).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, "token") // vocab-sized; AQE broadcasts it
      .crossJoin(broadcast(n))
      .withColumn("w_micro", col("tf") *
        round(log(col("n_docs").cast("double") / col("df")) * 1e6, 0)
          .cast("long"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("w_micro").desc, col("token"))
    scored.withColumn("kw_rank", row_number().over(w).cast("long"))
      .where(col("kw_rank") <= topK)
      .select(col("doc_id"), col("kw_rank"), col("token"), col("w_micro"))
  }

  /** T17 DSIR importance weights (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", arXiv:2302.03169):
    * per-document log importance weight log p_target(doc)/p_raw(doc)
    * under bag-of-bigrams models of a TARGET slice (here lang = 'en',
    * standing in for the high-quality target corpus) vs the RAW
    * corpus, with add-1 smoothing over the raw bigram vocabulary.
    * Docs that look most target-like get the largest weights — the
    * resampling key for target-matched training-mix selection.
    *
    * The paper hashes n-grams into 10⁴ buckets to bound the model;
    * this corpus's vocab² is already model-table-sized, so features
    * are the bigrams themselves (hashing is a drop-in `xxhash64 %  B`
    * on the bigram column — it would only change the model table's
    * key domain, not the plan shape; left unhashed here to keep the
    * DuckDB oracle engine-independent).
    *
    * Determinism: per-bigram log-ratios quantize to integer
    * micro-nats (t10/t11 discipline); per-doc sums are integer. The
    * single ln argument is assembled as (ct+1)/(cr+1) · (Nr+V)/(Nt+V)
    * — two correctly-rounded divides and one multiply, mirrored
    * op-for-op in the oracle — so BIGINT products that could overflow
    * at 100 TB never form. Scale shape: model table is vocab²-bounded
    * (AQE broadcasts it), corpus shuffles once on bigram for the
    * count and once on doc_id for the sum; smoothing constants ride
    * a broadcast single-row aggregate — no driver-side counts. */
  def t17DsirWeights(s: SparkSession, dir: String): DataFrame =
    dsirWeightsOf(Tables(s, dir, "documents"), col("lang") === "en")

  /** The t17 kernel: importance weights of every doc under
    * target-slice vs whole-corpus bigram models. `targetPred` selects
    * the target rows (must be a subset of `docs`). */
  def dsirWeightsOf(docs: DataFrame, targetPred: Column): DataFrame = {
    val bi = docs.select(col("doc_id"), targetPred.as("is_target"),
      explode(org.apache.spark.sql.graftx.Shingles.shingles(toks, 2))
        .as("bigram"))
    val cbr = bi.groupBy(col("bigram")).agg(count(lit(1)).as("cr"))
    val cbt = bi.where(col("is_target"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("ct"))
    val consts = cbr.agg(sum(col("cr")).as("nr"), count(lit(1)).as("v"))
      .crossJoin(broadcast(
        bi.agg(sum(when(col("is_target"), 1L).otherwise(0L)).as("nt"))))
    val model = cbr.join(cbt, Seq("bigram"), "left")
      .crossJoin(broadcast(consts))
      .select(col("bigram"),
        round(log(
          ((coalesce(col("ct"), lit(0L)) + lit(1L)).cast("double")
            / (col("cr") + lit(1L))) *
          ((col("nr") + col("v")).cast("double") / (col("nt") + col("v")))
        ) * 1e6, 0).cast("long").as("lr_q"))
    val scored = bi.join(model, "bigram") // total: model covers every raw bigram
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lr_q")).as("logw_micro"))
    docs.select(col("doc_id"), col("lang"))
      .join(scored, Seq("doc_id"), "left") // total over docs (1-token docs have no bigram)
      .select(col("doc_id"), col("lang"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("logw_micro"), lit(0L)).as("logw_micro"),
        round(coalesce(col("logw_micro"), lit(0L)).cast("double")
          / greatest(coalesce(col("n_bigrams"), lit(0L)), lit(1L)) / 1e6, 6)
          .as("avg_logw"))
  }

  /** T18 n-gram novelty score: per document, the fraction of its
    * distinct 8-gram shingles whose FIRST owner (minimum doc_id — the
    * d11/d15 first-occurrence discipline) is this document. Documents
    * near 1.0 contribute genuinely new text; documents near 0.0 are
    * recombinations of text seen earlier — the contribution signal a
    * pruning pass uses BETWEEN exact dedup (which only catches whole
    * windows) and quality filters (which ignore redundancy entirely).
    * Scale shape: one gram-keyed shuffle for the min-owner table
    * (wordcount volume, same as d11), one equi-join back on gram
    * (both sides wordcount-sized — the d11 minima-join shape), one
    * doc_id agg; totality left join keeps gram-less short docs.
    * Novelty is integer ppm so the cross-engine compare is exact. */
  def t18NgramNovelty(s: SparkSession, dir: String): DataFrame =
    ngramNoveltyOf(Tables(s, dir, "documents"), n = 8)

  /** The t18 kernel over an arbitrary (doc_id, text) relation. */
  def ngramNoveltyOf(docs: DataFrame, n: Int): DataFrame = {
    val g = docs.select(col("doc_id"),
      explode(array_distinct(
        org.apache.spark.sql.graftx.Shingles.shingles(toks, n)))
        .as("gram"))
    val owner = g.groupBy(col("gram")).agg(min(col("doc_id")).as("owner"))
    val per = g.join(owner, "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("owner") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
    docs.select(col("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        round(coalesce(col("n_novel"), lit(0L)) * lit(1e6)
          / greatest(coalesce(col("n_grams"), lit(0L)), lit(1L)), 0)
          .cast("long").as("novelty_ppm"))
  }

  /** T12 collocation mining: top-50 bigrams by pointwise mutual
    * information, PMI = ln(c(w1,w2)·N / (c(w1,·)·c(·,w2))), with a
    * min-count floor of 5 (the classic Church–Hanks collocation
    * measure a tokenizer/vocab pipeline uses to pick merge
    * candidates). Scale shape: one bigram aggregation pass over the
    * corpus; everything after it (marginals, the PMI join, top-k) is
    * model-table-sized, N rides a broadcast single-row aggregate, and
    * top-50 is a TakeOrdered — no global sort shuffle. Determinism:
    * PMI quantizes to integer micro-nats (the t10/t11 discipline)
    * with the bigram as tie-break. */
  def t12Collocations(s: SparkSession, dir: String): DataFrame =
    collocationsOf(Tables(s, dir, "documents"))

  /** The t12 kernel over an arbitrary (text) relation — spec-testable
    * with a hand-computable corpus. */
  def collocationsOf(docs: DataFrame): DataFrame = {
    val bi = docs
      .select(explode(
        org.apache.spark.sql.graftx.Shingles.shingles(toks, 2)).as("bigram"))
    val cb = bi.groupBy(col("bigram")).agg(count(lit(1)).as("n_pair"))
    val nb = cb.agg(sum(col("n_pair")).as("nb"))
    val c1 = cb.groupBy(substring_index(col("bigram"), " ", 1).as("w1"))
      .agg(sum(col("n_pair")).as("c1"))
    val c2 = cb.groupBy(substring_index(col("bigram"), " ", -1).as("w2"))
      .agg(sum(col("n_pair")).as("c2"))
    cb.filter(col("n_pair") >= 5)
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .withColumn("w2", substring_index(col("bigram"), " ", -1))
      .join(c1, "w1").join(c2, "w2") // marginals are vocab-sized; AQE broadcasts
      .crossJoin(broadcast(nb))
      .select(col("bigram"), col("n_pair"),
        round(log(col("n_pair").cast("double") * col("nb")
          / (col("c1") * col("c2"))) * 1e6, 0).cast("long").as("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("bigram"))
      .limit(50)
  }

  /** T13 Gopher-style rule filter (Rae et al., "Scaling Language
    * Models: Methods, Analysis & Insights from Training Gopher",
    * arXiv:2112.11446 §A1.1 — the rule family every big-corpus
    * curation pipeline runs before model-based filtering): per-doc
    * boolean gates on word count, mean word length, and stopword
    * presence, plus the conjunction. Only the rules this corpus can
    * exercise are kept (the symbol-ratio/bullet/alpha-fraction gates
    * are vacuous on an all-alpha synthetic corpus and would assert
    * nothing). Pure codegen expressions — single scan, no shuffle
    * but the determinism sort. */
  def t13GopherRules(s: SparkSession, dir: String): DataFrame =
    gopherRulesOf(sortedDocs(s, dir))

  /** The t13 kernel over an arbitrary (doc_id, text) relation —
    * spec-testable with docs constructed at each rule boundary. */
  def gopherRulesOf(docs: DataFrame): DataFrame = {
    val nWords = size(toks).cast("long")
    val meanLen = length(regexp_replace(col("text"), " ", ""))
      .cast("double") / nWords
    val stopHits = size(filter(toks,
      t => stopwords.map(w => t === lit(w)).reduce(_ || _))).cast("long")
    val rWords = nWords.between(50, 100000)
    val rLen = meanLen.between(3.0, 10.0)
    val rStop = stopHits >= 2
    docs.select(col("doc_id"), nWords.as("n_words"),
      round(meanLen, 6).as("mean_word_len"), stopHits.as("stop_hits"),
      rWords.as("r_words"), rLen.as("r_word_len"), rStop.as("r_stop"),
      (rWords && rLen && rStop).as("pass"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t12_collocations" -> (t12Collocations _),
    "t13_gopher_rules" -> (t13GopherRules _),
    "t1_token_stats" -> (t1TokenStats _),
    "t2_quality_score" -> (t2QualityScore _),
    "t3_langid" -> (t3LangId _),
    "t4_fingerprint" -> (t4Fingerprint _),
    "t5_repetition" -> (t5Repetition _),
    "t6_normalize" -> (t6Normalize _),
    "t7_bpe_tokens" -> (t7BpeTokens _),
    "t8_pii_redact" -> (t8PiiRedact _),
    "t9_vocab_df" -> (t9VocabDf _),
    "t10_tfidf" -> (t10TfIdf _),
    "t10_tfidf_capped" -> (t10TfIdfCapped _),
    "t11_lm_xent" -> (t11LmXent _),
    "t11_lm_xent_capped" -> (t11LmXentCapped _),
    // oracle since r8: deterministic md5-sampled tokenizer, merge
    // learning + encoding replayed as bounded unrolled-round SQL
    "t14_bpe_train" -> (graft.fit.Bpe.t14BpeTrain _),
    "t19_bpe_encode" -> (graft.fit.Bpe.t19BpeEncode _),
    "m14_quality_mix_report" -> (m14QualityMixReport _),
    "t15_zipf" -> (t15Zipf _),
    "t16_keywords" -> (t16Keywords _),
    "t17_dsir_weights" -> (t17DsirWeights _),
    "t18_ngram_novelty" -> (t18NgramNovelty _),
    "o10_weighted_sample" -> (o10WeightedSample _),
  )

  // shared with the d13 oracle (its quality CTE must match t2's)
  private[graft] val stopPred = stopwords.map(w => s"t = '$w'").mkString(" OR ")

  // The t2 quality ingredients as ONE shared CTE string — t2 and o10
  // both build on it, so the definition cannot drift between them
  // (the d13 shared-string discipline).
  private[graft] val qualityCteSql: String =
    s"""WITH q AS (
      | SELECT doc_id, source,
      |  len(list_filter(string_split(text,' '), t -> $stopPred))::DOUBLE
      |    / len(string_split(text,' ')) AS stop_ratio,
      |  LEAST(len(string_split(text,' '))::DOUBLE / 100.0, 1.0) AS len_score
      | FROM documents)""".stripMargin
  private def markerPred(ws: Seq[String]) = ws.map(w => s"t = '$w'").mkString(" OR ")

  val oracle: Map[String, String] = Map(
    "t7_bpe_tokens" ->
      s"""SELECT doc_id,
         | len(string_split(text, ' '))::BIGINT AS n_tok_ws,
         | len(regexp_extract_all(text, '$bpeRe'))::BIGINT AS n_tok_bpe,
         | ROUND(len(regexp_extract_all(text, '$bpeRe'))::DOUBLE
         |   / len(string_split(text, ' ')), 6) AS bpe_per_ws
         |FROM documents ORDER BY doc_id""".stripMargin,
    "t1_token_stats" ->
      """SELECT doc_id,
        | len(string_split(text, ' '))::BIGINT AS n_tok,
        | length(replace(text, ' ', ''))::BIGINT AS n_nospace,
        | length(replace(text, ' ', ''))::DOUBLE / len(string_split(text, ' ')) AS avg_tok_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    // m14: the SAME quality CTE + the SAME bin thresholds as t2 —
    // shared strings, so the report cannot drift from the filter
    "m14_quality_mix_report" ->
      s"""$qualityCteSql,
        |b AS (
        | SELECT q.source,
        |  CASE WHEN ROUND(stop_ratio*0.5 + len_score*0.5, 6) >= 0.4 THEN 'good'
        |       WHEN ROUND(stop_ratio*0.5 + len_score*0.5, 6) >= 0.25 THEN 'fair'
        |       ELSE 'low' END AS quality_bin,
        |  len(string_split(d.text, ' '))::BIGINT AS n_tok
        | FROM q JOIN documents d USING (doc_id)),
        |a AS (
        | SELECT source, quality_bin, COUNT(*)::BIGINT AS n_docs,
        |  SUM(n_tok)::BIGINT AS n_tokens
        | FROM b GROUP BY source, quality_bin),
        |t AS (SELECT SUM(n_tokens)::BIGINT AS tot FROM a)
        |SELECT source, quality_bin, n_docs, n_tokens,
        | ROUND(n_tokens * 1e6 / tot)::BIGINT AS share_ppm
        |FROM a CROSS JOIN t
        |ORDER BY source, quality_bin""".stripMargin,
    "t2_quality_score" ->
      s"""$qualityCteSql
        |SELECT doc_id, ROUND(stop_ratio, 6) AS stop_ratio,
        | ROUND(stop_ratio*0.5 + len_score*0.5, 6) AS quality,
        | CASE WHEN ROUND(stop_ratio*0.5 + len_score*0.5, 6) >= 0.4 THEN 'good'
        |      WHEN ROUND(stop_ratio*0.5 + len_score*0.5, 6) >= 0.25 THEN 'fair'
        |      ELSE 'low' END AS quality_bin
        |FROM q ORDER BY doc_id""".stripMargin,
    // o10: the SAME quality CTE (shared string — the d13 discipline),
    // integer micro-unit keep test against the o10 LCG digest; no
    // ROUND on either side — see o10WeightedSample's scaladoc
    "o10_weighted_sample" ->
      s"""$qualityCteSql
        |SELECT doc_id, source,
        | CAST(FLOOR((stop_ratio*0.5 + len_score*0.5) * 1000000
        |   + 0.5) AS BIGINT) AS p_micro,
        | ((doc_id * 1664525 + 1013904223) % 2147483647) % 1000000 AS digest,
        | ((doc_id * 1664525 + 1013904223) % 2147483647) % 1000000
        |   < CAST(FLOOR((stop_ratio*0.5 + len_score*0.5) * 1000000
        |     + 0.5) AS BIGINT) AS keep
        |FROM q ORDER BY doc_id""".stripMargin,
    "t15_zipf" ->
      """WITH c AS (
        | SELECT source, t.t AS token, COUNT(*)::BIGINT AS n
        | FROM documents, LATERAL unnest(string_split(text, ' ')) AS t(t)
        | WHERE len(t.t) > 0 GROUP BY 1, 2),
        |r AS (
        | SELECT source, n,
        |  ROW_NUMBER() OVER (PARTITION BY source
        |    ORDER BY n DESC, token) AS rank
        | FROM c)
        |SELECT source, SUM(n)::BIGINT AS n_tokens, COUNT(*)::BIGINT AS vocab,
        | ROUND(COUNT(*)::DOUBLE / SUM(n), 6) AS type_token_ratio,
        | ROUND(MAX(CASE WHEN rank = 1 THEN n END)::DOUBLE / SUM(n), 6)
        |   AS top1_share,
        | ROUND(regr_slope(ln(n), ln(rank)), 6) AS zipf_slope
        |FROM r GROUP BY source ORDER BY source""".stripMargin,
    "t3_langid" ->
      s"""WITH h AS (
        | SELECT lang,
        |  len(list_filter(string_split(text,' '), t -> ${markerPred(langMarkers(0)._2)})) AS en,
        |  len(list_filter(string_split(text,' '), t -> ${markerPred(langMarkers(1)._2)})) AS de,
        |  len(list_filter(string_split(text,' '), t -> ${markerPred(langMarkers(2)._2)})) AS fr,
        |  len(list_filter(string_split(text,' '), t -> ${markerPred(langMarkers(3)._2)})) AS es
        | FROM documents)
        |SELECT lang,
        | CASE WHEN en > 0 AND en >= de AND en >= fr AND en >= es THEN 'en'
        |      WHEN de > 0 AND de >= fr AND de >= es THEN 'de'
        |      WHEN fr > 0 AND fr >= es THEN 'fr'
        |      WHEN es > 0 THEN 'es'
        |      ELSE 'unknown' END AS pred_lang,
        | COUNT(*) AS n
        |FROM h GROUP BY 1, 2 ORDER BY lang, pred_lang""".stripMargin,
    "t4_fingerprint" ->
      """SELECT doc_id,
        | md5(text) AS fp_raw,
        | md5(lower(regexp_replace(text, '[^a-zA-Z ]', '', 'g'))) AS fp_norm,
        | md5(array_to_string(list_sort(list_distinct(string_split(text,' '))), ' ')) AS fp_bag
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t5_repetition" ->
      """WITH tg AS (
        | SELECT doc_id, string_split(text, ' ') AS t,
        |  CASE WHEN len(string_split(text, ' ')) >= 3 THEN
        |   [array_to_string(string_split(text, ' ')[i:i+2], ' ')
        |    for i in range(1, len(string_split(text, ' ')) - 1)]
        |  ELSE [] END AS g
        | FROM documents)
        |SELECT doc_id,
        | len(g)::BIGINT AS n_grams,
        | CASE WHEN len(g) > 0 THEN
        |  round(1.0 - len(list_distinct(g))::DOUBLE / len(g), 6)
        | ELSE 0.0 END AS dup_gram_frac,
        | round(1.0 - len(list_distinct(t))::DOUBLE / len(t), 6) AS dup_tok_frac
        |FROM tg ORDER BY doc_id""".stripMargin,
    "t8_pii_redact" ->
      s"""SELECT doc_id,
         | regexp_replace(regexp_replace(regexp_replace(text,
         |   '$emailRe', '<EMAIL>', 'g'),
         |   '$ipRe', '<IP>', 'g'),
         |   '$phoneRe', '<PHONE>', 'g') AS redacted_text,
         | (len(regexp_extract_all(text, '$emailRe'))
         |  + len(regexp_extract_all(text, '$ipRe'))
         |  + len(regexp_extract_all(text, '$phoneRe')))::BIGINT AS n_redactions
         |FROM documents ORDER BY doc_id""".stripMargin,
    "t9_vocab_df" ->
      """WITH tok AS (
        | SELECT doc_id, unnest(string_split(text, ' ')) AS token
        | FROM documents),
        |tf AS (
        | SELECT doc_id, token, COUNT(*) AS tf
        | FROM tok GROUP BY doc_id, token)
        |SELECT token, COUNT(*)::BIGINT AS df, SUM(tf)::BIGINT AS cf
        |FROM tf GROUP BY token
        |ORDER BY df DESC, token LIMIT 50""".stripMargin,
    "t16_keywords" ->
      """WITH tok AS (
        | SELECT doc_id, unnest(string_split(text, ' ')) AS token
        | FROM documents),
        |tf AS (
        | SELECT doc_id, token, COUNT(*) AS tf
        | FROM tok GROUP BY doc_id, token),
        |dfreq AS (
        | SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
        |sc AS (
        | SELECT tf.doc_id, tf.token,
        |  (tf.tf * ROUND(LN((SELECT COUNT(*) FROM documents)::DOUBLE
        |    / dfreq.df) * 1e6)::BIGINT)::BIGINT AS w_micro
        | FROM tf JOIN dfreq USING (token)),
        |rk AS (
        | SELECT doc_id, token, w_micro,
        |  (ROW_NUMBER() OVER (PARTITION BY doc_id
        |    ORDER BY w_micro DESC, token))::BIGINT AS kw_rank
        | FROM sc)
        |SELECT doc_id, kw_rank, token, w_micro FROM rk
        |WHERE kw_rank <= 3 ORDER BY doc_id, kw_rank""".stripMargin,
    "t17_dsir_weights" ->
      """WITH tok AS (
        | SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
        |bi AS (
        | SELECT doc_id, lang = 'en' AS is_target,
        |  unnest(list_transform(range(1, len(t)),
        |   i -> array_to_string(t[i:i+1], ' '))) AS bigram
        | FROM tok),
        |cbr AS (SELECT bigram, COUNT(*) AS cr FROM bi GROUP BY bigram),
        |cbt AS (SELECT bigram, COUNT(*) AS ct FROM bi
        |        WHERE is_target GROUP BY bigram),
        |k AS (SELECT (SELECT SUM(cr) FROM cbr) AS nr,
        |             (SELECT COUNT(*) FROM cbr) AS v,
        |             (SELECT COALESCE(SUM(ct), 0) FROM cbt) AS nt),
        |model AS (
        | SELECT cbr.bigram,
        |  ROUND(LN(((COALESCE(cbt.ct, 0) + 1)::DOUBLE / (cbr.cr + 1))
        |    * ((k.nr + k.v)::DOUBLE / (k.nt + k.v))) * 1e6)::BIGINT AS lr_q
        | FROM cbr LEFT JOIN cbt USING (bigram) CROSS JOIN k),
        |sc AS (
        | SELECT doc_id, COUNT(*)::BIGINT AS n_bigrams,
        |  SUM(lr_q)::BIGINT AS logw_micro
        | FROM bi JOIN model USING (bigram) GROUP BY doc_id)
        |SELECT d.doc_id, d.lang,
        | COALESCE(sc.n_bigrams, 0)::BIGINT AS n_bigrams,
        | COALESCE(sc.logw_micro, 0)::BIGINT AS logw_micro,
        | ROUND(COALESCE(sc.logw_micro, 0)::DOUBLE
        |   / GREATEST(COALESCE(sc.n_bigrams, 0), 1) / 1e6, 6) AS avg_logw
        |FROM documents d LEFT JOIN sc USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "t18_ngram_novelty" ->
      """WITH tok AS (
        | SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |g AS (
        | SELECT DISTINCT doc_id, gram FROM (
        |  SELECT doc_id, unnest(CASE WHEN len(t) >= 8 THEN
        |    [array_to_string(t[i:i+7], ' ') for i in range(1, len(t) - 6)]
        |   ELSE [] END) AS gram
        |  FROM tok)),
        |own AS (SELECT gram, MIN(doc_id) AS owner FROM g GROUP BY gram),
        |per AS (
        | SELECT g.doc_id, COUNT(*)::BIGINT AS n_grams,
        |  SUM(CASE WHEN o.owner = g.doc_id THEN 1 ELSE 0 END)::BIGINT AS n_novel
        | FROM g JOIN own o USING (gram) GROUP BY g.doc_id)
        |SELECT d.doc_id,
        | COALESCE(p.n_grams, 0)::BIGINT AS n_grams,
        | COALESCE(p.n_novel, 0)::BIGINT AS n_novel,
        | ROUND(COALESCE(p.n_novel, 0) * 1e6
        |   / GREATEST(COALESCE(p.n_grams, 0), 1))::BIGINT AS novelty_ppm
        |FROM documents d LEFT JOIN per p USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "t10_tfidf" ->
      """WITH tok AS (
        | SELECT doc_id, unnest(string_split(text, ' ')) AS token
        | FROM documents),
        |tf AS (
        | SELECT doc_id, token, COUNT(*) AS tf
        | FROM tok GROUP BY doc_id, token),
        |dfreq AS (
        | SELECT token, COUNT(*) AS df FROM tf GROUP BY token)
        |SELECT tf.doc_id,
        | SUM(tf.tf * ROUND(LN((SELECT COUNT(*) FROM documents)::DOUBLE
        |   / dfreq.df) * 1e6)::BIGINT)::BIGINT AS score_micro
        |FROM tf JOIN dfreq USING (token)
        |GROUP BY tf.doc_id ORDER BY tf.doc_id""".stripMargin,
    "t10_tfidf_capped" ->
      """WITH tok AS (
        | SELECT doc_id, unnest(string_split(text, ' ')) AS token
        | FROM documents),
        |tf AS (
        | SELECT doc_id, token, COUNT(*) AS tf
        | FROM tok GROUP BY doc_id, token),
        |dfreq AS (
        | SELECT token, COUNT(*) AS df FROM tf GROUP BY token
        | HAVING COUNT(*) >= 5),
        |sc AS (
        | SELECT tf.doc_id,
        |  SUM(tf.tf * ROUND(LN((SELECT COUNT(*) FROM documents)::DOUBLE
        |    / dfreq.df) * 1e6)::BIGINT)::BIGINT AS score_micro
        | FROM tf JOIN dfreq USING (token) GROUP BY tf.doc_id)
        |SELECT d.doc_id, COALESCE(sc.score_micro, 0)::BIGINT AS score_micro
        |FROM documents d LEFT JOIN sc USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "t11_lm_xent_capped" ->
      """WITH tok AS (
        | SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bi AS (
        | SELECT doc_id, unnest(list_transform(range(1, len(t)),
        |   i -> array_to_string(t[i:i+1], ' '))) AS bigram
        | FROM tok),
        |cb AS (SELECT bigram, COUNT(*) AS cb FROM bi GROUP BY bigram),
        |c1 AS (SELECT split_part(bigram, ' ', 1) AS w1, SUM(cb) AS c1
        |       FROM cb GROUP BY 1),
        |lp AS (SELECT bigram, ROUND(LN(cb::DOUBLE / c1) * 1e6)::BIGINT AS lp_q
        |       FROM cb JOIN c1 ON split_part(cb.bigram, ' ', 1) = c1.w1
        |       WHERE cb >= 3),
        |sc AS (
        | SELECT doc_id, COUNT(*)::BIGINT AS n_scored,
        |  ROUND(-(SUM(lp_q)::DOUBLE) / COUNT(*) / 1e6, 6) AS xent_nats
        | FROM bi JOIN lp USING (bigram) GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(sc.n_scored, 0)::BIGINT AS n_scored,
        | COALESCE(sc.xent_nats, 0.0) AS xent_nats
        |FROM documents d LEFT JOIN sc USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "t11_lm_xent" ->
      """WITH tok AS (
        | SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bi AS (
        | SELECT doc_id, unnest(list_transform(range(1, len(t)),
        |   i -> array_to_string(t[i:i+1], ' '))) AS bigram
        | FROM tok),
        |cb AS (SELECT bigram, COUNT(*) AS cb FROM bi GROUP BY bigram),
        |c1 AS (SELECT split_part(bigram, ' ', 1) AS w1, SUM(cb) AS c1
        |       FROM cb GROUP BY 1),
        |lp AS (SELECT bigram, ROUND(LN(cb::DOUBLE / c1) * 1e6)::BIGINT AS lp_q
        |       FROM cb JOIN c1 ON split_part(cb.bigram, ' ', 1) = c1.w1)
        |SELECT doc_id, COUNT(*)::BIGINT AS n_bigrams,
        | ROUND(-(SUM(lp_q)::DOUBLE) / COUNT(*) / 1e6, 6) AS xent_nats
        |FROM bi JOIN lp USING (bigram)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "t6_normalize" ->
      """WITH c AS (
        | SELECT doc_id, text,
        |  trim(regexp_replace(regexp_replace(lower(text),
        |    '[[:cntrl:]]', '', 'g'), ' {2,}', ' ', 'g')) AS clean_text
        | FROM documents)
        |SELECT doc_id, clean_text, clean_text != text AS changed,
        | md5(clean_text) AS clean_fp
        |FROM c ORDER BY doc_id""".stripMargin,
    "t13_gopher_rules" ->
      s"""WITH m AS (
        | SELECT doc_id,
        |  len(string_split(text, ' '))::BIGINT AS n_words,
        |  length(replace(text, ' ', ''))::DOUBLE
        |    / len(string_split(text, ' ')) AS mean_len,
        |  len(list_filter(string_split(text, ' '),
        |    t -> $stopPred))::BIGINT AS stop_hits
        | FROM documents)
        |SELECT doc_id, n_words, ROUND(mean_len, 6) AS mean_word_len,
        | stop_hits,
        | n_words BETWEEN 50 AND 100000 AS r_words,
        | mean_len BETWEEN 3.0 AND 10.0 AS r_word_len,
        | stop_hits >= 2 AS r_stop,
        | (n_words BETWEEN 50 AND 100000) AND (mean_len BETWEEN 3.0 AND 10.0)
        |   AND stop_hits >= 2 AS pass
        |FROM m ORDER BY doc_id""".stripMargin,
    "t12_collocations" ->
      """WITH tok AS (
        | SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bi AS (
        | SELECT unnest(list_transform(range(1, len(t)),
        |   i -> array_to_string(t[i:i+1], ' '))) AS bigram
        | FROM tok),
        |cb AS (SELECT bigram, COUNT(*) AS n_pair FROM bi GROUP BY bigram),
        |n AS (SELECT SUM(n_pair) AS nb FROM cb),
        |c1 AS (SELECT split_part(bigram, ' ', 1) AS w1, SUM(n_pair) AS c1
        |       FROM cb GROUP BY 1),
        |c2 AS (SELECT split_part(bigram, ' ', 2) AS w2, SUM(n_pair) AS c2
        |       FROM cb GROUP BY 1)
        |SELECT cb.bigram, cb.n_pair::BIGINT AS n_pair,
        | ROUND(LN(cb.n_pair::DOUBLE * n.nb / (c1.c1 * c2.c2)) * 1e6)::BIGINT
        |   AS pmi_micro
        |FROM cb
        |JOIN c1 ON split_part(cb.bigram, ' ', 1) = c1.w1
        |JOIN c2 ON split_part(cb.bigram, ' ', 2) = c2.w2
        |CROSS JOIN n
        |WHERE cb.n_pair >= 5
        |ORDER BY pmi_micro DESC, cb.bigram LIMIT 50""".stripMargin,
    // t14/t19: r8 conversions — BPE merge learning and encoding
    // replayed as bounded unrolled-round CTE chains (fit/Bpe.scala)
    "t14_bpe_train" -> graft.fit.Bpe.oracleT14,
    "t19_bpe_encode" -> graft.fit.Bpe.oracleT19,
  )
}
