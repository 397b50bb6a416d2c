package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.fit.Bpe

class BpeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions",
      "org.apache.spark.sql.graftx.GraftExtensions")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("train learns hand-derivable merges in frequency order") {
    // la×3, lo×1 → pair (l,a):3 beats (l,o):1; after merging "la"
    // only (l,o) remains
    val merges = Bpe.train(Map("la" -> 3L, "lo" -> 1L), 10)
    assert(merges === Seq(("l", "a"), ("l", "o")))
    // stops early once no adjacent pair remains (single-char words)
    assert(Bpe.train(Map("a" -> 5L, "b" -> 3L), 10) === Seq.empty)
  }

  test("pair-count ties break to the lexicographically smallest pair") {
    // (a,b):2 and (c,d):2 tie → (a,b) must merge first
    val merges = Bpe.train(Map("ab" -> 2L, "cd" -> 2L), 2)
    assert(merges === Seq(("a", "b"), ("c", "d")))
  }

  test("encode replays merges consistently with training") {
    val wf = Map("lower" -> 2L, "low" -> 5L, "lowest" -> 1L)
    val merges = Bpe.train(wf, 20)
    val rank = merges.zipWithIndex.toMap
    // every training word must round-trip: encoding it yields the
    // exact symbol sequence training converged to (train applies the
    // same mergePair), and concatenating tokens restores the word
    wf.keys.foreach { w =>
      val toks = Bpe.encode(w, rank)
      assert(toks.mkString === w, s"encode must preserve $w")
    }
    // "low" is the most frequent word → its full merge chain is
    // learned → it encodes to a single token
    assert(Bpe.encode("low", rank) === Vector("low"))
    // unseen word: falls back to learned subwords + raw chars, never throws
    val unseen = Bpe.encode("lowx", rank)
    assert(unseen.mkString === "lowx")
    assert(unseen.head === "low")
  }

  test("t14 vocab over a constructed corpus: counts weighted by word frequency") {
    import spark.implicits._
    val docs = Seq(
      (0L, "la la la lo"),
      (1L, "la lo")).toDF("doc_id", "text")
    // sample covers the whole corpus → merges [(l,a),(l,o)];
    // every word encodes to one token: la×4, lo×2
    val out = Bpe.bpeVocabOf(docs, sampleDocs = 10, nMerges = 10).collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq ===
      Seq(("la", 4L, 0), ("lo", 2L, 1)))
  }

  test("t14 vocab tier on the real table: deterministic, tokens rebuild the corpus mass") {
    val a = Bpe.t14BpeVocab(spark, sf).collect()
    val b = Bpe.t14BpeVocab(spark, sf).collect()
    assert(a.toSeq === b.toSeq, "two runs must be bit-identical")
    assert(a.nonEmpty)
    // conservation: total encoded characters = total non-space
    // characters of all words (BPE re-segments, never drops)
    val tokChars = a.map(r => r.getString(0).length * r.getLong(1)).sum
    val corpusChars = Tables(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .agg(sum(length(col("w")))).collect()(0).getLong(0)
    assert(tokChars === corpusChars)
    // vocabulary stays bounded by alphabet + merge count
    assert(a.length <= Bpe.NMerges + 128)
  }

  test("t14 deterministic merge-table entry: well-formed, bit-stable") {
    val a = Bpe.t14BpeTrain(spark, sf).collect()
    assert(a.toSeq === Bpe.t14BpeTrain(spark, sf).collect().toSeq)
    assert(a.nonEmpty && a.length <= Bpe.DetMerges)
    a.zipWithIndex.foreach { case (r, i) =>
      assert(r.getInt(0) === i) // dense ranks in learned order
      assert(r.getString(3) === r.getString(1) + r.getString(2))
    }
    // learned pairs are distinct (a merged pair cannot recur: its
    // occurrences were replaced)
    assert(a.map(_.getString(3)).distinct.length === a.length)
  }

  test("t19 encode surface: totality, per-word cost, t14 cross-identity") {
    import spark.implicits._
    // hand corpus: "la" appears 3x, "lo" 1x → merges (l,a) then (l,o)
    // → every word encodes to ONE token; a word-less doc keeps a row
    val docs = Seq((1L, "la la lo"), (2L, "la"), (3L, ""))
      .toDF("doc_id", "text")
    val got = Bpe.bpeEncodeOf(docs, sampleDocs = 10, nMerges = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === Seq(
      (1L, 3L, 3L, 1000000L),
      (2L, 1L, 1L, 1000000L),
      (3L, 0L, 0L, 0L)))
    // cross-identity on the real table: summed per-doc token counts
    // must equal t14's summed vocabulary occurrences (both count every
    // token of every word occurrence exactly once; same 200-merge
    // xxhash64-sampled tokenizer on both sides)
    val realDocs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val t19Sum = Bpe.bpeEncodeOf(realDocs, Bpe.SampleDocs, Bpe.NMerges)
      .agg(sum(col("n_bpe_tokens"))).collect()(0).getLong(0)
    val t14Sum = Bpe.t14BpeVocab(spark, sf)
      .agg(sum(col("n_occurrences"))).collect()(0).getLong(0)
    assert(t19Sum === t14Sum)
    // the deterministic t19 entry: total, bit-stable, and its token
    // counts conserve words (every word encodes to >= 1 token and
    // <= its character count)
    val det = Bpe.t19BpeEncode(spark, sf).collect()
    assert(det.map(_.getLong(0)).length === realDocs.count())
    det.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1)) // >= 1 token per word
    }
    assert(det.map(_.toSeq).toSeq ===
      Bpe.t19BpeEncode(spark, sf).collect().map(_.toSeq).toSeq)
  }
}
