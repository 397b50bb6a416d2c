package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join, PassJoin-style (Li, Deng &
  * Feng, "PASS-JOIN: a partition-based method for similarity joins",
  * PVLDB 5(3), 2011 — public paper; implementation re-derived).
  *
  * Reference-surface context: the reference dedups configurations by
  * exact content hash (matdb/database/__init__.py:461–470); fuzzy
  * string matching at corpus scale is the LLM-pipeline extension of
  * that idea for OCR-damaged / lightly-edited near-duplicates that
  * token-level MinHash (d2) misses and SimHash (d3) only catches
  * probabilistically. Edit distance ≤ k is the exact criterion.
  *
  * Scale shape (the 100 TB argument): the naive join is O(N²)
  * levenshtein calls — unusable. PassJoin's pigeonhole makes the
  * candidate tier an EQUI-join on short keys:
  *
  *  - index side: each string s is split into k+1 canonical segments;
  *    if ed(a,b) ≤ k then at least one segment of a survives in b
  *    unedited (pigeonhole over the ≤ k edits);
  *  - probe side: each string emits the substrings that could equal a
  *    canonical segment of a partner of length l ∈ [|s|−k, |s|+k], at
  *    positions within ±k of that length's canonical segment start
  *    (≤ k edits shift any alignment by at most k — the safe bound;
  *    the multi-match-aware bound of the paper §4 would roughly halve
  *    the constant and is noted as headroom, not needed here);
  *  - per-document key fan-out is a CONSTANT: ≤ (2k+1)·(k+1)·(2k+1)
  *    ≈ 200 short keys for k=3 — the join shuffles O(N) rows keyed by
  *    (segment_index, partner_length, segment_text), never O(N²);
  *  - verify tier is candidate-bounded: one codegen'd
  *    `levenshtein(a, b, threshold)` (early-exit banded DP) per
  *    surviving pair.
  *
  * Everything is Column-native (sequence/transform/filter/flatten +
  * explode) so candidate generation stays inside whole-stage codegen —
  * no UDFs, no serde boundary.
  */
object EditDistance {

  /** canonical even partition of a length-l string into k+1 segments:
    * the first (l mod (k+1)) segments get the extra character. */
  private def segLen(l: Column, i: Column, k: Int): Column = {
    val base = floor(l / (k + 1)).cast("int")
    val rem = pmod(l, lit(k + 1))
    (base + when(i < rem, lit(1)).otherwise(lit(0))).cast("int")
  }

  private def segStart(l: Column, i: Column, k: Int): Column = {
    val base = floor(l / (k + 1)).cast("int")
    val rem = pmod(l, lit(k + 1))
    (i.cast("int") * base + least(i.cast("int"), rem)).cast("int")
  }

  /** Index-side keys: the k+1 canonical segments of each string. */
  def segmentKeys(df: DataFrame, idCol: String, sCol: String, k: Int): DataFrame = {
    val L = length(col(sCol))
    val segs = transform(sequence(lit(0), lit(k)), i =>
      struct(
        i.cast("int").as("seg_i"),
        L.as("part_len"),
        col(sCol).substr(segStart(L, i, k) + 1, segLen(L, i, k)).as("seg")))
    df.select(col(idCol), explode(segs).as("key"))
      .select(col(idCol), col("key.seg_i"), col("key.part_len"), col("key.seg"))
  }

  /** Probe-side keys: every substring of s that could be the i-th
    * canonical segment of a partner of length l ∈ [|s|−k, |s|+k],
    * starting within ±k of that segment's canonical start. */
  def probeKeys(df: DataFrame, idCol: String, sCol: String, k: Int,
      minLen: Int, maxLen: Int): DataFrame = {
    val L = length(col(sCol))
    val keys = transform(
      sequence(greatest(lit(minLen), L - k), least(lit(maxLen), L + k)), l =>
        transform(sequence(lit(0), lit(k)), i => {
          val sl = segLen(l, i, k)
          val ss = segStart(l, i, k)
          val lo = greatest(ss - k, lit(0))
          val hi = least(ss + k, L - sl)
          // `filter` (not when/otherwise(array())) keeps the branch
          // types identical and yields an empty slice when hi < lo
          val positions = filter(sequence(lo, greatest(hi, lo)), p => p <= hi)
          transform(positions, p =>
            struct(
              i.cast("int").as("seg_i"),
              l.cast("int").as("part_len"),
              col(sCol).substr(p.cast("int") + 1, sl).as("seg")))
        }))
    df.select(col(idCol), explode(flatten(flatten(keys))).as("key"))
      .select(col(idCol), col("key.seg_i"), col("key.part_len"), col("key.seg"))
  }

  /** All pairs (doc_a < doc_b) with edit distance ≤ k between sCol
    * values, both strings length-bounded to [minLen, maxLen].
    * Output: (doc_a, doc_b, dist). */
  def selfJoin(docs: DataFrame, idCol: String, sCol: String, k: Int,
      minLen: Int, maxLen: Int,
      maxBucket: Int = graft.operators.MinHash.DefaultMaxBucket): DataFrame = {
    // (round 17) `bounded` feeds FOUR consumers — the segment index,
    // the probe fan-out, and both verify sides — so the source scan
    // (and its full `text` column read upstream of the substring)
    // re-ran per consumer; the eager localCheckpoint pins the narrow
    // (id, s) relation once (the d3/d4 signature-table discipline —
    // a lazy pin still materializes its AQE stages at build, so
    // eager is honest; d16 joins CacheHygieneSpec's eagerByNature).
    // The repartition spreads the constant-but-CPU-dense key
    // explodes (~200 keys/doc) across cores instead of the scan's
    // split count (the d7 single-split hazard) and is what the pin
    // snapshots.
    val bounded = docs
      .where(length(col(sCol)).between(minLen, maxLen))
      .select(col(idCol).cast("long").as("id"), col(sCol).as("s"))
      .repartition(col("id"))
      .localCheckpoint()
    // segment-bucket skew guard (the d2/d3/d4 band discipline, r9): a
    // corpus of identical strings shares every segment key, making the
    // idx×prb join n² in that bucket — the INDEX side caps at
    // ~`maxBucket` members per (seg_i, part_len, seg) bucket (the
    // bucket's min id + a deterministic hash subset; count-pass
    // discipline, no band-key window). Every probe still reaches the
    // min-id member, so duplicate clusters stay connected to the
    // keeper with bounded per-probe fan-out; gate-scale buckets are
    // far under the cap → bit-identical results there (the d16 oracle
    // is unchanged). The exact-distance verify below scopes the
    // connectivity claim: a probe whose only kept neighbors exceed k
    // edits drops out (bounded-recall, see MinHash.guardedBandPairs).
    val idx = graft.operators.MinHash.capBucketMembers(
      segmentKeys(bounded, "id", "s", k).withColumnRenamed("id", "id_a"),
      Seq("seg_i", "part_len", "seg"), "id_a", maxBucket)
    val prb = probeKeys(bounded, "id", "s", k, minLen, maxLen)
      .withColumnRenamed("id", "id_b")
    val cand = idx.join(prb, Seq("seg_i", "part_len", "seg"))
      .where(col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("doc_a"),
        greatest(col("id_a"), col("id_b")).as("doc_b"))
      .distinct()
    val a = bounded.select(col("id").as("doc_a"), col("s").as("s_a"))
    val b = bounded.select(col("id").as("doc_b"), col("s").as("s_b"))
    cand.join(a, "doc_a").join(b, "doc_b")
      // threshold form = banded DP with early exit; -1 marks "> k"
      .withColumn("lev", levenshtein(col("s_a"), col("s_b"), k))
      .where(col("lev") >= 0)
      .select(col("doc_a"), col("doc_b"), col("lev").cast("long").as("dist"))
  }

  /** Brute-force reference (spec-side completeness check ONLY — the
    * O(N²) shape is exactly what selfJoin exists to avoid). */
  def bruteForce(docs: DataFrame, idCol: String, sCol: String, k: Int,
      minLen: Int, maxLen: Int): DataFrame = {
    val bounded = docs
      .where(length(col(sCol)).between(minLen, maxLen))
      .select(col(idCol).cast("long").as("id"), col(sCol).as("s"))
    val a = bounded.select(col("id").as("doc_a"), col("s").as("s_a"))
    val b = bounded.select(col("id").as("doc_b"), col("s").as("s_b"))
    a.crossJoin(b).where(col("doc_a") < col("doc_b"))
      .withColumn("lev", levenshtein(col("s_a"), col("s_b"), k))
      .where(col("lev") >= 0)
      .select(col("doc_a"), col("doc_b"), col("lev").cast("long").as("dist"))
  }
}
