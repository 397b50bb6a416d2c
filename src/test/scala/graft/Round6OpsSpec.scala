package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{EditDistance, ZOrder}

/** Round-6 operator surface: PassJoin edit-distance join, Z-order
  * layout keys, SCD2 history build, time-weighted averaging. */
class Round6OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions",
      "org.apache.spark.sql.graftx.GraftExtensions")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  // ---------------------------------------------------------- EditDistance

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("PassJoin selfJoin equals brute force on the fixture corpus") {
    import spark.implicits._
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), substring(col("text"), 101, 48).as("pre"))
    val fast = pairsOf(EditDistance.selfJoin(docs, "doc_id", "pre", 3, 24, 48))
    val slow = pairsOf(EditDistance.bruteForce(docs, "doc_id", "pre", 3, 24, 48))
    assert(fast === slow)
    assert(slow.nonEmpty, "fixture should contain at least one near pair")
  }

  test("PassJoin is complete on adversarial edits at segment boundaries") {
    import spark.implicits._
    val base = "abcdefghijklmnopqrstuvwxyz0123456789ABCDEFGH" // 44 chars
    def del(s: String, i: Int) = s.substring(0, i) + s.substring(i + 1)
    def ins(s: String, i: Int, c: Char) = s.substring(0, i) + c + s.substring(i)
    def sub(s: String, i: Int, c: Char) = s.substring(0, i) + c + s.substring(i + 1)
    val variants = Seq(
      base,
      sub(base, 0, '#'), sub(base, 21, '#'), sub(base, 43, '#'),
      // deletions straddling the k+1=4 canonical segment boundaries
      del(base, 10), del(del(base, 11), 21), del(del(del(base, 0), 10), 30),
      // insertions, incl. at both ends
      ins(base, 0, '!'), ins(base, 44, '!'), ins(ins(ins(base, 5, '!'), 20, '?'), 40, '*'),
      // exactly k=3 mixed edits
      sub(del(base, 3), 30, '#') + "Z",
      // beyond threshold: 4 substitutions (must appear in NEITHER side)
      sub(sub(sub(sub(base, 1, '#'), 11, '#'), 22, '#'), 33, '#') + "",
      // unrelated string of a matching length
      "zyxwvutsrqponmlkjihgfedcba9876543210ZYXWVUTS")
    val docs = variants.zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "pre")
    val fast = pairsOf(EditDistance.selfJoin(docs, "doc_id", "pre", 3, 24, 48))
    val slow = pairsOf(EditDistance.bruteForce(docs, "doc_id", "pre", 3, 24, 48))
    assert(fast === slow)
    // the base string must match every ≤3-edit variant (ids 1..10)
    val fromBase = slow.collect { case (0L, b, _) => b }
    assert((1L to 10L).toSet.subsetOf(fromBase.toSet))
  }

  test("PassJoin segment-bucket guard bounds an identical-string pile (r9 skew guard)") {
    import spark.implicits._
    // 500 byte-identical strings share EVERY segment key: unguarded,
    // the idx×prb join emits ~n² candidates from one bucket. The
    // capBucketMembers index cap (count-pass + hash-threshold subset
    // since r10 — no band-key window) bounds per-probe fan-out while
    // the bucket's GUARANTEED min-id member keeps every pair
    // verifying through doc 1, so the pile stays one connected
    // component.
    val s0 = "abcdefghijklmnopqrstuvwxyz0123456789"
    val docs = (1L to 500L).map(i => (i, s0)).toDF("doc_id", "s")
    val pairs = EditDistance.selfJoin(docs, "doc_id", "s", 3, 24, 48,
        maxBucket = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    // every doc is reachable from doc 1 (cluster connectivity intact —
    // the min-id member survives the cap by construction)
    val reach = pairs.collect { case (1L, b) => b }.toSet + 1L
    assert((2L to 500L).forall(reach.contains))
    // and the candidate set is bounded far below the n(n-1)/2 ≈ 125k
    // the unguarded join would verify. The hash-threshold subset is
    // EXPECTED-size cap, Chernoff-concentrated — at this deliberately
    // tiny cap (16 of 500) the binomial tail is wide, so allow the
    // same 4x slack as MinHashSpec's planted-mega-bucket case; at the
    // production cap (4096) the relative tail is negligible.
    assert(pairs.length <= 4 * 16 * 500,
      s"${pairs.length} candidates exceed 4x the expected cap bound")
  }

  test("PassJoin candidate fan-out per document is a bounded constant") {
    import spark.implicits._
    val docs = Seq((1L, "abcdefghijklmnopqrstuvwxyz0123456789ABCDEFGH"))
      .toDF("doc_id", "pre")
    val nProbe = EditDistance.probeKeys(docs, "doc_id", "pre", 3, 24, 48).count()
    val nIdx = EditDistance.segmentKeys(docs, "doc_id", "pre", 3).count()
    assert(nIdx === 4)
    // ≤ (2k+1) lengths × (k+1) segments × (2k+1) positions = 196
    assert(nProbe <= 196, s"probe fan-out $nProbe exceeds the PassJoin bound")
  }

  // --------------------------------------------------------------- ZOrder

  private def refSpread(x: Long): Long =
    (0 until 16).map(b => ((x >> b) & 1L) << (2 * b)).sum

  test("zValue matches the bitwise reference interleave") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val xs = Seq(0L, 1L, 2L, 3L, 0xFFFFL, 0x8000L, 0x5555L, 0xAAAAL) ++
      Seq.fill(50)(rnd.nextInt(65536).toLong)
    val ys = xs.reverse
    val df = xs.zip(ys).toDF("x", "y")
      .withColumn("z", ZOrder.zValue(col("x"), col("y")))
    df.collect().foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(z === (refSpread(x) | (refSpread(y) << 1)),
        s"interleave mismatch for ($x, $y)")
    }
  }

  test("z-order buckets are tight in BOTH dimensions simultaneously") {
    val out = graft.queries.Extras.z1ZorderLayout(spark, sf).collect()
    assert(out.nonEmpty)
    // global extents
    val ckSpan = out.map(_.getLong(3)).max - out.map(_.getLong(2)).min
    val daySpan = out.map(_.getLong(5)).max - out.map(_.getLong(4)).min
    out.foreach { r =>
      val ck = r.getLong(3) - r.getLong(2)
      val day = r.getLong(5) - r.getLong(4)
      // a top-6-bit z bucket is an 8×8 tile of the normalized grid:
      // each bucket's extent must be ≈1/8 of the global span per dim
      assert(ck <= ckSpan / 8 + ckSpan / 64 + 1, s"custkey extent $ck too wide in $r")
      assert(day <= daySpan / 8 + daySpan / 64 + 1, s"day extent $day too wide in $r")
    }
  }

  // ----------------------------------------------------------------- SCD2

  test("SCD2 collapses consecutive statuses and closes versions") {
    import spark.implicits._
    val hist = graft.queries.Relational.u5Scd2Merge(spark, sf)
    val rows = hist.collect()
    assert(rows.nonEmpty)
    val byCust = rows.groupBy(_.getLong(0))
    byCust.foreach { case (_, vs) =>
      val sorted = vs.sortBy(r => (r.getString(2), r.getString(1)))
      // exactly one open (current) version per customer
      assert(sorted.count(_.getBoolean(4)) === 1)
      // consecutive versions never repeat a status (change detection)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getString(1) != b.getString(1) ||
          a.getString(2) == b.getString(2)) // same-day tie may repeat
        case _ => ()
      }
      // each closed version's valid_to equals some later valid_from
      val froms = sorted.map(_.getString(2)).toSet
      sorted.filterNot(_.getBoolean(4)).foreach { r =>
        assert(froms.contains(r.getString(3)),
          s"valid_to ${r.getString(3)} closes onto no successor")
      }
    }
  }

  // ------------------------------------------------------------ mm2 pHash

  test("pHash finds every cross-codec twin and nothing else") {
    val imgs = graft.operators.Multimodal
      .mediaFromDocuments(spark, sf).filter(_.kind == "image").count()
    val pairs = graft.operators.Multimodal.imagePhashPairs(spark, sf).collect()
    // exactly one pair per image: (2k, 2k+1) original/re-encode twins
    assert(pairs.length === imgs)
    pairs.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(b === a + 1 && a % 2 === 0,
        s"unexpected non-twin pair ($a, $b) — cross-image false positive")
    }
  }

  test("pHash is invariant under a lossless BMP round-trip") {
    val media = graft.operators.Multimodal
      .mediaFromDocuments(spark, sf).filter(_.kind == "image").head()
    val img = graft.operators.Multimodal.decodeImage(media.payload)
    val h1 = graft.operators.Multimodal.phash64(img)
    val h2 = graft.operators.Multimodal.phash64(
      graft.sources.Bmp.decode(graft.sources.Bmp.encode(img)))
    assert(h1 === h2)
  }

  // --------------------------------------------------------- time-weighted

  test("mm3 audio features equal a direct synthesis-law recompute (lossless PCM)") {
    // The oracle's premise, checked in-JVM: WAV decode returns the
    // exact synthesized samples, so features from the decode path
    // equal features computed straight from the text bytes.
    val docs = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"), col("n_chars"))
      .where(col("doc_id") % 3 === 1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val got = graft.operators.Multimodal.audioFeatures(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getInt(3))).toMap
    assert(got.size === docs.length && docs.nonEmpty)
    docs.foreach { case (id, text, nChars) =>
      val tb = text.getBytes("UTF-8")
      val n = (nChars % 256).toInt + 64
      var energy = 0L; var peak = 0
      (0 until n).foreach { i =>
        val v = ((tb(i % tb.length) & 0xFF) - 128) * 256
        energy += v.toLong * v.toLong
        peak = math.max(peak, math.abs(v))
      }
      assert(got(id) === ((n, energy, peak)), s"doc $id")
    }
  }

  test("mm4 frame stats: frame census and motion-0 convention (lossless Y4M)") {
    val rows = graft.operators.Multimodal.videoFrameStats(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getInt(4), r.getLong(5)))
    assert(rows.nonEmpty)
    // frame 0 motion is 0 by convention; later frames mostly move
    assert(rows.filter(_._2 == 0).forall(_._6 == 0L))
    assert(rows.exists(r => r._2 > 0 && r._6 > 0L))
    // per-doc frame count matches the synthesis law (n_chars % 7) + 1
    val expected = graft.Tables(spark, sf, "documents")
      .where(col("doc_id") % 3 === 2)
      .select(col("doc_id"), ((col("n_chars") % 7) + 1).cast("int"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val gotCounts = rows.groupBy(_._1).view.mapValues(_.length).toMap
    assert(gotCounts === expected)
    // luma bounds: ASCII text bytes land in [32, 126]
    assert(rows.forall(r => r._4 >= 32 && r._5 <= 126))
  }

  test("mm5 image stats equal a direct synthesis-law recompute (lossless BMP)") {
    val docs = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"), col("n_chars"))
      .where(col("doc_id") % 3 === 0 && (col("doc_id") / 3) % 2 === 1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val got = graft.operators.Multimodal.imageStats(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getLong(3))).toMap
    assert(got.size === docs.length && docs.nonEmpty)
    docs.foreach { case (id, text, nChars) =>
      val tb = text.getBytes("UTF-8")
      def at(i: Int) = tb(i % tb.length) & 0xFF
      val w = (nChars % 24).toInt + 8
      var lumSum = 0L
      (0 until w * 8).foreach { i =>
        lumSum += (at(3 * i) + at(3 * i + 1) + at(3 * i + 2)) / 3
      }
      assert(got(id) === ((w, 8, lumSum)), s"doc $id")
    }
  }

  test("time-weighted average matches a hand computation") {
    import spark.implicits._
    // one user: value 10 held 3 s, 20 held 1 s → twa = (30+20)/4 = 12.5
    val ev = Seq(
      (1L, 0L, 77L, "a", 10.0),
      (2L, 3L * 1000000000L, 77L, "a", 20.0),
      (3L, 4L * 1000000000L, 77L, "a", 99.0) // terminal value carries no weight
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val out = ev.withColumn("next_ts", lead(col("ts"), 1).over(w))
      .where(col("next_ts").isNotNull)
      .withColumn("dt", (col("next_ts") - col("ts")).cast("double") / lit(1e9))
      .groupBy(col("user_id"))
      .agg(round(sum(col("value") * col("dt")) / sum(col("dt")), 4).as("twa"))
      .collect()
    assert(out.length === 1)
    assert(math.abs(out(0).getDouble(1) - 12.5) < 1e-9)
  }
}
