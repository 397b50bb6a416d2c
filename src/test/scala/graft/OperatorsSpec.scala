package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Multimodal, Pca, Similarity}
import graft.sources.Y4m

class OperatorsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions",
      "org.apache.spark.sql.graftx.GraftExtensions")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def md5Of(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("multimodal decode produces deterministic batch-shaped features") {
    val media = Multimodal.mediaFromDocuments(spark, sf)
    // the image slice mixes REAL compressed (JPEG) and uncompressed
    // (BMP) payloads — both container paths must be present and decode
    val imgs = media.collect().filter(_.kind == "image")
    val jpegs = imgs.count(m => (m.payload(0) & 0xFF) == 0xFF &&
      (m.payload(1) & 0xFF) == 0xD8)
    assert(jpegs > 0 && jpegs < imgs.length,
      s"expected mixed JPEG/BMP image payloads, got $jpegs/${imgs.length} JPEG")
    val feats = Multimodal.decodeFeatures(media, batchSize = 64).collect()
    assert(feats.length === 500)
    feats.foreach { f =>
      assert(f.feature.length === 8)
      assert(math.abs(f.feature.sum - 1.0) < 1e-9) // normalized histogram
    }
    val again = Multimodal.decodeFeatures(
      Multimodal.mediaFromDocuments(spark, sf), batchSize = 7).collect()
    // batch size must not affect results (pure per-row kernel in batches)
    assert(feats.map(f => (f.media_id, f.feature)).sortBy(_._1).toSeq ===
      again.map(f => (f.media_id, f.feature)).sortBy(_._1).toSeq)
  }

  test("BMP codec: known pixel stats for a canned fixture (mm decode)") {
    import graft.sources.Bmp
    // 2×2: red, green / blue, white — encode → decode round-trips
    val img = Bmp.Image(2, 2, Array(0xFF0000, 0x00FF00, 0x0000FF, 0xFFFFFF))
    val rt = Bmp.decode(Bmp.encode(img))
    assert(rt.width === 2 && rt.height === 2)
    assert(rt.rgb.toSeq === img.rgb.toSeq)
    // hand-assembled golden bytes: 1×1 pure red, bottom-up BI_RGB.
    // row stride pads 3 bytes to 4; pixel stored B,G,R.
    val golden = new Array[Byte](54 + 4)
    golden(0) = 'B'; golden(1) = 'M'
    golden(2) = 58 // file size (LE32, low byte)
    golden(10) = 54 // data offset
    golden(14) = 40 // info header size
    golden(18) = 1 // width
    golden(22) = 1 // height
    golden(26) = 1 // planes
    golden(28) = 24 // bpp
    golden(54) = 0 // B
    golden(55) = 0 // G
    golden(56) = 0xFF.toByte // R
    val g = Bmp.decode(golden)
    assert(g.width === 1 && g.height === 1 && g.rgb.toSeq === Seq(0xFF0000))
    // odd width exercises row padding (3×1 → 9 data bytes padded to 12)
    val odd = Bmp.Image(3, 1, Array(0x010203, 0x040506, 0x070809))
    assert(Bmp.decode(Bmp.encode(odd)).rgb.toSeq === odd.rgb.toSeq)
    // image feature = normalized luminance histogram of DECODED pixels:
    // red(lum 85→bin 2), green(85→2), blue(85→2), white(255→7)
    import spark.implicits._
    val media = Seq(Multimodal.MediaRow(0L, "image", Bmp.encode(img),
      2, 2, 1)).toDS()
    val f = Multimodal.decodeFeatures(media).collect().head
    assert(f.decoded_bytes === 12)
    assert(f.feature(2) === 0.75 && f.feature(7) === 0.25)
    assert(f.feature.sum === 1.0)
  }

  test("image resize: box-average downsample with known pixel math (mm resize)") {
    import graft.sources.Bmp
    import spark.implicits._
    // 4×2 image: left half pure red, right half pure blue →
    // 2×1 resize: each output pixel averages a uniform 2×2 box
    val rgb = Array(0xFF0000, 0xFF0000, 0x0000FF, 0x0000FF,
                    0xFF0000, 0xFF0000, 0x0000FF, 0x0000FF)
    val media = Seq(
      Multimodal.MediaRow(0L, "image", Bmp.encode(Bmp.Image(4, 2, rgb)), 4, 2, 1),
      Multimodal.MediaRow(1L, "audio", Array[Byte](1, 2, 3), 3, 1, 1)).toDS()
    val out = Multimodal.resizeImages(media, 2, 1).collect().sortBy(_.media_id)
    val img = Bmp.decode(out(0).payload)
    assert(img.width === 2 && img.height === 1)
    assert(img.rgb.toSeq === Seq(0xFF0000, 0x0000FF))
    assert(out(0).width === 2 && out(0).height === 1)
    // non-image rows pass through untouched
    assert(out(1).payload.toSeq === Seq[Byte](1, 2, 3))
    // mixed box: 2×2 half red half blue → 1×1 averages to 0x7F007F
    val mixed = Seq(Multimodal.MediaRow(2L, "image",
      Bmp.encode(Bmp.Image(2, 2, Array(0xFF0000, 0x0000FF, 0xFF0000, 0x0000FF))),
      2, 2, 1)).toDS()
    val m1 = Bmp.decode(Multimodal.resizeImages(mixed, 1, 1)
      .collect().head.payload)
    assert(m1.rgb.toSeq === Seq(0x7F007F))
    // upscale-ish odd ratios stay in bounds and deterministic
    val odd = Multimodal.resizeImages(mixed, 3, 3).collect().head
    assert(Bmp.decode(odd.payload).rgb.length === 9)
  }

  test("WAV codec: known sample stats for a canned fixture (mm decode)") {
    import graft.sources.Wav
    // encode → decode round-trips samples, rate, channels
    val a = Wav.Audio(8000, 1, Array[Short](0, 1000, -1000, 32767, -32768))
    val rt = Wav.decode(Wav.encode(a))
    assert(rt.sampleRate === 8000 && rt.channels === 1)
    assert(rt.samples.toSeq === a.samples.toSeq)
    // unknown chunks between fmt and data are skipped (word-aligned)
    val enc = Wav.encode(a)
    val junk = Array[Byte]('j', 'u', 'n', 'k', 3, 0, 0, 0, 1, 2, 3, 0)
    val withJunk = enc.take(36) ++ junk ++ enc.drop(36)
    assert(Wav.decode(withJunk).samples.toSeq === a.samples.toSeq)
    // audio feature = amplitude histogram of DECODED samples (top 3
    // bits of the unsigned-16 representation): 0→bin0, 1000→0,
    // -1000→7, 32767→3, -32768→4
    import spark.implicits._
    val media = Seq(Multimodal.MediaRow(1L, "audio", enc,
      a.samples.length, 1, 1)).toDS()
    val f = Multimodal.decodeFeatures(media).collect().head
    assert(f.decoded_bytes === 10)
    assert(f.feature(0) === 0.4 && f.feature(3) === 0.2 &&
      f.feature(4) === 0.2 && f.feature(7) === 0.2)
    // malformed payloads fail loudly, not silently
    assertThrows[IllegalArgumentException](Wav.decode(Array[Byte](1, 2, 3)))
  }

  test("approx quantiles stay within the sketch error bound of exact") {
    // sk1-style: the production approx_percentile path must track the
    // exact (oracle-twin) result; GK accuracy 10000 over sf0.01's
    // ~3000-row groups pins the rank error under one rank, so the
    // residual is interpolation only.
    val dir = "/root/testdata/sf0.01"
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = keyed(queries.Extras.a9Quantiles(spark, dir))
    val approx = keyed(queries.Extras.a9QuantilesGk(spark, dir))
    assert(exact.keySet === approx.keySet)
    exact.foreach { case (k, exQs) =>
      exQs.zip(approx(k)).zipWithIndex.foreach { case ((ex, ap), i) =>
        val rel = math.abs(ap - ex) / math.abs(ex)
        assert(rel < 0.01, s"group $k quantile #$i: exact=$ex approx=$ap")
      }
    }
  }

  test("chunked table hash: partition-invariant, order-independent, content-sensitive (D7)") {
    import spark.implicits._
    // enough rows that many hash-prefix chunks are populated and the
    // 3-level combine actually exercises ordered concatenation
    val base = (1L to 5000L).map(i => (i, s"payload_$i")).toDF("id", "v")
    def h(df: org.apache.spark.sql.DataFrame) = core.Hashing.tableHash(df)
    val one = h(base.repartition(1))
    val many = h(base.repartition(16).sortWithinPartitions(desc("v")))
    assert(one === many) // same multiset ⇒ same hash, any partitioning/order
    val perturbed = base.withColumn("v",
      when(col("id") === 42L, lit("mutated")).otherwise(col("v")))
    assert(h(perturbed) !== one) // single-row change flips the hash
    val dropped = base.where(col("id") =!= 4999L)
    assert(h(dropped) !== one)
  }

  test("integer-quantized pHash tracks the production double pHash (mm2 oracle tier)") {
    // same law, different arithmetic: the integer twin may flip only
    // coefficients sitting within quantization error of the median —
    // on the fixture corpus that is a small hamming distance, and the
    // POOLED structure (bands used for dedup blocking) stays aligned
    val media = Multimodal.mediaFromDocuments(spark, sf)
      .filter(m => m.kind == "image" && (m.media_id / 3) % 2 == 1)
      .collect()
    assert(media.nonEmpty)
    val dists = media.map { m =>
      val img = Multimodal.decodeImage(m.payload)
      java.lang.Long.bitCount(
        Multimodal.phash64(img) ^ Multimodal.phash64Int(img))
    }
    assert(dists.forall(_ <= 6),
      s"worst int-vs-double pHash hamming ${dists.max} exceeds the " +
        "quantization-jitter envelope")
    assert(dists.count(_ <= 2) >= media.length / 2)
  }

  test("multimodal frame sampling emits every Nth frame of videos") {
    val media = Multimodal.mediaFromDocuments(spark, sf)
    val frames = Multimodal.sampleFrames(media, rate = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 2 == 0))
    val nVideos = media.filter(_.kind == "video").count()
    assert(frames.map(_.media_id).distinct.length === nVideos)
    // every sampled frame is itself a valid single-frame Y4M payload
    frames.take(10).foreach { f =>
      val v = Y4m.decode(f.payload)
      assert(v.frames.length === 1)
      assert(v.frames.head.y.length === v.width * v.height)
    }
  }

  test("Y4M video codec: round trip, header tolerance, real luma feature (known math)") {
    // 4x2 C420 two-frame round trip with distinct planes
    val f0 = Y4m.Frame(Array.tabulate(8)(_.toByte),
      Array[Byte](1, 2), Array[Byte](3, 4))
    val f1 = Y4m.Frame(Array.tabulate(8)(i => (100 + i).toByte),
      Array[Byte](5, 6), Array[Byte](7, 8))
    val v = Y4m.Video(4, 2, 30, 1, "420", Vector(f0, f1))
    val rt = Y4m.decode(Y4m.encode(v))
    assert(rt.width === 4 && rt.height === 2 && rt.colorspace === "420")
    assert(rt.frames.length === 2)
    assert(rt.frames(0).y.toSeq === f0.y.toSeq && rt.frames(0).u.toSeq === f0.u.toSeq)
    assert(rt.frames(1).y.toSeq === f1.y.toSeq && rt.frames(1).v.toSeq === f1.v.toSeq)
    assert(Y4m.frameCount(Y4m.encode(v)) === 2)
    // header tolerance: C420jpeg variant, X comment params, FRAME params
    val hdr = "YUV4MPEG2 W2 H2 F25:1 Ip A1:1 C420jpeg XYSCSS=420JPEG\n"
    val body = "FRAME Xtag\n".getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30, 40, 50, 60) // 4 luma + 1 u + 1 v
    val tol = Y4m.decode(hdr.getBytes("US-ASCII") ++ body)
    assert(tol.colorspace === "420" && tol.fpsNum === 25)
    assert(tol.frames.head.y.toSeq === Seq[Byte](10, 20, 30, 40))
    assert(tol.frames.head.u.toSeq === Seq[Byte](50))
    // mono: no chroma planes
    val mono = Y4m.Video(2, 2, 30, 1, "mono",
      Vector(Y4m.Frame(Array[Byte](64, 64, (192 & 0xFF).toByte,
        (192 & 0xFF).toByte), Array.empty, Array.empty)))
    assert(Y4m.decode(Y4m.encode(mono)).frames.head.y.length === 4)
    // video feature = luma histogram of DECODED frames: Y=64→bin2,
    // Y=192→bin6, half each; decoded_bytes counts all planes
    import spark.implicits._
    val media = Seq(Multimodal.MediaRow(7L, "video",
      Y4m.encode(mono), 2, 2, 1)).toDS()
    val feat = Multimodal.decodeFeatures(media).collect().head
    assert(feat.feature(2) === 0.5 && feat.feature(6) === 0.5)
    assert(feat.decoded_bytes === 4)
    // malformed payloads fail loudly, not silently — decode AND the
    // metadata-probe frameCount enforce the same structure
    assertThrows[IllegalArgumentException](Y4m.decode("JUNK\n".getBytes))
    assertThrows[IllegalArgumentException](
      Y4m.decode("YUV4MPEG2 W2 H2 C444\nFRAME\n".getBytes("US-ASCII")))
    assertThrows[IllegalArgumentException](
      Y4m.frameCount("YUV4MPEG2 C420\nFRAME\n".getBytes("US-ASCII"))) // no W/H
    assertThrows[IllegalArgumentException](
      Y4m.frameCount("YUV4MPEG2 W2 H2 C444\nFRAME\n".getBytes("US-ASCII"))) // truncated
    assertThrows[IllegalArgumentException](
      Y4m.frameCount((Y4m.encode(mono) ++ "JUNK".getBytes).toArray)) // trailing bytes
  }

  test("ANN LSH finds a meaningful fraction of true neighbors, cheaply") {
    val e = Tables(spark, sf, "embeddings")
      .repartition(col("vec_id"))
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val q = e.where(col("vec_id") < 5)
    // 4 planes → 16 buckets: right for a 500-vector corpus (bucket
    // count should scale with corpus size; more planes = higher
    // precision, lower recall)
    val ann = Similarity.annTopK(e, q, "v", "vec_id",
      k = 10, nPlanes = 4, seed = 42L, dim = 64)
    val annPairs = ann.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = graft.queries.SimilarityOps.s1KnnBruteforce(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = annPairs.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.2, s"recall $recall too low") // approximate, but useful
    // determinism
    val again = Similarity.annTopK(e, q, "v", "vec_id",
      k = 10, nPlanes = 4, seed = 42L, dim = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again === annPairs)
  }

  test("IVF ANN: trained cells, probe join, recall vs exact baseline") {
    val e = Tables(spark, sf, "embeddings")
      .repartition(col("vec_id"))
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val q = e.where(col("vec_id") < 5)
    val ivf = Similarity.Ivf.topK(e, q, "v", "vec_id",
      k = 10, nlist = 16, nprobe = 4, iters = 2, seed = 42L)
    val got = ivf.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = graft.queries.SimilarityOps.s1KnnBruteforce(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = got.intersect(exact).size.toDouble / exact.size
    // nprobe/nlist = 1/4 of the cells probed → recall must beat the
    // probed-fraction baseline by a wide margin (cells are adaptive)
    assert(recall >= 0.5, s"IVF recall $recall too low")
    // deterministic replay (seeded init, fixed Lloyd iterations)
    val again = Similarity.Ivf.topK(e, q, "v", "vec_id",
      k = 10, nlist = 16, nprobe = 4, iters = 2, seed = 42L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again === got)
    // candidates are a strict subset of the corpus per query: every
    // returned neighbor lives in a probed cell
    assert(ivf.groupBy("query_id").count().collect()
      .forall(_.getLong(1) <= 10))
  }

  test("IVF-PQ: nibble codes, ADC + rerank recall, planted duplicate at rank 1") {
    val e = Tables(spark, sf, "embeddings")
      .repartition(col("vec_id"))
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val q = e.where(col("vec_id") < 5)
    val pq = Similarity.Ivf.topKPq(e, q, "v", "vec_id",
      k = 10, nlist = 16, m = 8, ksub = 16, nprobe = 4, iters = 2,
      seed = 42L)
    val got = pq.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = graft.queries.SimilarityOps.s1KnnBruteforce(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // quantization loses precision vs IVF-Flat's 0.5 floor, but the
    // exact rerank of 4k ADC candidates must still beat the
    // probed-fraction (1/4) baseline
    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.3, s"IVF-PQ recall $recall too low")
    // deterministic replay (seeded sample, init, Lloyd, tie-breaks)
    val again = Similarity.Ivf.topKPq(e, q, "v", "vec_id",
      k = 10, nlist = 16, m = 8, ksub = 16, nprobe = 4, iters = 2,
      seed = 42L).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again === got)
    // the code column really is m nibble-range indices
    val model = Similarity.Ivf.trainPq(e, "v", "vec_id",
      nlist = 16, m = 8, ksub = 16, iters = 2, seed = 42L)
    val codes = Similarity.Ivf.encodePq(
      e.select(col("vec_id"), col("v")), "vec_id", "v", model)
      .select(col("code")).limit(64).collect()
      .map(_.getSeq[Int](0))
    assert(codes.forall(c => c.length == 8 && c.forall(j => j >= 0 && j < 16)))
    // a corpus clone of the query vector (planted under a fresh id)
    // must come back at rank 1 with cosine 1: its cell matches the
    // query's nearest cell and its ADC score is the table minimum
    import spark.implicits._
    val clone = e.where(col("vec_id") === 0)
      .select(lit(900000L).as("vec_id"), col("v"))
    val planted = Similarity.Ivf.topKPq(e.unionByName(clone),
      e.where(col("vec_id") === 0), "v", "vec_id",
      k = 3, nlist = 16, m = 8, ksub = 16, nprobe = 4, iters = 2,
      seed = 42L).collect()
    assert(planted.head.getLong(1) === 900000L &&
      planted.head.getDouble(2) === 1.0)
  }

  test("PCA: orthonormal components, descending variance, planted axis found") {
    import spark.implicits._
    // planted dominant direction: x = a·e0·10 + small noise on e1..e3
    val rng = new scala.util.Random(7)
    val rows = (0L until 400L).map { i =>
      val v = new Array[Double](8)
      v(0) = rng.nextGaussian() * 10.0
      (1 until 4).foreach(j => v(j) = rng.nextGaussian())
      (i, v)
    }
    val df = rows.toDF("vec_id", "v")
    val m = Pca.fit(df, "v", r = 3)
    // components orthonormal
    for (a <- 0 until 3; b <- 0 until 3) {
      val dot = m.components(a).zip(m.components(b)).map(t => t._1 * t._2).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-9,
        s"U($a)·U($b) = $dot")
    }
    // eigenvalues descending, top one ≈ planted 10² variance
    assert(m.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    assert(m.eigenvalues(0) > 50.0 && m.eigenvalues(0) < 200.0)
    // first component aligns with the planted axis
    assert(math.abs(m.components(0)(0)) > 0.99,
      s"pc1 not on e0: ${m.components(0).toSeq}")
    // sign convention: largest-|coordinate| positive
    assert(m.components.forall { c =>
      c(c.indices.maxBy(i => math.abs(c(i)))) > 0 })
    // projection of a vector equals the driver-side arithmetic
    val proj = Pca.project(df, "vec_id", "v", m).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val (id0, v0) = rows.head
    val expect = m.components.map(c =>
      c.indices.map(i => c(i) * (v0(i) - m.mean(i))).sum)
    assert(proj(id0).zip(expect).forall(t => math.abs(t._1 - t._2) < 1e-9))
    // variance along pc1 in the projected data ≈ eigenvalue 0
    val p1 = proj.values.map(_.head).toSeq
    val mu = p1.sum / p1.size
    val varp = p1.map(x => (x - mu) * (x - mu)).sum / p1.size
    assert(math.abs(varp - m.eigenvalues(0)) / m.eigenvalues(0) < 1e-6)
  }

  test("ANN candidate generation is sub-linear (bucketed, not full scan)") {
    val e = Tables(spark, sf, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val pl = Similarity.planes(8, 64, 42L)
    val buckets = Similarity.bucketize(e, "v", pl)
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    val maxBucket = buckets.agg(max(col("n"))).collect()(0).getLong(0)
    assert(maxBucket < 100) // 500 vectors spread over 256 buckets
  }

  test("PII redaction scrubs emails/IPs/phones with typed tags and hit counts (t8)") {
    import spark.implicits._
    val rows = Seq(
      (1L, "contact alice.smith+x@example.org or 10.0.0.1 now"),
      (2L, "call 555-123-4567 or +14155550123 today"),
      (3L, "no pii here at all"),
      (4L, "version 1.2.3.4 is an ip-shaped string")).toDF("id", "text")
    val out = rows.select(col("id"),
      queries.TextOps.redact(col("text")).as("r"),
      queries.TextOps.redactCount(col("text")).as("n"))
      .collect().sortBy(_.getLong(0))
    assert(out(0).getString(1) === "contact <EMAIL> or <IP> now")
    assert(out(0).getLong(2) === 2L)
    assert(out(1).getString(1) === "call <PHONE> or <PHONE> today")
    assert(out(1).getLong(2) === 2L)
    assert(out(2).getString(1) === "no pii here at all")
    assert(out(2).getLong(2) === 0L)
    assert(out(3).getString(1) === "version <IP> is an ip-shaped string")
  }

  test("bigram-LM cross-entropy matches hand math on a tiny corpus (t11)") {
    import spark.implicits._
    // bigrams: "a b"×2, "a c"×1 ⇒ c(a·)=3; p(b|a)=2/3, p(c|a)=1/3
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val out = queries.TextOps.lmXentOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      .sortBy(_._1) // query output is unordered (r16)
    def q(p: Double) = math.rint(math.log(p) * 1e6) / 1e6 // micro-nat quantized
    assert(out === Seq(
      (1L, 1L, math.rint(-q(2.0 / 3) * 1e6) / 1e6),
      (2L, 1L, math.rint(-q(2.0 / 3) * 1e6) / 1e6),
      (3L, 1L, math.rint(-q(1.0 / 3) * 1e6) / 1e6)))
    // the common transition scores lower xent than the rare one
    assert(out.head._3 < out.last._3)
  }

  test("capped t11: rare bigrams drop from the model, marginals stay true, all-OOV docs stay total") {
    import spark.implicits._
    // "a b"×2 survives minCount=2; "a c"×1 is OOV; doc 4 is all-OOV
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "x y"))
      .toDF("doc_id", "text")
    val out = queries.TextOps.lmXentCappedOf(docs, minCount = 2L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // lp("a b") = ln(2/3): the marginal c(a·)=3 still counts the
    // pruned "a c" occurrence (true-denominator formulation)
    val xab = math.rint(-(math.rint(math.log(2.0 / 3) * 1e6)) / 1e6 * 1e6) / 1e6
    assert(out === Seq(
      (1L, 1L, xab), (2L, 1L, xab), (3L, 0L, 0.0), (4L, 0L, 0.0)))
  }

  test("capped t10: below-floor tokens score zero, docs stay total") {
    import spark.implicits._
    // "w" appears in 2 docs (df=2 ≥ minDf=2); "r"/"z" in 1 doc each (pruned)
    val docs = Seq((1L, "w w r"), (2L, "w"), (3L, "z"))
      .toDF("doc_id", "text")
    val out = queries.TextOps.tfidfCappedOf(docs, minDf = 2L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val idfW = math.rint(math.log(3.0 / 2) * 1e6).toLong
    assert(out === Seq((1L, 2 * idfW), (2L, idfW), (3L, 0L)))
  }

  test("quality classifier learns the weak label on held-out docs (m10)") {
    val scored = graft.fit.QualityModel.m10QualityClassifier(spark, sf)
    val rows = scored.collect()
    assert(rows.length === 500)
    // weak labels are balanced (265/500 positive at sf0.001), so a
    // majority-class predictor sits at 0.53 — the 0.8 gate means the
    // model actually learned the feature→label mapping
    val labels = rows.map(_.getLong(1))
    assert(labels.sum > 100 && labels.sum < 400)
    val acc = graft.fit.QualityModel.holdoutAccuracy(scored)
    assert(acc >= 0.8, s"held-out accuracy $acc")
    // labels and features are deterministic column expressions —
    // re-featurizing reproduces identical labels
    val again = graft.fit.QualityModel.m10QualityClassifier(spark, sf)
      .collect().map(_.getLong(1))
    assert(again.toSeq === labels.toSeq)
  }

  test("NB quality classifier: planted vocab separates, fixture holdout learned (m15)") {
    import spark.implicits._
    // planted two-class corpus: label-1 docs are stopword-rich (t2
    // quality ≥ 0.3), label-0 docs are junk tokens; disjoint vocab →
    // NB must classify every holdout doc (doc_id % 5 = 0) correctly
    val docs = (0L until 40L).map { i =>
      val txt = if (i % 2 == 0) Seq.fill(10)("the a of and to in").mkString(" ")
                else Seq.fill(8)(s"zz qq xx").mkString(" ")
      (i, txt)
    }.toDF("doc_id", "text")
    val out = graft.fit.QualityModel.nbClassifierOf(docs).collect()
    assert(out.length === 40)
    assert(out.forall(_.getBoolean(4)), "disjoint vocab must classify perfectly")
    // margins have the right sign and are symmetric in structure
    assert(out.filter(_.getLong(1) == 1L).forall(_.getLong(3) > 0))
    assert(out.filter(_.getLong(1) == 0L).forall(_.getLong(3) < 0))

    // fixture: held-out accuracy clears the same 0.8 gate as m10
    val scored = graft.fit.QualityModel.m15NbQuality(spark, sf)
    val acc = graft.fit.QualityModel.holdoutAccuracy(scored)
    assert(acc >= 0.8, s"NB held-out accuracy $acc")
    // closed-form model: bit-identical across runs
    val a = scored.collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    val b = graft.fit.QualityModel.m15NbQuality(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(a === b)
  }

  test("deterministic logistic twin learns the holdout and is bit-stable (m10_logistic_det)") {
    val scored = graft.fit.QualityModel.m10LogisticDet(spark, sf)
    val rows = scored.collect()
    assert(rows.length === 500)
    // same 0.8 holdout gate as m10's L-BFGS and m15's NB: the hard-
    // sigmoid fixed-point GD must actually learn the feature→label map
    val acc = graft.fit.QualityModel.holdoutAccuracy(scored)
    assert(acc >= 0.8, s"deterministic-logistic held-out accuracy $acc")
    // both classes predicted (not a majority-class collapse)
    val preds = rows.map(_.getLong(2)).toSet
    assert(preds === Set(0L, 1L))
    // exact integer chain: bit-identical margins across runs
    val again = graft.fit.QualityModel.m10LogisticDet(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(again === rows.map(r => (r.getLong(0), r.getLong(3))).toSeq)
  }

  test("sequence packing: contiguous full chunks, token conservation, single carry-in (p1)") {
    val out = queries.PackOps.p1PackSequences(spark, sf).collect()
      .sortBy(_.getLong(0)) // query output is unordered (r16)
    assert(out.nonEmpty)
    // chunk ids are contiguous from 0
    assert(out.map(_.getLong(0)).toSeq === (0L until out.length).toSeq)
    // every chunk except the tail holds exactly ChunkCap tokens
    out.dropRight(1).foreach(r =>
      assert(r.getLong(2) === queries.PackOps.ChunkCap))
    assert(out.last.getLong(2) <= queries.PackOps.ChunkCap)
    // packing conserves the corpus token count exactly
    val total = Tables(spark, sf, "documents")
      .select(sum(size(split(col("text"), " ")).cast("long")))
      .collect()(0).getLong(0)
    assert(out.map(_.getLong(2)).sum === total)
    // concat layout: at most ONE document can carry across each boundary
    out.foreach(r => assert(r.getLong(3) <= 1L))
    assert(out.forall(_.getLong(1) >= 1L))
  }

  test("t12 collocations: PMI micro-nats on a hand-computed corpus") {
    import spark.implicits._
    // bigram counts: "a b" 15, "b a" 10, "c d" 5 (N = 30); the
    // min-count floor of 5 keeps all three. By hand:
    //   PMI(c d) = ln(5·30 / (5·5))   = ln 6
    //   PMI(b a) = ln(10·30 / (10·10)) = ln 3
    //   PMI(a b) = ln(15·30 / (15·15)) = ln 2
    val docs = ((1 to 5).map(i => (i.toLong, "a b a b a b")) ++
      (6 to 10).map(i => (i.toLong, "c d"))).toDF("doc_id", "text")
    val got = queries.TextOps.collocationsOf(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      ("c d", 5L, math.round(math.log(6) * 1e6)),
      ("b a", 10L, math.round(math.log(3) * 1e6)),
      ("a b", 15L, math.round(math.log(2) * 1e6))))
  }

  test("p2 chunk windows: counts, tail sizes, and hash at the boundaries") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 150).map(i => s"w$i").mkString(" ")), // 3 windows
      (2L, (1 to 64).map(i => s"x$i").mkString(" ")), // exactly one
      (3L, (1 to 65).map(i => s"y$i").mkString(" ")) // 64 + tail of 17
    ).toDF("doc_id", "text")
    val rows = queries.PackOps.chunkWindowsOf(docs, 64, 48).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.filter(_._1 == 1L).map(x => (x._2, x._3)).toSeq ===
      Seq((0L, 64L), (1L, 64L), (2L, 54L)))
    assert(rows.filter(_._1 == 2L).map(x => (x._2, x._3)).toSeq ===
      Seq((0L, 64L)))
    assert(rows.filter(_._1 == 3L).map(x => (x._2, x._3)).toSeq ===
      Seq((0L, 64L), (1L, 17L)))
    // stride arithmetic: doc1's tail window is tokens 97..150 exactly
    val tail = (97 to 150).map(i => s"w$i").mkString(" ")
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(tail.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows.find(x => x._1 == 1L && x._2 == 2L).get._4 === md)
  }

  test("d10 semdedup: copies flagged, first of each kept, uniques survive") {
    import spark.implicits._
    // 4 groups of 3 identical one-hot vectors (ids g, g+4, g+8) plus
    // 4 unique vectors one-hot on the remaining dims (ids 12..15,
    // orthogonal to everything → never near-dups)
    val rows = (0 until 12).map { id =>
      (id.toLong, Seq.tabulate(8)(d => if (d == id % 4) 1.0 else 0.0))
    } ++ (12 until 16).map { id =>
      (id.toLong, Seq.tabulate(8)(d => if (d == id - 8) 1.0 else 0.0))
    }
    val emb = rows.toDF("vec_id", "v")
    def run() = Similarity.semDedup(emb, "v", "vec_id", nlist = 4,
      tau = 0.95, iters = 2, seed = 7L).collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getBoolean(3)))
    val out = run()
    assert(out.length === 16)
    assert(out.map(_._1).toSeq === (0L until 16L)) // one verdict per vector
    // exactly the later copies are duplicates, at cosine exactly 1
    assert(out.filter(_._3).map(_._1).toSet ===
      Set(4L, 5L, 6L, 7L, 8L, 9L, 10L, 11L))
    out.filter(x => x._1 >= 4 && x._1 < 12).foreach(x => assert(x._2 === 1.0))
    assert(out.toSeq === run().toSeq) // pinned seed → deterministic
  }

  test("t13 gopher rules: each gate flips at its boundary") {
    import spark.implicits._
    val w = (n: Int, word: String) => Seq.fill(n)(word).mkString(" ")
    val docs = Seq(
      (1L, w(49, "word")),                          // 49 words → r_words false
      (2L, w(48, "word") + " the a"),               // 50 words, 2 stops → pass
      (3L, w(50, "ab")),                            // mean len 2 → r_word_len false
      (4L, w(50, "abcdefghijk")),                   // mean len 11 → r_word_len false
      (5L, w(49, "word") + " the"),                 // 1 stop → r_stop false
      (6L, w(48, "abc") + " the and")               // mean len exactly 3.0 → pass
    ).toDF("doc_id", "text")
    val out = queries.TextOps.gopherRulesOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(4),
        r.getBoolean(5), r.getBoolean(6), r.getBoolean(7))).toMap
    assert(out(1L) === ((49L, false, true, false, false)))
    assert(out(2L) === ((50L, true, true, true, true)))
    assert(out(3L)._3 === false); assert(out(3L)._5 === false)
    assert(out(4L)._3 === false)
    assert(out(5L) === ((50L, true, true, false, false)))
    assert(out(6L) === ((50L, true, true, true, true))) // inclusive bound
    // mean_word_len math: doc 6 = (48·3 + 3 + 3)/50 = 3.0 exactly
    val m6 = queries.TextOps.gopherRulesOf(docs).collect()
      .find(_.getLong(0) == 6L).get.getDouble(2)
    assert(m6 === 3.0)
  }

  test("d11 window dedup: shared windows flag later docs, short docs survive") {
    import spark.implicits._
    val t = (r: Range, p: String) => r.map(i => s"$p$i").mkString(" ")
    val docs = Seq(
      (1L, t(1 to 10, "a")),                 // 6 five-token windows
      (2L, t(3 to 7, "a") + " " + t(1 to 5, "b")), // first window = doc1's pos-3
      (3L, t(1 to 10, "c")),                 // disjoint
      (4L, "d1 d2 d3"),                      // < k tokens → no windows
      (5L, t(1 to 10, "a")),                 // exact copy of doc 1
      (6L, Seq.fill(7)("x").mkString(" "))   // 3 identical windows → 1 distinct
    ).toDF("doc_id", "text")
    val out = queries.DedupOps.windowDedupOf(docs, 5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(out(1L) === ((6L, 0L, false)))   // first owner, never dup
    assert(out(2L) === ((6L, 1L, true)))    // one borrowed window
    assert(out(3L) === ((6L, 0L, false)))
    assert(out(4L) === ((0L, 0L, false)))   // short doc: zero windows, kept
    assert(out(5L) === ((6L, 6L, true)))    // verbatim copy: all windows shared
    assert(out(6L) === ((1L, 0L, false)))   // within-doc repeats are NOT sharing
  }

  test("d12 bloom incremental dedup: planted window copies confirmed, fp never surfaces") {
    import spark.implicits._
    val t = (r: Range, p: String) => r.map(i => s"$p$i").mkString(" ")
    val corpus = Seq(
      (10L, t(1 to 12, "a")),
      (11L, t(1 to 12, "b")),
      (12L, t(1 to 12, "c"))).toDF("doc_id", "text")
    val incoming = Seq(
      (1L, t(3 to 9, "a")),        // 7 tokens inside corpus doc 10 → 3 shared 5-windows
      (2L, t(1 to 12, "z")),       // disjoint → even a bloom fp must verify to false
      (3L, "q1 q2 q3"),            // < k tokens → no windows
      (4L, t(1 to 12, "b"))        // verbatim corpus copy → all 8 windows shared
    ).toDF("doc_id", "text")
    val out = queries.DedupOps.bloomDedupOf(corpus, incoming, k = 5, fpp = 0.01)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(out(1L) === ((3L, 3L, true)))
    assert(out(2L) === ((8L, 0L, false))) // exact verify kills any fp
    assert(out(3L) === ((0L, 0L, false)))
    assert(out(4L) === ((8L, 8L, true)))
    // no false negatives by construction: every true shared window is hit
  }

  test("w4 funnel: stage windows anchor strictly after the prior stage") {
    import spark.implicits._
    val d = 24L * 3600 * 1000 * 1000 * 1000 // one day in ns
    val t0 = 1000L * d
    val ev = Seq(
      (1L, t0, "view"), (1L, t0 + d, "click"), (1L, t0 + 2 * d, "purchase"),
      (2L, t0, "view"), (2L, t0 + 8 * d, "click"),      // click outside 7d
      (3L, t0, "click"),                                 // no view → nothing
      (4L, t0, "view"), (4L, t0 + d, "click"), (4L, t0 + 10 * d, "purchase"),
      (5L, t0 - d, "click"), (5L, t0, "view"), (5L, t0 + d, "purchase")
      // u5: click precedes the first view → stage 2 never anchors
    ).toDF("user_id", "ts", "event_type")
    val out = queries.Extras.funnelOf(ev).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("1_view" -> 4L, "2_click" -> 2L, "3_purchase" -> 1L))
  }

  test("d13 keep-best: highest-quality member survives, ties break to smallest id") {
    import spark.implicits._
    val clusters = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), // one 3-clique labeled by its min id
      (4L, 4L)                      // singleton keeps itself
    ).toDF("doc_id", "cluster_id")
    val quality = Seq(
      (1L, 0.1), (2L, 0.9), (3L, 0.9), // 2 and 3 tie → smaller id wins
      (4L, 0.2)
    ).toDF("doc_id", "quality")
    val out = queries.DedupOps.keepBestOf(clusters, quality).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
    assert(out === Map(
      1L -> ((3L, false)), 2L -> ((3L, true)), 3L -> ((3L, false)),
      4L -> ((1L, true))))
  }

  test("w5 retention: cohorts anchor on first day, offsets count distinct users") {
    import spark.implicits._
    val d = 24L * 3600 * 1000 * 1000 * 1000 // one day in ns
    val t0 = 1000L * d
    val ev = Seq(
      (1L, t0), (1L, t0 + d), (1L, t0 + d + 1), (1L, t0 + 3 * d),
      // u1: day0 cohort, active offsets 0/1/3 (two day-1 events → one)
      (2L, t0 + d / 2),          // u2: day0 cohort, day 0 only
      (3L, t0 + d), (3L, t0 + 2 * d) // u3: day1 cohort, offsets 0/1
    ).toDF("user_id", "ts")
    val out = queries.Extras.retentionOf(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out === Map(
      (1000L, 0L) -> ((2L, 1.0)), (1000L, 1L) -> ((1L, 0.5)),
      (1000L, 3L) -> ((1L, 0.5)),
      (1001L, 0L) -> ((1L, 1.0)), (1001L, 1L) -> ((1L, 1.0))))
  }

  test("m11 mix execute: keep rule replays exactly, weighted sources sample more") {
    import spark.implicits._
    // two sources under the m9 policy: src1 weighs 2, src20 weighs 1;
    // 40 docs × 100 tokens each per source
    val docs = (0 until 40).flatMap { i =>
      Seq((s"src1", i.toLong, Seq.fill(100)("w").mkString(" ")),
        (s"src20", (100 + i).toLong, Seq.fill(100)("w").mkString(" ")))
    }.toDF("source", "doc_id", "text")
    val out = queries.PackOps.mixExecuteOf(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // Scala-side replay of the plan arithmetic + affine keep rule
    def rate(weight: Long) = {
      val target = math.floor(10000.0 * weight / 3).toLong
      math.rint(math.min(1.0, target.toDouble / 4000) * 1e6) / 1e6
    }
    def kept(ids: Seq[Long], r: Double) = ids.count { id =>
      ((id * 1103515245L + 12345L) % 2147483647L) % 1000000L <
        math.floor(r * 1e6 + 0.5).toLong
    }
    val k1 = kept((0L until 40L), rate(2))
    val k20 = kept((100L until 140L), rate(1))
    assert(out("src1") === ((40L, k1.toLong, k1 * 100L)))
    assert(out("src20") === ((40L, k20.toLong, k20 * 100L)))
    // the 2× source must genuinely sample more of its corpus
    assert(k1 > k20)
  }

  test("s5 bm25: rare query term outranks common, hand-checked micro score") {
    import spark.implicits._
    // doc 0 is the query (0 % 101 == 0); corpus docs 1–3, all dl = 3
    val docs = Seq(
      (0L, "rare common zzz"),
      (1L, "rare common common"),
      (2L, "common common common"),
      (3L, "other other other")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("s5spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = queries.SimilarityOps.s5Bm25(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 3 shares no query term → absent; doc 1 (rare+common) outranks 2
    assert(out.map(x => (x._2, x._4)).toSeq === Seq((1L, 1L), (2L, 2L)))
    // hand math, mirroring the expression tree: dl = avgdl = 3 → the
    // length norm is 1, sat = tf·2.2/(tf+1.2); idf = ln(1+(N−df+.5)/(df+.5))
    def idf(df: Int) = math.log(1.0 + (3 - df + 0.5) / (df + 0.5))
    def sat(tf: Int) = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * 3.0 / 3.0))
    def ts(df: Int, tf: Int) = math.round(idf(df) * sat(tf) * 1e6)
    assert(out.find(_._2 == 1L).get._3 === ts(1, 1) + ts(2, 2))
    assert(out.find(_._2 == 2L).get._3 === ts(2, 3))
  }

  test("hybrid RRF fuses the lexical and dense top-k with hand-computed scores (s8)") {
    import spark.implicits._
    // the s5 fixture (query doc 0: lex ranks doc1=1, doc2=2; doc3 no
    // shared term) + embeddings making dense rank doc3=1, doc1=2, doc2=3
    val docs = Seq(
      (0L, "rare common zzz"),
      (1L, "rare common common"),
      (2L, "common common common"),
      (3L, "other other other")).toDF("doc_id", "text")
    val embs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(1.0f, 1.0f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(2.0f, 0.0f))).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("s8spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    embs.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = queries.SimilarityOps.s8HybridRrf(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc1: 1/61+1/62; doc2: 1/62+1/63; doc3 dense-only: 1/61
    assert(out.toSeq === Seq(
      (0L, 1L, 32522L, 1L),
      (0L, 2L, 32002L, 2L),
      (0L, 3L, 16393L, 3L)))
  }

  test("scalar quantization: hand-computed codes, zero vector, error bound (s7)") {
    import spark.implicits._
    import graft.operators.Quantize
    // absmax = 127 → scale = 1 exactly; round-half-away: −63.5 → −64
    val rows = Seq(
      (0L, Array(127.0f, -63.5f, 0.25f, 0.0f)),
      (1L, Array(0.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val q = Quantize.quantize(rows, "embedding")
      .select(col("vec_id"), col("scale"), col("codes"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getSeq[Int](2)))).toMap
    assert(q(0L)._1 === 1.0 && q(0L)._2 === Seq(127, -64, 0, 0))
    assert(q(1L)._1 === 0.0 && q(1L)._2 === Seq(0, 0, 0, 0))
    val dir = java.nio.file.Files.createTempDirectory("s7spec").toString
    rows.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val s7 = Quantize.s7ScalarQuantize(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    // scale_nano = 1e9; n_sat = 1; l1 = 127+64 = 191;
    // dot = 127·1 − 64·2 = −1; err = (0.5² + 0.25²)·1e12
    assert(s7(0L) === ((1000000000L, 1L, 191L, -1L, 312500000000L)))
    assert(s7(1L) === ((0L, 0L, 0L, 0L, 0L)))
    // real table: every row within the per-element error bound
    // err ≤ d·(scale/2)²·1e12 (+1 pico/element rounding slop)
    val real = Quantize.s7ScalarQuantize(spark, sf)
    val d = lit(64.0)
    val bound = d * pow(
      col("scale_nano").cast("double") * lit(1e-9) / lit(2.0), 2) * lit(1e12) + d
    assert(real.where(col("err_pico").cast("double") > bound).count() === 0L)
    assert(real.count() ===
      Tables(spark, sf, "embeddings").count())
  }

  test("m12 centroid filter: hand-computed cosines, zero vector, scale invariance") {
    import spark.implicits._
    import graft.operators.EmbedFilter
    // seeds [1,0] and [1,0] → centroid direction [1,0]
    // candidates: [1,0] cos 1 keep; [0,1] cos 0 drop; [0.8,0.6] cos 0.8
    // keep; [-1,0] cos −1 drop; zero vector cos 0 (guarded) drop
    val rows = Seq(
      (0L, Array(1.0f, 0.0f), true),
      (1L, Array(1.0f, 0.0f), true),
      (10L, Array(1.0f, 0.0f), false),
      (11L, Array(0.0f, 1.0f), false),
      (12L, Array(0.8f, 0.6f), false),
      (13L, Array(-1.0f, 0.0f), false),
      (14L, Array(0.0f, 0.0f), false)).toDF("id", "v", "seed")
    val out = EmbedFilter.filterByCentroid(rows, "id", "v", col("seed"))
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(2), r.getBoolean(3)))).toMap
    assert(out(10L) === ((1.0, true)))
    assert(out(11L) === ((0.0, false)))
    assert(out(12L) === ((0.8, true)))
    assert(out(13L) === ((-1.0, false)))
    assert(out(14L) === ((0.0, false)))
    // cosine is scale-invariant in the seed mass: doubling the seed
    // set (centroid sum 2×) must not move any score
    val doubled = rows.unionByName(
      Seq((2L, Array(1.0f, 0.0f), true)).toDF("id", "v", "seed"))
    val out2 = EmbedFilter.filterByCentroid(doubled, "id", "v", col("seed"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(Seq(10L, 11L, 12L, 13L, 14L).forall(k => out2(k) === out(k)._1))
    // real table: scores bounded, seed slice itself scores high on
    // average (the anchor is self-consistent)
    val real = EmbedFilter.m12EmbeddingFilter(spark, sf)
    assert(real.where(abs(col("cos_sim")) > 1.000001).count() === 0L)
    val emb = Tables(spark, sf, "embeddings").select(col("vec_id"), col("label"))
    val withLab = real.join(emb, "vec_id")
    val seedMean = withLab.where(col("label") === 0)
      .agg(avg(col("cos_sim"))).collect()(0).getDouble(0)
    val restMean = withLab.where(col("label") =!= 0)
      .agg(avg(col("cos_sim"))).collect()(0).getDouble(0)
    assert(seedMean > restMean,
      s"seed slice should score above the rest: $seedMean vs $restMean")
  }

  test("p3 curriculum: global positions equal the (tier, digest, id) sort") {
    import spark.implicits._
    import graft.queries.PackOps
    def text(n: Int) = Seq.fill(n)("w").mkString(" ")
    // token counts straddle every tier bound (32/56/76)
    val sizes = Seq(2, 32, 33, 56, 57, 76, 77, 200, 10, 40, 60, 90)
    val docs = sizes.zipWithIndex
      .map { case (n, i) => (i.toLong * 7L + 3L, text(n)) }
      .toDF("doc_id", "text")
    val out = PackOps.curriculumOf(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // positions are a permutation of 0..n-1
    assert(out.map(_._4).sorted.toSeq === sizes.indices.map(_.toLong))
    // the permutation is exactly the naive (tier, digest, doc_id) sort
    def tierOf(n: Long) = if (n <= 32) 0L else if (n <= 56) 1L else if (n <= 76) 2L else 3L
    def digest(id: Long) = ((id * 1103515245L + 12345L) % 2147483647L) % 1000000L
    val expected = out.map { case (id, n, _, _) => (id, n) }
      .sortBy { case (id, n) => (tierOf(n), digest(id), id) }
      .map(_._1).toSeq
    assert(out.sortBy(_._4).map(_._1).toSeq === expected)
    // tiers are non-decreasing along the curriculum
    val tiersInOrder = out.sortBy(_._4).map(_._3).toSeq
    assert(tiersInOrder === tiersInOrder.sorted)
  }

  test("sk2 sketch union: estimates within HLL error, merge equals direct sketch") {
    import graft.queries.DedupOps
    val out = DedupOps.sk2SketchUnion(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toList
    val (unionRows, perSource) = out.partition(_._1 == "__union__")
    assert(unionRows.length === 1 && perSource.nonEmpty)
    // per-source estimates within HLL lgK=14 error (<1%; allow 3%)
    perSource.foreach { case (src, est, exact) =>
      assert(exact > 0 && math.abs(est - exact) <= math.max(1L, exact * 3 / 100),
        s"$src estimate $est too far from exact $exact")
    }
    // the merged estimate must match a direct sketch over the whole
    // corpus (per-bucket MAX merge is lossless — and since r7 the
    // DuckDB oracle re-proves this same identity every round)
    val toks = Tables(spark, sf, "documents")
      .select(lit("all").as("g"),
        explode(split(col("text"), " ")).as("tok"))
      .where(length(col("tok")) > 0)
    val direct = graft.operators.DetHll.estimate(
      graft.operators.DetHll.registers(toks, Seq("g"), col("tok")),
      Seq("g"), "approx").collect()(0).getLong(1)
    assert(unionRows.head._2 === direct,
      s"merged estimate ${unionRows.head._2} != direct sketch $direct")
    // and the union estimate must cover every single source
    assert(unionRows.head._2 >= perSource.map(_._2).max)
  }

  test("d15 substring strip: full copy emptied, overlap trimmed, self-repeat cut once") {
    import spark.implicits._
    import graft.queries.DedupOps
    def toks(p: String, n: Int) = (1 to n).map(p + _).mkString(" ")
    val a = toks("a", 30)                         // original, kept intact
    val b = a                                     // exact copy → fully removed
    val c = toks("a", 25) + " " + toks("c", 15)   // 25-token prefix shared
    val d = toks("x", 20) + " " + toks("x", 20) + " " + toks("y", 5)
    val docs = Seq((1L, a), (2L, b), (3L, c), (4L, d), (5L, toks("z", 10)))
      .toDF("doc_id", "text")
    val out = DedupOps.substringStripOf(docs, 20).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    // doc 1 owns every window → untouched
    assert(out(1L) === ((30L, 0L, 0L, md5Of(a))))
    // doc 2: every window already owned by doc 1 → one span covers all
    assert(out(2L) === ((30L, 1L, 30L, md5Of(""))))
    // doc 3: windows 1..6 (inside the 25-token shared prefix) are doc-1
    // owned → span [1, 26) removes 25 tokens, c-tail survives
    assert(out(3L) === ((40L, 1L, 25L, md5Of(toks("c", 15)))))
    // doc 4: the second x-block repeats the first WITHIN the doc →
    // span [21, 41), first block + y-tail survive
    assert(out(4L) === ((45L, 1L, 20L,
      md5Of(toks("x", 20) + " " + toks("y", 5)))))
    // short doc: no windows, survives
    assert(out(5L) === ((10L, 0L, 0L, md5Of(toks("z", 10)))))
    // conservation on the real table: removed ≤ n_tok, and flagged
    // docs (d11 is_dup) are exactly the docs d15 trims or that share
    // only first-owned windows
    val real = DedupOps.d15SubstringStrip(spark, sf)
    assert(real.where(col("n_removed") > col("n_tok")).count() === 0L)
    assert(real.count() === Tables(spark, sf, "documents").count())
    // the position-key overflow guard fails LOUDLY, not by silent
    // collision: a 40-token doc has window starts up to 21, so
    // maxTok=16 must raise
    val long = Seq((1L, toks("p", 40)), (2L, toks("p", 40)))
      .toDF("doc_id", "text")
    val ex = intercept[Exception] {
      DedupOps.substringStripOf(long, 20, maxTok = 16).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("position key")))
  }

  test("p4 shard manifest: matches a Scala replay of p3 positions; shards full and contiguous") {
    import graft.queries.PackOps
    // replay: group the (oracle-verified) p3 output by pos DIV ShardDocs
    val p3 = PackOps.p3Curriculum(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))) // doc_id, n_tok, pos
    val expected = p3.groupBy(_._3 / PackOps.ShardDocs).map { case (sid, rows) =>
      val byPos = rows.sortBy(_._3)
      sid -> ((byPos.length.toLong, byPos.map(_._2).sum,
        byPos.head._3, byPos.last._3,
        md5Of(byPos.map(_._1).mkString(","))))
    }
    val got = PackOps.p4ShardManifest(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5)))).toMap
    assert(got === expected)
    // every shard except the last holds exactly ShardDocs docs, and
    // positions inside a shard are contiguous
    val lastSid = got.keys.max
    got.foreach { case (sid, (n, _, first, last, _)) =>
      assert(last - first + 1 === n, s"shard $sid positions not contiguous")
      if (sid != lastSid) assert(n === PackOps.ShardDocs, s"shard $sid short")
    }
    assert(got.values.map(_._1).sum === p3.length.toLong)
  }

  test("w6 anomaly: planted spike flagged, varied baseline, empty leading window null") {
    import spark.implicits._
    import graft.queries.Extras
    val hourNs = 3600L * 1000 * 1000 * 1000
    // hours 0..29 carry 10+(h%3) events; hour 30 carries 100
    val ev = ((0 to 29).flatMap { h =>
      (0 until 10 + h % 3).map(i => ("err", h * hourNs + i * 1000L))
    } ++ (0 until 100).map(i => ("err", 30 * hourNs + i * 1000L)))
      .toDF("event_type", "ts")
    val out = Extras.anomalyOf(ev).collect()
    assert(out.length === 31)
    val byHour = out.map(r => r.getLong(1) ->
      ((r.getLong(2), Option(r.get(4)), Option(r.get(5)), r.getBoolean(6)))).toMap
    // the first hour has no trailing window at all → null std, null z
    assert(byHour(0L) === ((10L, None, None, false)))
    // exactly one spike, and it is the planted hour
    val spikes = out.filter(_.getBoolean(6)).map(_.getLong(1)).toSeq
    assert(spikes === Seq(30L))
    // its z is enormous (baseline std ≈ 0.83 around mean 11)
    assert(out.find(_.getLong(1) == 30L).get.getDouble(5) > 50.0)
    // floor-division semantics: a pre-epoch event lands in hour −1,
    // matching DuckDB's `//`, not in hour 0 as truncation would put it
    val neg = Seq(("err", -1L), ("err", 1L)).toDF("event_type", "ts")
    assert(Extras.anomalyOf(neg).collect().map(_.getLong(1)).toSeq
      === Seq(-1L, 0L))
    // real table: one row per (event_type, hour), counts positive
    val real = Extras.w6Anomaly(spark, sf)
    val hourly = Tables(spark, sf, "events")
      .select(col("event_type"), expr(s"ts div $hourNs").as("h")).distinct()
    assert(real.count() === hourly.count())
    assert(real.where(col("n") <= 0).count() === 0L)
  }

  test("o10 weighted sample: integer keep test consistent with t2 quality and the LCG digest") {
    import graft.queries.TextOps
    val out = TextOps.o10WeightedSample(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (id, p, dg, keep) =
        (r.getLong(0), r.getLong(2), r.getLong(3), r.getBoolean(4))
      // digest replay: Numerical-Recipes LCG constants, m11 shape
      assert(dg === ((id * 1664525L + 1013904223L) % 2147483647L) % 1000000L)
      assert(p >= 0L && p <= 1000000L)
      assert(keep === (dg < p))
    }
    // p_micro tracks the t2 quality in micro-units (t2's published
    // column is round-6, o10 scales the unrounded value — they can
    // differ by at most one micro-unit at a half-way boundary)
    val q = TextOps.t2QualityScore(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    out.foreach { r =>
      val fromRounded = math.floor(q(r.getLong(0)) * 1e6 + 0.5).toLong
      assert(math.abs(r.getLong(2) - fromRounded) <= 1L)
    }
  }

  test("t15 zipf: hand-derived slope, ttr and top-1 share on a constructed corpus") {
    import spark.implicits._
    import graft.queries.TextOps.t15Zipf
    import graft.queries.TextOps
    val text = List.fill(8)("a") ++ List.fill(4)("b") ++
      List.fill(2)("c") ++ List("d")
    val docs = Seq((1L, "s1", text.mkString(" "))).toDF("doc_id", "source", "text")
    // expected slope from first principles: least squares of ln freq
    // on ln rank over ranks 1..4 with counts 8,4,2,1
    val counts = Seq(8L, 4L, 2L, 1L)
    val xs = counts.indices.map(i => math.log(i + 1.0))
    val ys = counts.map(n => math.log(n.toDouble))
    val xm = xs.sum / xs.size; val ym = ys.sum / ys.size
    val slope = xs.zip(ys).map { case (x, y) => (x - xm) * (y - ym) }.sum /
      xs.map(x => (x - xm) * (x - xm)).sum
    val tmp = java.nio.file.Files.createTempDirectory("zipf").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val row = t15Zipf(spark, tmp).collect().head
    assert(row.getString(0) === "s1")
    assert(row.getLong(1) === 15L)
    assert(row.getLong(2) === 4L)
    assert(math.abs(row.getDouble(3) - 4.0 / 15.0) < 1e-6)
    assert(math.abs(row.getDouble(4) - 8.0 / 15.0) < 1e-6)
    assert(math.abs(row.getDouble(5) - slope) < 1e-5)
    // real table: one row per source, slope negative (Zipf-ish), vocab ≤ tokens
    val real = TextOps.t15Zipf(spark, sf).collect()
    assert(real.length === Tables(spark, sf, "documents")
      .select(col("source")).distinct().count().toInt)
    real.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(5) < 0.0)
    }
  }

  test("j9 nearest join: direction-free winner, earlier-on-tie, per-user, tolerance-bounded") {
    import spark.implicits._
    import graft.queries.Extras
    val us = 1000L // ns per µs
    def ns(sec: Long) = sec * 1000L * 1000 * 1000
    val ev = Seq(
      // user 1, error at t=1000s: purchases at 800s and 1100s → +100s wins
      (1L, 10L, ns(1000), "error"),
      (1L, 20L, ns(800), "purchase"),
      (1L, 21L, ns(1100), "purchase"),
      // user 2, error at t=1000s: purchases at 900s and 1100s tie on
      // |delta| → earlier (900s) wins
      (2L, 11L, ns(1000), "error"),
      (2L, 22L, ns(900), "purchase"),
      (2L, 23L, ns(1100), "purchase"),
      // user 3, error with nearest purchase OUTSIDE ±300s → dropped
      (3L, 12L, ns(1000), "error"),
      (3L, 24L, ns(1400), "purchase"),
      // user 4 purchase near user 3's error time must not cross users
      (4L, 25L, ns(1001), "purchase"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = Extras.nearestJoinOf(ev, 300L * 1000 * 1000).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out.keySet === Set(10L, 11L))
    assert(out(10L) === ((1L, 21L, 100L * 1000 * 1000)))
    assert(out(11L) === ((2L, 22L, -100L * 1000 * 1000)))
    // real table: at most one row per error, |delta| within tolerance
    val real = Extras.j9NearestJoin(spark, sf).collect()
    assert(real.map(_.getLong(0)).distinct.length === real.length)
    assert(real.forall(r => math.abs(r.getLong(3)) <= 300L * 1000 * 1000))
  }

  test("sk4 theta intersect: exact below k, bounded error above k, all pairs present") {
    import spark.implicits._
    import graft.queries.DedupOps
    // exact mode: hand-countable overlaps (vocab ≪ k = 4096)
    val docs = Seq(
      ("sa", (1 to 30).map("w" + _).mkString(" ")),   // w1..w30
      ("sb", (21 to 50).map("w" + _).mkString(" ")),  // w21..w50 → ∩ = 10
      ("sc", (1 to 5).map("x" + _).mkString(" ")))    // disjoint
      .zipWithIndex.map { case ((s, t), i) => (i.toLong, s, t) }
      .toDF("doc_id", "source", "text")
    val out = DedupOps.thetaIntersectOf(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out.keySet === Set(("sa", "sb"), ("sa", "sc"), ("sb", "sc")))
    assert(out(("sa", "sb")) === ((30L, 30L, 10L, 50L)))
    assert(out(("sa", "sc")) === ((30L, 5L, 0L, 35L)))
    assert(out(("sb", "sc")) === ((30L, 5L, 0L, 35L)))
    // estimation mode: 20k-token vocabularies overlap in 10k — both
    // sketches retain > k entries, so these are genuine estimates;
    // theta RSE at k=4096 is ~1.6%, assert a loose 10% band
    val big = Seq(
      ("ba", (1 to 20000).map("t" + _)),
      ("bb", (10001 to 30000).map("t" + _)))
      .flatMap { case (s, toks) =>
        toks.grouped(2000).zipWithIndex.map { case (g, i) =>
          (s, i, g.mkString(" "))
        }
      }.zipWithIndex
      .map { case ((s, _, t), i) => (i.toLong, s, t) }
      .toDF("doc_id", "source", "text")
    val est = DedupOps.thetaIntersectOf(big).collect().head
    assert(est.getString(0) === "ba" && est.getString(1) === "bb")
    assert(math.abs(est.getLong(4) - 10000.0) / 10000.0 < 0.10)
    assert(math.abs(est.getLong(5) - 30000.0) / 30000.0 < 0.10)
  }

  test("sk3 heavy hitters: pigeonhole recall incl. the local-top-m killer, merge identity") {
    import spark.implicits._
    import graft.queries.DedupOps
    // the case a per-source top-m candidate tier gets wrong: "hot"
    // is rank 11 in EVERY source (99 < the 10 private tokens' 100)
    // yet the global #1 at 297; 100 singletons per source pad the
    // mass. φ=1% of N=3597 → threshold 35.97 → HH = 30 private + hot.
    val tricky = (0 until 3).map { s =>
      val privates = (1 to 10).flatMap(p => Seq.fill(100)(s"s${s}p$p"))
      val hot = Seq.fill(99)("hot")
      val singles = (1 to 100).map(j => s"s${s}x$j")
      (s.toLong, s"src$s", (privates ++ hot ++ singles).mkString(" "))
    }.toDF("doc_id", "source", "text")
    val out = DedupOps.heavyHittersOf(tricky, 10000L).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = (0 until 3).flatMap(s =>
      (1 to 10).map(p => s"s${s}p$p")).toSet + "hot"
    assert(out.keySet === expected)
    assert(out("hot") >= 297L) // CMS never under-counts
    // merge identity: per-source sketches merged ≡ one global sketch
    // (vocab ≪ width ⇒ no collisions ⇒ identical rows either way)
    val docs = (1 to 15).flatMap { i =>
      Seq(("src_a", Seq.fill(i)(s"w$i").mkString(" ")),
        ("src_b", Seq.fill(2 * i)(s"w$i").mkString(" ")))
    }.zipWithIndex.map { case ((s, t), id) => (id.toLong, s, t) }
      .toDF("doc_id", "source", "text")
    val multi = DedupOps.heavyHittersOf(docs, 10000L).collect()
      .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val single = DedupOps.heavyHittersOf(
      docs.withColumn("source", lit("all")), 10000L).collect()
      .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    assert(multi.toSeq === single.toSeq)
    // N=360, φN=3.6 → w_i (count 3i) is a hitter iff i ≥ 2
    assert(multi.map(_._1).toSet === (2 to 15).map(i => s"w$i").toSet)
    // the real table: NO FALSE NEGATIVES — every token with exact
    // count ≥ φ·N is in the output — and est ≥ exact for every row
    val exactReal = Tables(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .where(length(col("token")) > 0)
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nReal = exactReal.values.sum
    val real = DedupOps.heavyHittersOf(
      Tables(spark, sf, "documents"), 10000L).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exactReal.foreach { case (tok, n) =>
      if (n * 1000000L >= 10000L * nReal)
        assert(real.contains(tok), s"true heavy hitter $tok missing")
    }
    real.foreach { case (tok, est) =>
      assert(est >= exactReal(tok), s"real $tok: est below exact")
    }
  }
}
