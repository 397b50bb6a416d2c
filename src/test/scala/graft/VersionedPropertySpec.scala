package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Versioned

/** Model-based fuzz of the versioned-table log: a seeded random
  * interleaving of append / overwrite / merge / deleteWhere / restore
  * / optimize is replayed against a driver-side reference model
  * (a plain multiset of rows per version), asserting after EVERY op
  * that the table reads back exactly the model — and at the end that
  * every HISTORICAL version still time-travels to its own model state,
  * that the ROW-LEVEL CDF law holds at every readable commit (prev
  * state + change feed = next state, merges and deletes included;
  * only overwrite/restore refuse), and that vacuum leaves the latest
  * snapshot intact. The
  * storage layer earns the same discipline as the K-family kernels
  * (CrystalSpec's 1000-case fuzz): invariants, not examples. */
class VersionedPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions",
      "org.apache.spark.sql.graftx.GraftExtensions")
    .getOrCreate()

  private type Rows = Vector[(Long, String)]

  private def readBack(t: String, asOf: Option[Int] = None): Rows =
    Versioned.read(spark, t, asOf).collect()
      .map(r => (r.getLong(0), r.getString(1))).toVector

  private def canon(rows: Rows): Rows = rows.sorted

  test("random op interleavings preserve snapshot, history, CDC and vacuum invariants") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    val t = Files.createTempDirectory("versioned-fuzz-").toString
    var model: Rows = Vector.empty
    var history = Map.empty[Int, Rows]
    var nextId = 0L
    def freshRows(n: Int): Rows =
      (0 until n).map { _ =>
        nextId += 1; (nextId, s"r$nextId-${rnd.nextInt(100)}")
      }.toVector

    // seed commit so every op has a table to act on
    val r0 = freshRows(3)
    Versioned.commit(r0.toDF("id", "s"), t)
    model = r0; history += 1 -> model

    val ops = 42
    (0 until ops).foreach { i =>
      rnd.nextInt(6) match {
        case 0 => // append (sometimes re-using an existing id: dups allowed)
          val rows = freshRows(1 + rnd.nextInt(3)) ++
            (if (model.nonEmpty && rnd.nextBoolean())
              Vector(model(rnd.nextInt(model.length))) else Vector.empty)
          Versioned.commit(rows.toDF("id", "s"), t)
          model = model ++ rows
        case 1 => // overwrite with a fresh small set
          val rows = freshRows(2 + rnd.nextInt(3))
          Versioned.commit(rows.toDF("id", "s"), t, "overwrite")
          model = rows
        case 2 => // merge: update one existing key (EACH copy is
          // rewritten — round 13, Delta's row-count-preserving
          // semantics) + insert one
          val upd = (if (model.nonEmpty)
            Vector((model(rnd.nextInt(model.length))._1, s"upd$i"))
          else Vector.empty) ++ freshRows(1)
          val updBy = upd.toMap
          val existedKeys = model.map(_._1).toSet
          Versioned.merge(upd.toDF("id", "s"), t, "id")
          model = model.map(r =>
            if (updBy.contains(r._1)) (r._1, updBy(r._1)) else r) ++
            upd.filterNot(r => existedKeys(r._1))
        case 3 => // deleteWhere on an id residue class
          val m = 2 + rnd.nextInt(3); val k = rnd.nextInt(m)
          Versioned.deleteWhere(spark, t, col("id") % m === k)
          model = model.filterNot(r => r._1 % m == k)
        case 4 => // restore to a uniformly random past version
          val vs = Versioned.versions(t)
          val target = vs(rnd.nextInt(vs.length))
          Versioned.restore(t, target)
          model = history(target)
        case 5 => // optimize (sometimes clustered): rows must not change
          if (rnd.nextBoolean())
            Versioned.optimize(spark, t, numFiles = 1 + rnd.nextInt(2))
          else
            Versioned.optimize(spark, t, numFiles = 2, clusterBy = Seq("id"))
      }
      val v = Versioned.versions(t).max
      history += v -> model
      assert(canon(readBack(t)) === canon(model),
        s"latest snapshot diverged from the model after op $i (v$v)")
    }

    // every historical version still time-travels to its own state
    history.foreach { case (v, expected) =>
      assert(canon(readBack(t, Some(v))) === canon(expected),
        s"time travel to v$v diverged from the recorded model")
    }

    // CDF law (round 10 — merge/delete now emit row-level changes):
    // for EVERY commit whose change feed is readable, applying the
    // feed to the previous model state yields exactly the next state —
    // removed = preimages + deletes, added = postimages + inserts,
    // multiset semantics (dup ids from re-appends included). Only
    // overwrite and restore refuse (re-baseline semantics); count them
    // to prove both invariant families actually fired in this run.
    var cdfChecked = 0
    var rebaselines = 0
    Versioned.versions(t).sorted.filter(_ >= 2).foreach { v =>
      val chOpt =
        try Some(Versioned.readChanges(spark, t, v - 1, v)
          .select(col("id"), col("s"), col("_change_type")).collect()
          .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toVector)
        catch {
          case e: RuntimeException if e.getMessage.contains("re-baseline") =>
            rebaselines += 1; None
        }
      chOpt.foreach { ch =>
        val bad = ch.map(_._3).filterNot(Set("insert", "delete",
          "update_preimage", "update_postimage"))
        assert(bad.isEmpty, s"unknown change types at v$v: $bad")
        val removed = ch.collect {
          case (id, s, t3) if t3 == "update_preimage" || t3 == "delete" =>
            (id, s)
        }
        val added = ch.collect {
          case (id, s, t3) if t3 == "update_postimage" || t3 == "insert" =>
            (id, s)
        }
        assert(canon(history(v - 1).diff(removed) ++ added)
            === canon(history(v)),
          s"CDF law broken at v$v: prev state + change feed != next state")
        cdfChecked += 1
      }
    }
    assert(cdfChecked > 0 && rebaselines > 0,
      s"fuzz must exercise both CDF reads ($cdfChecked) and " +
        s"re-baseline refusals ($rebaselines)")

    // vacuum keeps the latest snapshot intact
    Versioned.vacuum(t, retainVersions = 1, graceMs = 0L)
    assert(canon(readBack(t)) === canon(model),
      "vacuum(retain=1) damaged the latest snapshot")
  }

  /** Round 11 (VERDICT r10 task 1's last clause): the fuzz extended
    * PAST distinct-long keys — a (STRING uuid, BIGINT bucket)
    * composite-keyed table under random clause merges (conditional
    * update, insert gating, tombstone delete), appends with duplicate
    * rows, residue deletes and restores, each op checked against the
    * reference model and the full history swept at the end. */
  test("composite (string, long) keyed fuzz: clause merges preserve the model") {
    import spark.implicits._
    val rnd = new scala.util.Random(20261111L)
    val t = Files.createTempDirectory("versioned-fuzz-ck-").toString
    type CRows = Vector[(String, Long, Long)] // (uuid, bucket, v)
    def ckey(r: (String, Long, Long)) = (r._1, r._2)
    var model: CRows = Vector.empty
    var history = Map.empty[Int, CRows]
    var nextId = 0L
    def freshRows(n: Int): CRows = (0 until n).map { _ =>
      nextId += 1
      (f"u-$nextId%04d", nextId % 5, rnd.nextInt(1000).toLong)
    }.toVector
    def toDf(rows: CRows) = rows.toDF("u", "b", "v")
    def readC(asOf: Option[Int] = None): CRows =
      Versioned.read(spark, t, asOf).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toVector

    val r0 = freshRows(4)
    Versioned.commit(toDf(r0), t)
    model = r0; history += 1 -> model

    // a merge SOURCE: some existing keys re-valued + some fresh rows,
    // deduped per key (the documented precondition)
    def mergeSource(i: Int): CRows = {
      val existing =
        if (model.isEmpty) Vector.empty
        else Vector.fill(1 + rnd.nextInt(2))(
          model(rnd.nextInt(model.length))).map { r =>
          (r._1, r._2, 1000L + i * 10 + rnd.nextInt(10))
        }
      (existing ++ freshRows(1 + rnd.nextInt(2)))
        .distinctBy(ckey)
    }

    (0 until 30).foreach { i =>
      rnd.nextInt(8) match {
        case 0 => // append, sometimes duplicating an existing row
          val rows = freshRows(1 + rnd.nextInt(2)) ++
            (if (model.nonEmpty && rnd.nextBoolean())
              Vector(model(rnd.nextInt(model.length))) else Vector.empty)
          Versioned.commit(toDf(rows), t)
          model = model ++ rows
        case 1 => // plain composite upsert (update-all / insert-all;
          // round 13: whole-row updates rewrite EACH duplicate copy)
          val src = mergeSource(i)
          val srcBy = src.map(r => ckey(r) -> r).toMap
          val existedKeys = model.map(ckey).toSet
          Versioned.merge(toDf(src), t, Seq("u", "b"))
          model = model.map(r => srcBy.getOrElse(ckey(r), r)) ++
            src.filterNot(r => existedKeys(ckey(r)))
        case 2 => // CLAUSE merge: update iff v even, insert iff v % 3 == 0
          // (whole-row update rewrites each duplicate copy, round 13)
          val src = mergeSource(i)
          val srcBy = src.map(r => ckey(r) -> r).toMap
          val existedKeys = model.map(ckey).toSet
          Versioned.merge(toDf(src), t, Seq("u", "b"),
            whenMatched = Versioned.WhenMatched.Update(Some(col("v") % 2 === 0)),
            whenNotMatched = Versioned.WhenNotMatched.Insert(Some(col("v") % 3 === 0)))
          val updKeys = src.filter(r => r._3 % 2 == 0 && existedKeys(ckey(r)))
            .map(ckey).toSet
          val inserted = src.filter(r =>
            !existedKeys(ckey(r)) && r._3 % 3 == 0)
          model = model.map(r =>
            if (updKeys(ckey(r))) srcBy(ckey(r)) else r) ++ inserted
        case 3 => // tombstone feed: delete matched, ignore unmatched
          val src = mergeSource(i)
          val existedKeys = model.map(ckey).toSet
          Versioned.merge(toDf(src), t, Seq("u", "b"),
            whenMatched = Versioned.WhenMatched.Delete(None),
            whenNotMatched = Versioned.WhenNotMatched.Ignore)
          val deadKeys = src.map(ckey).filter(existedKeys).toSet
          model = model.filterNot(r => deadKeys(ckey(r)))
        case 4 => // deleteWhere on a bucket residue
          val k = rnd.nextInt(5)
          Versioned.deleteWhere(spark, t, col("b") === k.toLong)
          model = model.filterNot(_._2 == k)
        case 5 => // restore to a random past version
          val vs = Versioned.versions(t)
          val target = vs(rnd.nextInt(vs.length))
          Versioned.restore(t, target)
          model = history(target)
        case 6 => // round 12: clause CHAIN with SET expressions —
          // first-match-wins (delete if v%5, else SET-update if v%2),
          // a 2-clause insert chain (partial columns, then whole-row)
          val src = mergeSource(i)
          val existedKeys = model.map(ckey).toSet
          Versioned.mergeClauses(toDf(src), t, Seq("u", "b"),
            matched = Seq(
              Versioned.WhenMatched.Delete(Some(col("source.v") % 5 === 0)),
              Versioned.WhenMatched.Update(Some(col("source.v") % 2 === 0),
                set = Map("v" -> (col("source.v") + col("target.v"))))),
            notMatched = Seq(
              Versioned.WhenNotMatched.Insert(Some(col("v") % 3 === 0),
                set = Map("u" -> col("u"), "b" -> col("b"),
                  "v" -> lit(-1L))),
              Versioned.WhenNotMatched.Insert(None)))
          val srcBy = src.map(r => ckey(r) -> r).toMap
          val delKeys = src.filter(r =>
            existedKeys(ckey(r)) && r._3 % 5 == 0).map(ckey).toSet
          val updKeys = src.filter(r => existedKeys(ckey(r)) &&
            r._3 % 5 != 0 && r._3 % 2 == 0).map(ckey).toSet
          val inserted = src.filterNot(r => existedKeys(ckey(r))).map { r =>
            if (r._3 % 3 == 0) (r._1, r._2, -1L) else r
          }
          model = model.flatMap { r =>
            val k = ckey(r)
            if (delKeys(k)) Vector.empty
            else if (updKeys(k)) // SET applies per target COPY
              Vector((r._1, r._2, srcBy(k)._3 + r._3))
            else Vector(r)
          } ++ inserted
        case 7 => // round 12: the sync-to-snapshot shape — upsert +
          // NOT MATCHED BY SOURCE chain (tombstone v%7, else mark);
          // round 13: matched copies each rewrite to the source row
          val src = mergeSource(i)
          val srcBy = src.map(r => ckey(r) -> r).toMap
          val existedKeys = model.map(ckey).toSet
          Versioned.mergeClauses(toDf(src), t, Seq("u", "b"),
            matched = Seq(Versioned.WhenMatched.Update(None)),
            notMatched = Seq(Versioned.WhenNotMatched.Insert(None)),
            notMatchedBySource = Seq(
              Versioned.WhenMatched.Delete(Some(col("v") % 7 === 0)),
              Versioned.WhenMatched.Update(None,
                set = Map("v" -> (col("v") + 1000000L)))))
          model = model.flatMap { r =>
            if (srcBy.contains(ckey(r))) Vector(srcBy(ckey(r)))
            else if (r._3 % 7 == 0) Vector.empty // NMBS tombstone
            else Vector((r._1, r._2, r._3 + 1000000L)) // NMBS mark
          } ++ src.filterNot(r => existedKeys(ckey(r)))
      }
      val v = Versioned.versions(t).max
      history += v -> model
      assert(model.sorted === readC().sorted,
        s"composite-key snapshot diverged from the model after op $i (v$v)")
    }
    history.foreach { case (v, expected) =>
      assert(readC(Some(v)).sorted === expected.sorted,
        s"composite-key time travel to v$v diverged")
    }
  }

  /** Round 14 (column mapping): the SCHEMA LIFECYCLE fuzzed — random
    * interleavings of append / RENAME COLUMN / DROP COLUMN /
    * ADD COLUMNS (including re-adding previously dropped names — the
    * anti-resurrection law) / merge / restore, each op checked
    * against a reference model that tracks BOTH the logical schema
    * and the rows, with a full per-version history sweep at the end
    * (every version reads under its own names with its own values —
    * re-added columns all-NULL, never the dropped bytes). */
  test("schema-lifecycle fuzz: rename/drop/re-add interleavings " +
    "preserve the model and per-version schemas") {
    val rnd = new scala.util.Random(20261414L)
    val t = Files.createTempDirectory("versioned-fuzz-sch-").toString
    // model: live value-column names (ordered, after id) and rows as
    // id -> values aligned to that order (None = SQL NULL)
    var cols: Vector[String] = Vector("c1", "c2")
    var rows: Map[Long, Vector[Option[Long]]] = Map.empty
    var history = Map.empty[Int, (Vector[String], Map[Long, Vector[Option[Long]]])]
    var nextId = 0L
    var nameSeq = 0
    def freshName(): String = { nameSeq += 1; s"n$nameSeq" }
    def ddlOf(cs: Vector[String]): String =
      ("`id` BIGINT" +: cs.map(c => s"`$c` BIGINT")).mkString(", ")
    def dfOf(cs: Vector[String],
        rs: Seq[(Long, Vector[Option[Long]])]) = {
      val schema = org.apache.spark.sql.types.StructType
        .fromDDL(ddlOf(cs))
      spark.createDataFrame(
        spark.sparkContext.parallelize(rs.map { case (id, vs) =>
          org.apache.spark.sql.Row.fromSeq(
            id +: vs.map(_.map(java.lang.Long.valueOf).orNull))
        }, 1), schema)
    }
    def freshRows(n: Int): Seq[(Long, Vector[Option[Long]])] =
      (0 until n).map { _ =>
        nextId += 1
        nextId -> cols.map(_ => Some(rnd.nextInt(1000).toLong))
      }
    def readBackSch(asOf: Option[Int] = None)
        : (Vector[String], Map[Long, Vector[Option[Long]]]) = {
      val df = Versioned.read(spark, t, asOf)
      val names = df.columns.toVector
      assert(names.head == "id", s"id must lead, got $names")
      val data = df.collect().map { r =>
        r.getLong(0) -> names.tail.indices.map(i =>
          if (r.isNullAt(i + 1)) None else Some(r.getLong(i + 1)))
          .toVector
      }.toMap
      (names.tail, data)
    }

    val r0 = freshRows(3)
    Versioned.commit(dfOf(cols, r0), t)
    rows = r0.toMap; history += 1 -> ((cols, rows))

    var renames, drops, readds = 0
    (0 until 40).foreach { i =>
      rnd.nextInt(6) match {
        case 0 => // append
          val rs = freshRows(1 + rnd.nextInt(2))
          Versioned.commit(dfOf(cols, rs), t)
          rows = rows ++ rs
        case 1 if cols.nonEmpty => // rename a random live column
          val from = cols(rnd.nextInt(cols.length))
          val to = freshName()
          Versioned.renameColumn(t, from, to)
          cols = cols.map(c => if (c == from) to else c)
          renames += 1
        case 2 if cols.length >= 2 => // drop a random live column
          val victimIdx = rnd.nextInt(cols.length)
          Versioned.dropColumn(t, cols(victimIdx))
          cols = cols.patch(victimIdx, Nil, 1)
          rows = rows.map { case (id, vs) =>
            id -> vs.patch(victimIdx, Nil, 1) }
          drops += 1
        case 3 => // add a column: sometimes a RETIRED name (the
          // anti-resurrection law), sometimes fresh
          val retired = history.values.flatMap(_._1).toSet -- cols.toSet
          val name =
            if (retired.nonEmpty && rnd.nextBoolean()) {
              readds += 1; retired.toSeq.sorted.apply(
                rnd.nextInt(retired.size))
            } else freshName()
          Versioned.addColumns(t, s"`$name` BIGINT")
          cols = cols :+ name
          rows = rows.map { case (id, vs) => id -> (vs :+ None) }
        case 4 if rows.nonEmpty => // merge: update one key, insert one
          val keys = rows.keys.toVector.sorted
          val hit = keys(rnd.nextInt(keys.length))
          val updVals = cols.map(_ => Some(rnd.nextInt(1000).toLong))
          val ins = freshRows(1)
          Versioned.merge(
            dfOf(cols, Seq(hit -> updVals) ++ ins), t, Seq("id"))
          rows = rows + (hit -> updVals) ++ ins
        case 5 => // restore: rows AND schema roll back together
          val vs = Versioned.versions(t)
          val target = vs(rnd.nextInt(vs.length))
          Versioned.restore(t, target)
          val (hc, hr) = history(target)
          cols = hc; rows = hr
        case _ => () // guard fell through (e.g. single column): skip
      }
      val v = Versioned.versions(t).max
      history += v -> ((cols, rows))
      val (gotCols, gotRows) = readBackSch()
      assert(gotCols === cols, s"schema diverged after op $i (v$v)")
      assert(gotRows === rows, s"rows diverged after op $i (v$v)")
    }
    assert(renames >= 3 && drops >= 3 && readds >= 1,
      s"fuzz must exercise the lifecycle (renames=$renames, " +
        s"drops=$drops, re-adds=$readds)")

    // every historical version reads under ITS OWN schema and values
    history.foreach { case (v, (hc, hr)) =>
      val (gotCols, gotRows) = readBackSch(Some(v))
      assert(gotCols === hc, s"time travel to v$v schema diverged")
      assert(gotRows === hr, s"time travel to v$v rows diverged")
    }
  }

  /** Round 15 (deletion vectors): the POINT-DML lifecycle fuzzed —
    * random interleavings of append / DV delete / DV update / merge /
    * OPTIMIZE (purges the mask) / restore, each op checked against a
    * row model, with a full per-version history sweep (every version
    * reads its own row multiset — a masked row never resurrects, a
    * purge never loses a live row). COW and DV paths interleave in
    * one history: the fuzz flips `spark.graft.dv.enabled` per op. */
  test("deletion-vector fuzz: dv/cow delete, update, optimize and " +
    "restore interleavings preserve the row model per version") {
    val rnd = new scala.util.Random(20261501L)
    val t = Files.createTempDirectory("versioned-fuzz-dv-").toString
    var rows: Map[Long, Long] = Map.empty // id -> v
    var history = Map.empty[Int, Map[Long, Long]]
    var nextId = 0L
    def dfOf(rs: Seq[(Long, Long)]) = {
      import spark.implicits._
      rs.toDF("id", "v").repartition(1 + rnd.nextInt(2))
    }
    def fresh(n: Int): Seq[(Long, Long)] =
      (0 until n).map { _ =>
        nextId += 1; nextId -> rnd.nextInt(1000).toLong
      }
    def readBack(asOf: Option[Int] = None): Map[Long, Long] =
      Versioned.read(spark, t, asOf).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def withMode[A](dv: Boolean)(f: => A): A = {
      spark.conf.set("spark.graft.dv.enabled", dv.toString)
      try f finally spark.conf.unset("spark.graft.dv.enabled")
    }
    val r0 = fresh(8)
    Versioned.commit(dfOf(r0), t)
    rows = r0.toMap; history += 1 -> rows

    var dvDeletes, cowDeletes, dvUpdates, purges = 0
    (0 until 40).foreach { i =>
      val useDv = rnd.nextBoolean()
      rnd.nextInt(6) match {
        case 0 => // append
          val rs = fresh(1 + rnd.nextInt(3))
          Versioned.commit(dfOf(rs), t)
          rows = rows ++ rs
        case 1 if rows.nonEmpty => // point delete (dv or cow)
          val ids = rows.keys.toVector.sorted
          val victims = (0 until 1 + rnd.nextInt(2))
            .map(_ => ids(rnd.nextInt(ids.length))).distinct
          withMode(useDv) {
            Versioned.deleteWhere(spark, t,
              col("id").isInCollection(victims))
          }
          if (useDv) dvDeletes += 1 else cowDeletes += 1
          rows = rows -- victims
        case 2 if rows.nonEmpty => // point update (dv or cow)
          val ids = rows.keys.toVector.sorted
          val hit = ids(rnd.nextInt(ids.length))
          val nv = rnd.nextInt(1000).toLong
          withMode(useDv) {
            Versioned.updateWhere(spark, t, col("id") === hit,
              Map("v" -> lit(nv)))
          }
          if (useDv) dvUpdates += 1
          rows = rows + (hit -> nv)
        case 3 if rows.nonEmpty => // merge upsert
          val ids = rows.keys.toVector.sorted
          val hit = ids(rnd.nextInt(ids.length))
          val nv = rnd.nextInt(1000).toLong
          val ins = fresh(1)
          Versioned.merge(dfOf(Seq(hit -> nv) ++ ins), t, Seq("id"))
          rows = rows + (hit -> nv) ++ ins
        case 4 => // OPTIMIZE: purge masks, same rows
          Versioned.optimize(spark, t, numFiles = 1 + rnd.nextInt(2))
          if (Versioned.versions(t).nonEmpty) purges += 1
        case 5 => // restore
          val vs = Versioned.versions(t)
          val target = vs(rnd.nextInt(vs.length))
          Versioned.restore(t, target)
          rows = history(target)
        case _ => ()
      }
      val v = Versioned.versions(t).max
      history += v -> rows
      assert(readBack() === rows, s"rows diverged after op $i (v$v)")
    }
    assert(dvDeletes >= 3 && cowDeletes >= 2 && dvUpdates >= 2 &&
      purges >= 2, s"fuzz must exercise the DV lifecycle " +
      s"(dvDel=$dvDeletes cowDel=$cowDeletes dvUpd=$dvUpdates " +
      s"purges=$purges)")
    // every historical version reads its own row multiset
    history.foreach { case (v, hr) =>
      assert(readBack(Some(v)) === hr, s"time travel to v$v diverged")
    }
  }
}
