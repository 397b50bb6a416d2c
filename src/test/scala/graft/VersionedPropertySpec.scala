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
  * that CDC over the longest append-only stretch equals the model
  * delta, and that vacuum leaves the latest snapshot intact. The
  * storage layer earns the same discipline as the K-family kernels
  * (CrystalSpec's 1000-case fuzz): invariants, not examples. */
class VersionedPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
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
        case 2 => // merge: update one existing key (all its copies) + insert one
          val upd = (if (model.nonEmpty)
            Vector((model(rnd.nextInt(model.length))._1, s"upd$i"))
          else Vector.empty) ++ freshRows(1)
          val keys = upd.map(_._1).toSet
          Versioned.merge(upd.toDF("id", "s"), t, "id")
          model = model.filterNot(r => keys(r._1)) ++ upd
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

    // CDC invariant over the longest append-only stretch: the change
    // feed equals the model delta between its endpoints
    val appendRuns = {
      val vs = Versioned.versions(t).sorted
      val isAppend = vs.map(v => v -> (try {
        Versioned.readChanges(spark, t, v - 1 max 0, v); true
      } catch { case _: IllegalArgumentException => false })).toMap
      vs.foldLeft(List.empty[List[Int]]) { (runs, v) =>
        if (!isAppend(v)) Nil :: runs
        else
          runs match {
            case head :: tail => (head :+ v) :: tail
            case Nil => List(List(v))
          }
      }.filter(_.nonEmpty)
    }
    appendRuns.sortBy(-_.length).headOption.filter(_.length >= 2)
      .foreach { run =>
        val (lo, hi) = (run.head, run.last)
        val feed = Versioned.readChanges(spark, t, lo - 1, hi)
          .select(col("id"), col("s")).collect()
          .map(r => (r.getLong(0), r.getString(1))).toVector
        // an append run's delta vs the model: rows added between the
        // version BEFORE the run and its end (no rewrites inside)
        val before = history(lo - 1)
        val after = history(hi)
        val delta = after.diff(before)
        assert(canon(feed) === canon(delta),
          s"CDC over append run v$lo..v$hi diverged from the model delta")
      }

    // vacuum keeps the latest snapshot intact
    Versioned.vacuum(t, retainVersions = 1)
    assert(canon(readBack(t)) === canon(model),
      "vacuum(retain=1) damaged the latest snapshot")
  }
}
