package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap

/** Session-scoped materialized tables: compute once per (session,
  * key), keep as an eager `localCheckpoint`, let every later consumer
  * join the checkpointed result. This is the in-session model of the
  * table a production pipeline would persist to storage once per
  * corpus snapshot (signature tables, cluster labels, fitted
  * codebooks-as-tables) — the call site is exactly where a durable
  * `checkpoint()`/parquet write goes on a real cluster.
  *
  * `localCheckpoint` rather than `persist`: blocks are GC-managed and
  * never appear in the cache manager, so a long-lived session running
  * queries in a loop does not accumulate cached plans
  * (CacheHygieneSpec's invariant). Keys embed the applicationId so a
  * stopped-and-restarted session can never serve another context's
  * checkpointed blocks. */
object SessionTable {
  private val store = TrieMap.empty[String, DataFrame]

  def of(s: SparkSession, key: String)(compute: => DataFrame): DataFrame =
    store.getOrElseUpdate(s"${s.sparkContext.applicationId}:$key",
      compute.localCheckpoint(true))

  /** Drop every materialized table (spec hygiene / corpus swap). */
  def invalidate(): Unit = store.clear()
}
