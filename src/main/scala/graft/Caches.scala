package graft

import org.apache.spark.sql.DataFrame
import scala.collection.mutable

/** Session-scoped cache ledger: operators that persist a subtree register
  * it here instead of calling `.persist()` directly, and the driver of the
  * action (`Verify`, `Bench`, a test, a CLI run) releases everything after
  * the dependent action completes. Persisted plans are reference-counted
  * by plan identity nowhere — the ledger is append-only per query run —
  * so `releaseAll()` after each query keeps a long-lived session from
  * accumulating pinned storage (and keeps re-built identical plans from
  * tripping CacheManager's "already cached" re-registration).
  */
object Caches {

  private val registry = mutable.ArrayBuffer.empty[DataFrame]

  /** Persist `df` and record it for the next [[releaseAll]]. */
  def persisted(df: DataFrame): DataFrame = synchronized {
    df.persist()
    registry += df
    df
  }

  /** Unpersist every ledgered DataFrame (non-blocking) and clear. */
  def releaseAll(): Unit = synchronized {
    registry.foreach(_.unpersist(blocking = false))
    registry.clear()
  }

  /** Run `body`, then release every cache it ledgered — the caller-owned
    * lifecycle for one query + its action.
    */
  def scoped[A](body: => A): A =
    try body finally releaseAll()
}
