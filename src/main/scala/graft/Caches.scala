package graft

import org.apache.spark.sql.DataFrame
import scala.collection.mutable

/** Cache ledger: operators that persist a subtree register it here
  * instead of calling `.persist()` directly, and the driver of the
  * action (`Verify`, `Bench`, a test, a CLI run) releases everything
  * after the dependent action completes — so a long-lived session never
  * accumulates pinned storage.
  *
  * The ledger is THREAD-LOCAL: two queries running concurrently on the
  * same SparkSession (parallel tests, a streaming batch overlapping a
  * batch job) each see their own ledger, so one query's `releaseAll()`
  * can never unpersist another's in-flight cache. [[scoped]] swaps in a
  * fresh ledger for its body and restores the previous one afterwards,
  * so nested scopes release exactly the caches their own body
  * registered.
  */
object Caches {

  private val registry =
    ThreadLocal.withInitial[mutable.ArrayBuffer[DataFrame]](
      () => mutable.ArrayBuffer.empty[DataFrame])

  /** Persist `df` and record it in this thread's ledger for the next
    * [[releaseAll]].
    */
  def persisted(df: DataFrame): DataFrame = {
    df.persist()
    registry.get() += df
    df
  }

  /** Unpersist every DataFrame in this thread's ledger and clear it.
    * Non-blocking by default (interactive paths shouldn't wait on block
    * eviction); pass `blocking = true` when the caller needs the blocks
    * GONE before proceeding — e.g. a benchmark repeating the same query,
    * where a lazily-evicted cache would let the next sample re-hit still
    * -live blocks and measure a partially cached rerun.
    */
  def releaseAll(blocking: Boolean = false): Unit = {
    val buf = registry.get()
    buf.foreach(_.unpersist(blocking))
    buf.clear()
  }

  /** Run `body` with a fresh ledger, then release exactly the caches it
    * registered — the caller-owned lifecycle for one query + its action.
    * The enclosing scope's ledger is untouched.
    */
  def scoped[A](body: => A): A = scopedImpl(blocking = false)(body)

  /** [[scoped]] with a BLOCKING release: returns only after every cache
    * the body registered is actually evicted. Benchmark harnesses use
    * this so repeat N+1 starts from the same cold-cache state as repeat N.
    */
  def scopedBlocking[A](body: => A): A = scopedImpl(blocking = true)(body)

  private def scopedImpl[A](blocking: Boolean)(body: => A): A = {
    val outer = registry.get()
    registry.set(mutable.ArrayBuffer.empty[DataFrame])
    try body
    finally {
      releaseAll(blocking)
      registry.set(outer)
    }
  }
}
