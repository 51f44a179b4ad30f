package graft.streaming

import scala.collection.mutable.ArrayBuffer

/** Circular buffer of recent streaming items (reference:
  * dexscraper/utils.py:472-507), with the reference's exact `get_recent`
  * wraparound behavior — including its quirk that once the buffer wraps,
  * the returned window is assembled from `[tail-of-list] ++ [before
  * write-index]`, which is the reference's notion of "most recent".
  *
  * Driver-side bounded state for the streaming path (ST6): the stream
  * itself stays stateless; this retains the last N top-K batches for the
  * TUI/stats panels only — it never participates in a distributed plan.
  */
final class DataBuffer[A](val maxSize: Int = 1000) {
  private val buffer = ArrayBuffer.empty[A]
  private var index = 0

  /** utils.py:480-486 */
  def append(item: A): Unit = {
    if (buffer.length < maxSize) buffer += item
    else {
      buffer(index) = item
      index = (index + 1) % maxSize
    }
  }

  /** utils.py:488-501 */
  def getRecent(count: Int = 10): Seq[A] = {
    if (buffer.length <= count) return buffer.toSeq
    if (index == 0) buffer.takeRight(count).toSeq
    else {
      val recent = buffer.slice(math.max(0, index - count), index)
      if (recent.length < count) {
        val remaining = count - recent.length
        (buffer.takeRight(remaining) ++ recent).toSeq
      } else recent.toSeq
    }
  }

  def clear(): Unit = { buffer.clear(); index = 0 }
  def size: Int = buffer.length
}
