package graft.decode

import scala.collection.mutable.ArrayBuffer

/** Standalone byte-scan utilities (reference: dexscraper/utils.py:15-108,
  * :214-256): unaligned IEEE-754 extraction with the trading-data
  * validity gate, and relative-tolerance value clustering. These back the
  * exploratory analysis surface; the production decode paths use the
  * specialized scanners in LegacyDecoder/EnhancedDecoder/ClusterExtractor.
  */
object ByteScan {

  /** utils.py:85-108: finite, |v| ∈ (1e-15, 1e15), and not the
    * uninitialized-memory sentinels 0.0 / ±1.0.
    */
  def isValidFloat(v: Double): Boolean =
    !v.isNaN && !v.isInfinite &&
      math.abs(v) >= 1e-15 && math.abs(v) <= 1e15 &&
      v != 0.0 && math.abs(v) != 1.0

  /** utils.py:15-48: stride-1 LE float32 scan with validity gate and
    * optional count cap.
    */
  def extractFloats(data: Array[Byte], offset: Int = 0, count: Int = 0): Seq[Double] = {
    val out = ArrayBuffer.empty[Double]
    var pos = offset
    while (pos <= data.length - 4 && (count == 0 || out.length < count)) {
      val v = Wire.readFloatLE(data, pos).toDouble
      if (isValidFloat(v)) out += v
      pos += 1
    }
    out.toSeq
  }

  /** utils.py:50-83: stride-1 LE float64 scan. */
  def extractDoubles(data: Array[Byte], offset: Int = 0, count: Int = 0): Seq[Double] = {
    val out = ArrayBuffer.empty[Double]
    var pos = offset
    while (pos <= data.length - 8 && (count == 0 || out.length < count)) {
      val v = Wire.readDoubleLE(data, pos)
      if (isValidFloat(v)) out += v
      pos += 1
    }
    out.toSeq
  }

  /** utils.py:214-256: sort, then chain values whose relative difference
    * to the PREVIOUS cluster member is ≤ tolerance; singleton clusters are
    * dropped. (Chaining means a cluster can span more than `tolerance`
    * end-to-end — faithful to the reference.)
    */
  def clusterNumericValues(values: Seq[Double], tolerance: Double = 0.05): Seq[Seq[Double]] = {
    if (values.isEmpty) return Seq.empty
    val sorted = values.sorted
    val clusters = ArrayBuffer.empty[Seq[Double]]
    var current = ArrayBuffer(sorted.head)
    sorted.tail.foreach { v =>
      val last = current.last
      val relDiff = if (last == 0) math.abs(v) else math.abs(v - last) / math.abs(last)
      if (relDiff <= tolerance) current += v
      else {
        if (current.length >= 2) clusters += current.toSeq
        current = ArrayBuffer(v)
      }
    }
    if (current.length >= 2) clusters += current.toSeq
    clusters.toSeq
  }
}
