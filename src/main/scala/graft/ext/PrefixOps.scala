package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Scale-safe per-group rank and running sum — the window replacement
  * for the curation pack's domain caps and mixture draws.
  *
  * `row_number().over(Window.partitionBy(g).orderBy(...))` (and the
  * running-sum variant) hashes ALL rows of a group to ONE task and
  * sorts them there. A real pretraining corpus has a handful of
  * sources with one dominant — a web crawl at 60–80% of rows — so that
  * window is a single-task serialization point: tens of TB through one
  * core at 100 TB. This operator computes the identical numbers with
  * the two-pass range-partitioned prefix-sum shape proven in
  * [[TextOps.packOffsets]] and [[StatOps.exactQuantiles]], generalized
  * to (group, order...) keys with arbitrary passthrough columns:
  *
  *   1. range-partition by (group, order...) and sort within
  *      partitions by the same keys — a group larger than one
  *      partition spans CONSECUTIVE partitions, each holding a
  *      contiguous slice of the group's global order; parallelism is
  *      numParts regardless of group skew;
  *   2. reduce each partition to one (count, sum) subtotal PER GROUP
  *      SLICE — at most (numParts + #groups) tiny tuples reach the
  *      driver (each group appears in at most one partial slice per
  *      partition, and slices are contiguous), never data;
  *   3. broadcast the per-(partition, group) prefix bases back and
  *      stream each partition once, resuming each group's rank/sum
  *      from its base.
  *
  * Determinism: range-partition boundaries come from sampling and vary
  * run to run, but any boundary split of a totally-ordered sequence
  * yields identical prefix sums — output is independent of the split
  * AND of numParts (CurationSpec proves both). `orderCols` must be a
  * total order within each group (tie-break on a unique id) for the
  * rank to be well-defined — the same contract `row_number` needs for
  * deterministic output.
  *
  * RDD justification (brief: "RDDs only for genuine per-partition
  * imperative logic"): a running aggregate resuming from a
  * per-partition base is exactly that; no Catalyst expression or
  * non-degenerate window expresses it.
  */
object PrefixOps {

  /** Appends `rankName` (1-based per-group rank in `orderCols` order)
    * and, when `sumCol` is set, `sumName` (per-group INCLUSIVE running
    * sum of `sumCol`, which must be a non-null integral column).
    *
    * @param groupCols one or more grouping columns (a stratum key like
    *                  (lang, source) is a multi-column group)
    * @param numParts range partitions; <= 0 means the session's
    *                 spark.sql.shuffle.partitions
    * @param maxCollectedSlices ENFORCED group-cardinality contract: the
    *                  driver receives one tiny tuple per contiguous
    *                  (partition, group) slice — O(numParts + #groups).
    *                  That is the whole point of the operator (strata,
    *                  domains, mixture sources — dozens to thousands of
    *                  groups), and it breaks if a caller passes a
    *                  near-unique key like doc_id: millions of slices
    *                  would ship to the driver. The guard fails fast
    *                  with the contract named instead of OOMing.
    */
  def groupedRunningAgg(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[String], sumCol: Option[String] = None,
      numParts: Int = 0, rankName: String = "rank",
      sumName: String = "running_sum",
      maxCollectedSlices: Int = 1000000): DataFrame = {
    require(groupCols.nonEmpty, "groupedRunningAgg needs >= 1 group column")
    val spark = df.sparkSession
    val parts =
      if (numParts > 0) numParts
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val keys = (groupCols ++ orderCols).map(col)
    val sorted = graft.Caches.persisted(
      df.repartitionByRange(parts, keys: _*)
        .sortWithinPartitions(keys: _*))
    val schema = sorted.schema
    val gIdx = groupCols.map(schema.fieldIndex)
    val sumIdx = sumCol.map(schema.fieldIndex).getOrElse(-1)
    def groupKey(r: Row): Seq[Any] = gIdx.map(r.get)
    def sumVal(r: Row): Long = r.get(sumIdx) match {
      case n: Number => n.longValue()
      case other => throw new IllegalArgumentException(
        s"sum column ${sumCol.get} must be integral, got $other")
    }

    // pass 1: one (count, sum) subtotal per contiguous group slice
    val perSlice = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Seq[Any], Long, Long)]
      var cur: Seq[Any] = null
      var c = 0L
      var s = 0L
      it.foreach { r =>
        val g = groupKey(r)
        if (cur != null && g != cur) { out += ((pid, cur, c, s)); c = 0L; s = 0L }
        cur = g
        c += 1L
        if (sumIdx >= 0) s += sumVal(r)
      }
      if (cur != null) out += ((pid, cur, c, s))
      out.iterator
    }.collect()
    require(perSlice.length <= maxCollectedSlices,
      s"groupedRunningAgg collected ${perSlice.length} (partition, group) " +
        s"slices > bound $maxCollectedSlices: driver traffic is " +
        s"O(numParts + #groups) and assumes a LOW-CARDINALITY group key " +
        s"(strata, domains, sources) — ${groupCols.mkString("(", ",", ")")} " +
        "looks near-unique; use a per-group window for high-cardinality " +
        "keys, or raise maxCollectedSlices if the cardinality is intended")

    // driver: per-(partition, group) bases = totals over earlier slices
    val totals = scala.collection.mutable.Map.empty[Seq[Any], (Long, Long)]
    val bases = perSlice.sortBy(_._1).map { case (pid, g, c, s) =>
      val (tb, ts) = totals.getOrElse(g, (0L, 0L))
      totals(g) = (tb + c, ts + s)
      ((pid, g), (tb, ts))
    }.toMap
    val bBases = spark.sparkContext.broadcast(bases)

    // pass 2: stream each partition, resuming each group from its base
    val rows = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var cur: Seq[Any] = null
      var rank = 0L
      var cum = 0L
      it.map { r =>
        val g = groupKey(r)
        if (cur == null || g != cur) {
          val (rb, sb) = bBases.value((pid, g))
          rank = rb
          cum = sb
          cur = g
        }
        rank += 1L
        if (sumIdx >= 0) cum += sumVal(r)
        if (sumIdx >= 0) Row.fromSeq(r.toSeq :+ rank :+ cum)
        else Row.fromSeq(r.toSeq :+ rank)
      }
    }
    val outFields = schema.fields.toSeq :+
      StructField(rankName, LongType, nullable = false)
    val withSum =
      if (sumIdx >= 0) outFields :+ StructField(sumName, LongType, nullable = false)
      else outFields
    spark.createDataFrame(rows, StructType(withSum))
  }

  /** Appends `maxName`: the EXCLUSIVE running max of `maxCol` over all
    * rows strictly earlier in `orderCols` order — NULL for the globally
    * first row (no predecessor), exactly
    * `max(maxCol).over(Window.orderBy(orderCols).rowsBetween(unboundedPreceding, -1))`
    * but without the single-task unpartitioned WindowExec: the same
    * two-pass range-partitioned scheme as [[groupedRunningAgg]] in its
    * degenerate one-group form — pass 1 reduces each partition to ONE
    * max (numParts longs to the driver, never data), the driver
    * prefix-folds the bases, pass 2 streams each partition resuming
    * from its base. Parallelism is numParts regardless of frame size;
    * determinism holds for any boundary split of the total order
    * (PlanContractSpec pins the window-free shape, the q129 oracle the
    * values).
    *
    * `orderCols` must be a total order (the running max of a sequence
    * is only well-defined over one); `maxCol` must be non-null
    * integral, same contract as [[groupedRunningAgg]]'s sum column.
    */
  def runningMaxExclusive(df: DataFrame, orderCols: Seq[String],
      maxCol: String, numParts: Int = 0,
      maxName: String = "running_max"): DataFrame = {
    require(orderCols.nonEmpty, "runningMaxExclusive needs >= 1 order column")
    val spark = df.sparkSession
    val parts =
      if (numParts > 0) numParts
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val keys = orderCols.map(col)
    val sorted = graft.Caches.persisted(
      df.repartitionByRange(parts, keys: _*)
        .sortWithinPartitions(keys: _*))
    val schema = sorted.schema
    val mIdx = schema.fieldIndex(maxCol)
    def mVal(r: Row): Long = r.get(mIdx) match {
      case n: Number => n.longValue()
      case other => throw new IllegalArgumentException(
        s"max column $maxCol must be non-null integral, got $other")
    }

    // pass 1: one max per non-empty partition (range split leaves gaps)
    val perPart = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var any = false
      var m = Long.MinValue
      it.foreach { r => any = true; val v = mVal(r); if (v > m) m = v }
      if (any) Iterator((pid, m)) else Iterator.empty
    }.collect().toMap

    // driver: per-partition base = max over all EARLIER partitions
    // (None until some earlier partition held a row)
    val nParts = sorted.rdd.getNumPartitions
    var acc = Option.empty[Long]
    val bases = (0 until nParts).map { pid =>
      val base = (pid, acc)
      perPart.get(pid).foreach(m => acc = Some(acc.fold(m)(_ max m)))
      base
    }.toMap
    val bBases = spark.sparkContext.broadcast(bases)

    // pass 2: stream each partition, emitting the pre-update max
    val rows = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var cur: Option[Long] = bBases.value(pid)
      it.map { r =>
        val out = Row.fromSeq(r.toSeq :+ cur.map(Long.box).orNull)
        val v = mVal(r)
        cur = Some(cur.fold(v)(_ max v))
        out
      }
    }
    spark.createDataFrame(rows,
      StructType(schema.fields.toSeq :+ StructField(maxName, LongType, nullable = true)))
  }
}
