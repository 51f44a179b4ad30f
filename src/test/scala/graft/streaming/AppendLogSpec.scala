package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** White-box contract tests for [[AppendLog]] — the segment-log
  * lifecycle every incremental stream shares. SoakSpec proves the same
  * contracts hold over 100+ batches end-to-end; these pin each clause
  * directly and fast (tiny frames, exact counts):
  *
  *   - append/cur linearity and the compaction width bound;
  *   - rollback of the last append, including ACROSS a compaction;
  *   - the reader contract: a frame captured from `cur` BEFORE an
  *     append whose compaction displaces its segments stays readable
  *     until the capturing batch's next append (the deferred-unpersist
  *     fix for the r14 lazy-pairs race, reproduced deterministically
  *     here on a capture → compacting-append → materialize sequence);
  *   - appendView segments survive folds by value.
  */
class AppendLogSpec extends AnyFunSuite {

  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private val schema = StructType(Seq(StructField("v", LongType, nullable = false)))

  private def frame(vs: Long*): DataFrame = vs.toDF("v")

  private def leaves(df: DataFrame): Int =
    df.queryExecution.logical.collect { case _: LogicalRDD => 1 }.sum

  test("append/cur linearity; compaction bounds the union width") {
    val log = new AppendLog(spark, schema)
    assert(log.cur.count() == 0)
    (1L to 40L).foreach(i => log.append(frame(i)))
    assert(log.cur.count() == 40)
    assert(log.cur.as[Long].collect().sorted.sameElements(1L to 40L))
    // 40 appends crossed maxSegments (32): the plan is folded + the
    // recent tail, never 40 leaves
    assert(leaves(log.cur) <= 34, s"union width ${leaves(log.cur)} not folded")
  }

  test("rollback undoes exactly the last append, including across a compaction") {
    val log = new AppendLog(spark, schema)
    (1L to 33L).foreach(i => log.append(frame(i)))
    // this append triggers compaction of the 33 committed segments
    log.append(frame(100L))
    assert(log.cur.count() == 34)
    log.rollback() // retry path: the compacted history must be intact
    assert(log.cur.count() == 33)
    assert(log.cur.as[Long].collect().sorted.sameElements(1L to 33L))
    // re-append after rollback (the retry's second attempt)
    log.append(frame(100L))
    assert(log.cur.count() == 34)
    // rollback with nothing pending is a no-op
    log.rollback(); log.rollback()
    assert(log.cur.count() == 33)
  }

  test("reader contract: a pre-append capture of cur survives the append's compaction (deferred unpersist)") {
    val log = new AppendLog(spark, schema)
    (1L to 33L).foreach(i => log.append(frame(i)))
    // capture lazily, as NearDupStream.ingestLazy captures `seen`
    val captured = log.cur
    // this append compacts and DISPLACES every segment `captured` reads;
    // before the r15 fix the displaced checkpoints were unpersisted here
    // and the materialization below failed with
    // CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND
    log.append(frame(200L))
    assert(captured.as[Long].collect().sorted.sameElements(1L to 33L))
    // the NEXT append reaps the displaced segments; the log itself stays
    // exact (reads go through the fold, not the reaped originals)
    log.append(frame(201L))
    assert(log.cur.count() == 35)
    assert(log.cur.as[Long].collect().sorted
      .sameElements((1L to 33L) ++ Seq(200L, 201L)))
  }

  test("appendView segments fold by value; rollback drops the reference only") {
    val log = new AppendLog(spark, schema)
    val parent = frame(1L, 2L, 3L).withColumn("extra", lit("x"))
      .localCheckpoint(eager = true)
    log.appendView(parent.filter(col("v") =!= 2L).select(col("v")))
    (10L to 45L).foreach(i => log.append(frame(i))) // folds the view in
    assert(log.cur.as[Long].collect().sorted
      .sameElements(Seq(1L, 3L) ++ (10L to 45L)))
    // a view append then rolled back: the parent must stay readable
    log.appendView(parent.select(col("v")))
    log.rollback()
    assert(parent.count() == 3, "rollback must not unpersist a borrowed parent")
    assert(log.cur.count() == 38)
  }
}
