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

  test("restore abandons in-flight readers via the DEFERRED path: a pre-restore capture still materializes") {
    val log = new AppendLog(spark, schema)
    (1L to 5L).foreach(i => log.append(frame(i)))
    val captured = log.cur // lazy capture, then the log is replaced
    log.restore(frame(50L, 51L))
    // the restore displaced the captured segments but must NOT have
    // unpersisted them yet (reclamation is deferred to the next append)
    assert(captured.as[Long].collect().sorted.sameElements(1L to 5L))
    assert(log.cur.as[Long].collect().sorted.sameElements(Seq(50L, 51L)))
    // the next append reaps the pre-restore generation; the log is exact
    log.append(frame(52L))
    assert(log.cur.as[Long].collect().sorted.sameElements(50L to 52L))
  }

  test("close releases the graveyard and owned segments; a closed log refuses appends") {
    def persistedIds: Set[Int] = {
      import scala.jdk.CollectionConverters._
      spark.sparkContext.getPersistentRDDs.keys.toSet.map((i: Int) => i)
    }
    val before = persistedIds
    val log = new AppendLog(spark, schema)
    (1L to 6L).foreach(i => log.append(frame(i)))
    log.restore(frame(9L)) // leaves 6 displaced checkpoints + 1 owned
    assert((persistedIds -- before).nonEmpty)
    log.close()
    // unpersist(blocking=false) unregisters from the persistence map
    // synchronously even though block removal is async
    assert((persistedIds -- before).isEmpty,
      "close() left checkpoint RDDs registered")
    intercept[IllegalArgumentException](log.append(frame(1L)))
  }

  test("maxSegments is honored: a tight bound compacts every few appends and stays exact") {
    val log = new AppendLog(spark, schema, maxSegments = 3)
    (1L to 20L).foreach(i => log.append(frame(i)))
    assert(leaves(log.cur) <= 5, s"union width ${leaves(log.cur)} not folded at maxSegments=3")
    assert(log.cur.as[Long].collect().sorted.sameElements(1L to 20L))
  }

  test("durable log: write-then-register appends, manifest recovery, rollback = manifest truncate + file delete") {
    val dir = java.nio.file.Files.createTempDirectory("graft_durlog").toString
    val log = new AppendLog(spark, schema, durableDir = Some(dir))
    assert(log.restoredBatch.isEmpty)
    log.append(frame(1L, 2L), batch = 0L)
    log.append(frame(3L), batch = 1L)
    assert(log.cur.as[Long].collect().sorted.sameElements(1L to 3L))

    // a NEW instance on the same dir recovers rows + last batch id
    val log2 = new AppendLog(spark, schema, durableDir = Some(dir))
    assert(log2.restoredBatch.contains(1L))
    assert(log2.cur.as[Long].collect().sorted.sameElements(1L to 3L))

    // replay of batch 1 after the "restart": rollback removes exactly
    // the dead session's last append — from the manifest AND the disk
    val segsBefore = new java.io.File(dir).list().count(_.startsWith("seg-"))
    log2.rollback()
    assert(log2.cur.as[Long].collect().sorted.sameElements(Seq(1L, 2L)))
    assert(new java.io.File(dir).list().count(_.startsWith("seg-")) == segsBefore - 1)
    log2.append(frame(4L), batch = 1L) // the replayed batch re-appends
    val log3 = new AppendLog(spark, schema, durableDir = Some(dir))
    assert(log3.restoredBatch.contains(1L))
    assert(log3.cur.as[Long].collect().sorted.sameElements(Seq(1L, 2L, 4L)))
  }

  test("durable log: compaction rewrites + swaps the manifest; displaced files reaped one append later") {
    val dir = java.nio.file.Files.createTempDirectory("graft_durlog_c").toString
    val log = new AppendLog(spark, schema, durableDir = Some(dir), maxSegments = 3)
    def segDirs = new java.io.File(dir).list().count(_.startsWith("seg-"))
    (1L to 10L).foreach(i => log.append(frame(i), batch = i))
    // capture before a compacting append: the fold swaps the manifest,
    // but the captured scan's files survive until the NEXT append
    val captured = log.cur
    log.append(frame(11L), batch = 11L)
    assert(captured.as[Long].collect().sorted.sameElements(1L to 10L))
    log.append(frame(12L), batch = 12L) // reaps the displaced files
    assert(log.cur.as[Long].collect().sorted.sameElements(1L to 12L))
    assert(segDirs <= 8, s"displaced segment dirs not reaped ($segDirs on disk)")
    // recovery after all of it is still exact
    val log2 = new AppendLog(spark, schema, durableDir = Some(dir))
    assert(log2.cur.as[Long].collect().sorted.sameElements(1L to 12L))
    assert(log2.restoredBatch.contains(12L))
  }

  test("durable log: restore replaces the manifest; close deletes only unreferenced files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_durlog_r").toString
    val log = new AppendLog(spark, schema, durableDir = Some(dir))
    (1L to 4L).foreach(i => log.append(frame(i), batch = i))
    log.restore(frame(7L, 8L))
    assert(log.restoredBatch.isEmpty) // nothing to replay after a restore
    assert(log.cur.as[Long].collect().sorted.sameElements(Seq(7L, 8L)))
    log.close() // reaps the four pre-restore segment dirs; keeps the live one
    val segs = new java.io.File(dir).list().filter(_.startsWith("seg-"))
    assert(segs.length == 1, s"expected 1 live segment dir, found ${segs.mkString(",")}")
    val log2 = new AppendLog(spark, schema, durableDir = Some(dir))
    assert(log2.cur.as[Long].collect().sorted.sameElements(Seq(7L, 8L)))
  }

  test("durable crash-safety: rollback publishes the truncated manifest BEFORE deleting files; a manifest naming a missing dir refuses recovery loudly") {
    // CRASH STATE A — the only window the manifest-first rollback
    // ordering leaves: the truncated manifest is already published but
    // the rolled-back segment files were not yet deleted. Construct it
    // exactly: snapshot the manifest after batch 0, append batch 1, then
    // put the snapshot back — the batch-1 segment dir is now dangling
    // (on disk, unreferenced). Recovery must see only batch 0's rows,
    // report batch 0 for replay detection, and keep appending without
    // colliding with the dangling dir.
    val dir = java.nio.file.Files.createTempDirectory("graft_durlog_xa").toString
    val manifest = java.nio.file.Paths.get(dir, "manifest")
    val log = new AppendLog(spark, schema, durableDir = Some(dir))
    log.append(frame(1L, 2L), batch = 0L)
    val snap = java.nio.file.Files.readAllBytes(manifest)
    log.append(frame(3L), batch = 1L)
    java.nio.file.Files.write(manifest, snap) // crash between swap and delete
    assert(new java.io.File(dir).list().count(_.startsWith("seg-")) == 2,
      "crash state must leave the rolled-back files on disk")
    val rec = new AppendLog(spark, schema, durableDir = Some(dir))
    assert(rec.restoredBatch.contains(0L))
    assert(rec.cur.as[Long].collect().sorted.sameElements(Seq(1L, 2L)))
    rec.append(frame(9L), batch = 1L) // the replayed batch, post-recovery
    assert(rec.cur.as[Long].collect().sorted.sameElements(Seq(1L, 2L, 9L)))
    val rec2 = new AppendLog(spark, schema, durableDir = Some(dir))
    assert(rec2.cur.as[Long].collect().sorted.sameElements(Seq(1L, 2L, 9L)))

    // CRASH STATE B — the OLD delete-then-publish ordering's hole: a
    // manifest referencing a deleted segment dir. That state is now
    // unreachable by construction; if it ever appears (mangled storage),
    // recovery must refuse AT OPEN with a named error, not hand back a
    // log whose first action explodes mid-stream.
    val dir2 = java.nio.file.Files.createTempDirectory("graft_durlog_xb").toString
    val l2 = new AppendLog(spark, schema, durableDir = Some(dir2))
    l2.append(frame(1L), batch = 0L)
    l2.append(frame(2L), batch = 1L)
    val victim = java.nio.file.Paths.get(dir2, "seg-000001")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(victim).sorted(java.util.Comparator.reverseOrder())
      .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
    val e = intercept[IllegalArgumentException](
      new AppendLog(spark, schema, durableDir = Some(dir2)))
    assert(e.getMessage.contains("missing segment dir"))
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
