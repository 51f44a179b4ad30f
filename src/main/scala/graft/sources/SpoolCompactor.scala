package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Spool maintenance for the live ingest boundary: re-pack a
  * directory's frames into fewer, larger v3 containers. Short
  * [[WsIngest]] sessions (drops + resumes) leave many small packs;
  * the splittable scan is happiest with ~block-sized containers, and
  * at 100 TB a listing of millions of tiny files is itself the
  * bottleneck — compaction is the standard log-structured answer
  * (same role as RocksDB/Iceberg compaction, reimplemented here over
  * the `.binpack` format).
  *
  * Concurrency contract ([[SpoolLocks]]): compaction is OFFLINE-ONLY
  * for the target spool — it refuses to start while any live reader
  * or ingest holds a `_reader_*.marker` (streaming offsets are a file
  * COUNT over the name-sorted listing; rewriting the listing under a
  * consumed offset duplicates or drops frames), and it holds
  * `_compact.lock` while running so readers/ingest refuse to start
  * mid-rewrite.
  *
  * Crash contract: replacements are staged in a `_compacting/`
  * subdirectory (invisible to [[FrameTokenSource.listFrameFiles]],
  * which lists only the top level), renamed into place, and ONLY then
  * are the source files deleted — a crash before the renames is a
  * no-op (stale staging is cleared on the next run); a crash between
  * rename and delete leaves duplicate frames, and the RERUN collapses
  * them: re-packing dedups on frame_id (first occurrence in listing
  * order wins — old pack and its compacted copy carry identical
  * bytes), so compact-after-crash converges to the exact original
  * frame set. A fully transactional swap needs a table format's
  * atomic pointer; out of scope for the spool.
  */
object SpoolCompactor {

  /** @return (frames rewritten after frame_id dedup, containers written) */
  def compact(dir: String, framesPerPack: Int = 4096,
      conf: Configuration = null): (Long, Int) = {
    require(framesPerPack > 0, s"framesPerPack must be positive: $framesPerPack")
    val c = if (conf != null) conf else new Configuration()
    SpoolLocks.acquireCompact(dir, c)
    try compactLocked(dir, framesPerPack, c)
    finally SpoolLocks.releaseCompact(dir, c)
  }

  private def compactLocked(dir: String, framesPerPack: Int,
      c: Configuration): (Long, Int) = {
    val files = FrameTokenSource.listFrameFiles(dir, c)
    if (files.isEmpty) return (0L, 0)
    val stage = s"$dir/_compacting"
    val fs = new Path(dir).getFileSystem(c)
    fs.delete(new Path(stage), true) // stale staging from a crashed run
    fs.mkdirs(new Path(stage))
    // names must not collide with a previous compaction's output (the
    // old files are still listed — and deleted only at the end)
    val RunName = """compact_(\d+)_\d+\.binpack""".r
    val run = files.map(f => new Path(f.path).getName).collect {
      case RunName(r) => r.toLong
    }.foldLeft(-1L)(math.max) + 1
    val frames = files.iterator.flatMap { f =>
      val unit: FrameTokenSource.FrameUnit =
        if (f.isPack) FrameTokenSource.PackSlice(f.path, 0L, f.size, f.size)
        else FrameTokenSource.SingleFrame(f.path, f.frameId, f.ts, f.size)
      FrameTokenSource.openFrames(unit, c)
    }
    var n = 0L
    var packs = 0
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Array[Byte])]
    // rerun-idempotence: the crash window between rename and delete
    // leaves each frame in BOTH its old file and its compacted copy —
    // drop repeats of a frame_id here so a re-pack converges instead of
    // baking the duplicates in permanently. One spool = one ingest
    // shard's output, so the id set is bounded (a Long per frame).
    val seen = new java.util.HashSet[java.lang.Long]()
    def flush(): Unit = if (buf.nonEmpty) {
      FrameTokenSource.writeFramePack(stage, f"compact_$run%06d_$packs%06d",
        buf.iterator, c)
      packs += 1
      buf.clear()
    }
    frames.foreach { fr =>
      if (seen.add(fr._1)) {
        buf += fr
        n += 1
        if (buf.size >= framesPerPack) flush()
      }
    }
    flush()
    // publish replacements, then retire the sources
    (0 until packs).foreach { i =>
      val name = f"compact_$run%06d_$i%06d.binpack"
      require(fs.rename(new Path(stage, name), new Path(dir, name)),
        s"rename failed for $name")
    }
    files.foreach(f => fs.delete(new Path(f.path), false))
    fs.delete(new Path(stage), true)
    (n, packs)
  }
}
