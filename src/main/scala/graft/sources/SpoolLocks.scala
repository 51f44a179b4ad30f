package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Advisory coordination between spool mutators: live readers (the
  * streaming source tailing a spool, an ingest session appending to
  * it) leave `_reader_*.marker` files; [[SpoolCompactor]] refuses to
  * run while any exist, and holds `_compact.lock` while it rewrites so
  * readers/ingest refuse to START mid-compaction. Marker names never
  * end in `.bin`/`.binpack`, so [[FrameTokenSource.listFrameFiles]]
  * (and therefore offsets, which are a COUNT over that listing) never
  * sees them.
  *
  * Why this matters: the streaming offset is a file count over a
  * name-sorted listing — compacting a spool a query is tailing changes
  * the sorted listing under the consumed offset and silently
  * duplicates or drops frames. Compaction is therefore OFFLINE-ONLY
  * with respect to that spool, and this protocol makes the rule
  * self-enforcing instead of a scaladoc plea.
  *
  * These are advisory markers, not mutual exclusion: the check-then-
  * create window is not atomic (object stores have no lock primitive;
  * a transactional swap needs a table format's atomic pointer). They
  * turn the silent-corruption race into a loud refusal for every
  * non-adversarial schedule, which is the spool's contract. A reader
  * that died without `stop()` leaves a stale marker — the refusal
  * message names the files so an operator can delete them once sure
  * nothing is tailing.
  */
object SpoolLocks {

  val CompactLockName = "_compact.lock"

  private def fs(dir: String, conf: Configuration) =
    new Path(dir).getFileSystem(conf)

  /** Register a live reader/ingest on the spool (refused while a
    * compaction holds the lock). @return the marker to [[release]]
    */
  def acquireReader(dir: String, kind: String, conf: Configuration): Path = {
    val f = fs(dir, conf)
    f.mkdirs(new Path(dir))
    val lock = new Path(dir, CompactLockName)
    if (f.exists(lock)) throw new IllegalStateException(
      s"spool $dir is being compacted ($CompactLockName present); " +
        "start the " + kind + " after compaction finishes — or delete the " +
        "lock if a compaction crashed and nothing holds it")
    val p = new Path(dir,
      s"_reader_${kind}_${java.util.UUID.randomUUID().toString.take(8)}.marker")
    f.create(p, false).close()
    p
  }

  def release(marker: Path, conf: Configuration): Unit = {
    val f = marker.getFileSystem(conf)
    try f.delete(marker, false) catch { case _: Throwable => () }
  }

  /** Live reader/ingest markers currently on the spool. */
  def activeReaders(dir: String, conf: Configuration): Seq[String] = {
    val f = fs(dir, conf)
    val p = new Path(dir)
    if (!f.exists(p)) return Nil
    val it = f.listStatus(p)
    it.toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("_reader_") && n.endsWith(".marker"))
  }

  /** Take the compaction lock; refused while any reader is active. */
  def acquireCompact(dir: String, conf: Configuration): Unit = {
    val readers = activeReaders(dir, conf)
    if (readers.nonEmpty) throw new IllegalStateException(
      s"spool $dir has ${readers.size} active reader(s)/ingest(s): " +
        readers.mkString(", ") + " — compaction is offline-only (streaming " +
        "offsets are a count over the sorted listing; compacting underneath " +
        "a tail duplicates or drops frames). Stop them first; delete stale " +
        "markers only if their owner crashed.")
    fs(dir, conf).create(new Path(dir, CompactLockName), false).close()
  }

  def releaseCompact(dir: String, conf: Configuration): Unit =
    release(new Path(dir, CompactLockName), conf)
}
