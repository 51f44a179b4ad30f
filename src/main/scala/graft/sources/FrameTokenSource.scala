package graft.sources

import graft.decode.TokenExtractor
import graft.model.TokenProfile
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, LocatedFileStatus, Path}
import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, NullOrdering, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import java.util.{Map => JMap}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Serializable snapshot of the session Hadoop configuration, shipped to
  * executors inside the reader factory so they open the SAME FileSystem
  * (credentials, endpoints, s3a settings) the driver planned with.
  * `Configuration` itself is a Writable, not Serializable — this is the
  * standard wrap-the-Writable pattern.
  */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

/** DataSource V2 frame source with PHYSICAL pushdown (SURVEY §2.1 S1/S2,
  * full shape): the defining trick of the reference is that the entire
  * query ships to the source — `config.py:134-242` serializes every
  * filter into the WebSocket URL and the server returns pre-filtered,
  * pre-ranked, pre-limited rows. This connector is the Spark-native
  * mapping of that architecture: the "server" is the scan itself. It
  * reads raw frame files (one WebSocket frame per `.bin` file, named
  * `frame_<id>_<ts>.bin`, or many frames per `.binpack` container), runs
  * the deep token extraction (scraper.py:307-674) inside the reader, and
  * implements
  *
  *   - [[SupportsPushDownFilters]] — the same predicate vocabulary the
  *     URL carries (chain/protocol equality + IN, liquidity/volume/txns/
  *     change/market-cap ranges, boost floor) is applied to decoded rows
  *     BEFORE they leave the source; unsupported predicates are returned
  *     to Spark for engine-side evaluation (S2's backstop).
  *   - [[SupportsPushDownTopN]] — rank-by + limit evaluates as a bounded
  *     per-partition top-N inside the reader (`isPartiallyPushed`), so
  *     the shuffle carries ≤ N rows per partition and Spark's global
  *     TakeOrdered finishes the job: the distributed generalization of
  *     the reference's server-side `rankBy + first page`.
  *   - [[SupportsPushDownRequiredColumns]] — column pruning: a 2-column
  *     projection materializes 2 fields per token, not 29.
  *
  * Scale shape (the 100 TB posture, for real this time):
  *   - All listing and reading go through `org.apache.hadoop.fs
  *     .FileSystem`, so `load("hdfs://…")` / `load("s3a://…")` work the
  *     same as a local directory, with the session Hadoop conf
  *     (credentials, endpoints) shipped to executors.
  *   - `.binpack` containers (v2, sync-marked) are SPLITTABLE by byte
  *     range — a 10 GB container becomes ~80 independent 128 MB slices,
  *     so a few huge containers can no longer skew partitions; readers
  *     resynchronize at the per-record "GFRM" marker exactly the way
  *     SequenceFile/Avro readers find their sync points.
  *   - Work units are packed into input partitions balanced by BYTES
  *     (greedy longest-processing-time), not by file count, and each
  *     partition carries `preferredLocations` derived from the HDFS
  *     block hosts of its slices, so the scheduler gets data locality.
  *   - Decode is embarrassingly parallel; no shuffle happens inside the
  *     source. The micro-batch stream tracks the file listing as its
  *     offset, replaying the same decode per batch (every reference
  *     cycle is a full snapshot, ST2).
  */
object FrameTokenSource {

  val ShortName = "graft-tokens"

  val tokenSchema: StructType = Encoders.product[TokenProfile].schema
  val fullSchema: StructType =
    StructType(StructField("frame_id", LongType, nullable = false) +: tokenSchema.fields)

  /** Columns the reference's URL serializer can express (config.py:134-242
    * via the engine mapping QueryCompiler.filterPredicate) — the pushdown
    * vocabulary — plus the source-native frame_id.
    */
  val PushableColumns: Set[String] = Set(
    "frame_id", "chain", "protocol", "liquidity", "volume_24h", "txns_24h",
    "change_5m", "change_1h", "change_6h", "change_24h", "market_cap",
    "boost", "price", "makers", "confidence_score", "field_count", "timestamp")

  private[sources] val tokenOrdinal: Map[String, Int] =
    tokenSchema.fieldNames.zipWithIndex.toMap

  /** Default split size for `.binpack` containers — same default as
    * `spark.sql.files.maxPartitionBytes`.
    */
  val DefaultMaxSplitBytes: Long = 128L << 20

  // ---------------------------------------------------------------------
  // File formats
  // ---------------------------------------------------------------------
  //   single frame:  frame_<id12>_<ts>.bin            (raw frame bytes)
  //   container v1:  "GFPK" ++ [id i64][ts i64][len i32][bytes]*   (legacy,
  //                  LE, no sync markers → not splittable; whole-file read)
  //   container v2:  "GFP2" ++ ("GFRM"[id i64][ts i64][len i32][bytes])*
  //                  (LE; the constant per-record "GFRM" marker lets a
  //                  reader resynchronize mid-file — read-compatible, but
  //                  a payload can contain "GFRM" by chance/adversarially)
  //   container v3:  "GFP3" ++ sync[16] ++ (sync[16][id i64][ts i64]
  //                  [len i32][bytes])*  (LE; the sync marker is 16
  //                  RANDOM bytes drawn per file and recorded in the
  //                  header — readers learn it before scanning, so a
  //                  payload colliding with it is a 2^-128 event, the
  //                  same guarantee SequenceFile/Avro sync blocks give)
  // ---------------------------------------------------------------------

  private val FileName = """frame_(\d+)_(\d+)\.bin""".r
  private val PackMagicV1 = Array[Byte]('G', 'F', 'P', 'K')
  private val PackMagicV2 = Array[Byte]('G', 'F', 'P', '2')
  private val PackMagicV3 = Array[Byte]('G', 'F', 'P', '3')
  private val RecordMarker = Array[Byte]('G', 'F', 'R', 'M')
  private val SyncLen = 16 // v3 per-file random sync length
  private val FixedHeaderLen = 20 // id 8 + ts 8 + len 4 (after the sync)

  /** One block of a listed file with its replica hosts (from the located
    * listing — no extra namenode RPC per file).
    */
  final case class HostedRange(start: Long, end: Long, hosts: Seq[String])

  /** One listed file: a single-frame `.bin` (frameId/ts from the name) or
    * a multi-frame `.binpack` container.
    */
  final case class FrameFile(path: String, frameId: Long, ts: Long,
      size: Long, isPack: Boolean, blocks: Seq[HostedRange])

  /** One reader work unit. */
  sealed trait FrameUnit extends Serializable {
    def path: String
    def bytes: Long
    def start: Long
  }
  /** A whole single-frame `.bin` file. */
  final case class SingleFrame(path: String, frameId: Long, ts: Long, size: Long)
      extends FrameUnit {
    def bytes: Long = size
    def start: Long = 0L
  }
  /** A byte range of a `.binpack` container: the reader consumes every
    * record whose sync marker STARTS in [start, end) — the Hadoop input-
    * split ownership rule, so slices tile a container exactly.
    */
  final case class PackSlice(path: String, start: Long, end: Long, fileLen: Long)
      extends FrameUnit {
    def bytes: Long = end - start
  }

  /** Deterministic located listing through the Hadoop FileSystem API:
    * files sorted by name (zero-padded ids keep name order = id order in
    * the fixtures); works for file://, hdfs://, s3a:// alike. Block
    * locations ride along from `listLocatedStatus` for locality hints.
    */
  def listFrameFiles(dir: String, conf: Configuration): Array[FrameFile] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return Array.empty
    val it = fs.listLocatedStatus(p)
    val buf = mutable.ArrayBuffer.empty[LocatedFileStatus]
    while (it.hasNext) {
      val s = it.next()
      val n = s.getPath.getName
      if (s.isFile && (n.endsWith(".bin") || n.endsWith(".binpack"))) buf += s
    }
    buf.sortBy(_.getPath.getName).zipWithIndex.map { case (s, i) =>
      val name = s.getPath.getName
      val (id, ts) = name match {
        case FileName(fid, fts) => (fid.toLong, fts.toLong)
        case _ => (i.toLong, 0L)
      }
      FrameFile(s.getPath.toString, id, ts, s.getLen, name.endsWith(".binpack"),
        s.getBlockLocations.toSeq.map(b =>
          HostedRange(b.getOffset, b.getOffset + b.getLength, b.getHosts.toSeq)))
    }.toArray
  }

  /** Harness/test helper: write frames as the file layout the source
    * reads (zero-padded id keeps listing order). Goes through the Hadoop
    * FileSystem so harnesses can stage to any scheme.
    */
  def frameFileName(frameId: Long, ts: Long): String = f"frame_$frameId%012d_$ts.bin"

  /** Hadoop conf for the writer helpers: the SESSION conf when a session
    * exists (so staging to s3a://hdfs:// sees configured credentials and
    * endpoints, same as the read path's SerializableHadoopConf), else a
    * bare default — the helpers also run inside executor tasks where no
    * session may be registered.
    */
  private def writerConf(): Configuration =
    scala.util.Try(SparkSession.active.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  def writeFrameFile(dir: String, frameId: Long, ts: Long, bytes: Array[Byte],
      conf: Configuration = null): Unit = {
    val p = new Path(dir, frameFileName(frameId, ts))
    val out = p.getFileSystem(if (conf != null) conf else writerConf()).create(p, true)
    try out.write(bytes) finally out.close()
  }

  /** Write a v3 (splittable) `.binpack` container: "GFP3" magic, then the
    * file's 16 random sync bytes, then sync-marked records
    * [sync16][frameId i64][ts i64][len i32][bytes], little-endian.
    */
  def writeFramePack(dir: String, name: String,
      frames: Iterator[(Long, Long, Array[Byte])],
      conf: Configuration = null): Unit = {
    val p = new Path(dir, s"$name.binpack")
    val out = new java.io.BufferedOutputStream(
      p.getFileSystem(if (conf != null) conf else writerConf()).create(p, true), 1 << 20)
    try {
      val sync = new Array[Byte](SyncLen)
      new java.security.SecureRandom().nextBytes(sync)
      out.write(PackMagicV3)
      out.write(sync)
      val hdr = java.nio.ByteBuffer.allocate(FixedHeaderLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      frames.foreach { case (id, ts, bytes) =>
        hdr.clear()
        hdr.putLong(id).putLong(ts).putInt(bytes.length)
        out.write(sync)
        out.write(hdr.array())
        out.write(bytes)
      }
    } finally out.close()
  }

  /** v2 container writer (constant "GFRM" sync) — kept ONLY so tests can
    * pin backward compatibility of the reader with v2 containers.
    */
  private[graft] def writeFramePackV2(dir: String, name: String,
      frames: Iterator[(Long, Long, Array[Byte])],
      conf: Configuration = null): Unit = {
    val p = new Path(dir, s"$name.binpack")
    val out = new java.io.BufferedOutputStream(
      p.getFileSystem(if (conf != null) conf else writerConf()).create(p, true), 1 << 20)
    try {
      out.write(PackMagicV2)
      val hdr = java.nio.ByteBuffer.allocate(4 + FixedHeaderLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      frames.foreach { case (id, ts, bytes) =>
        hdr.clear()
        hdr.put(RecordMarker).putLong(id).putLong(ts).putInt(bytes.length)
        out.write(hdr.array())
        out.write(bytes)
      }
    } finally out.close()
  }

  /** Legacy v1 container writer — kept ONLY so tests can pin backward
    * compatibility of the reader with pre-split-era containers.
    */
  private[graft] def writeFramePackV1(dir: String, name: String,
      frames: Iterator[(Long, Long, Array[Byte])],
      conf: Configuration = null): Unit = {
    val p = new Path(dir, s"$name.binpack")
    val out = new java.io.BufferedOutputStream(
      p.getFileSystem(if (conf != null) conf else writerConf()).create(p, true), 1 << 20)
    try {
      out.write(PackMagicV1)
      val hdr = java.nio.ByteBuffer.allocate(FixedHeaderLen).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      frames.foreach { case (id, ts, bytes) =>
        hdr.clear()
        hdr.putLong(id).putLong(ts).putInt(bytes.length)
        out.write(hdr.array())
        out.write(bytes)
      }
    } finally out.close()
  }

  /** Expand the listing into reader work units: singles pass through,
    * containers split into ~maxSplitBytes byte ranges (v1 containers are
    * range-split too — the reader detects the un-synced magic and lets
    * only the head slice scan the file, so legacy packs stay correct,
    * just unbalanced; the writer has emitted splittable v2 since r4).
    */
  def planSlices(files: Array[FrameFile],
      maxSplitBytes: Long): Array[(FrameUnit, Seq[HostedRange])] = {
    val maxSplit = math.max(1L, maxSplitBytes)
    files.flatMap { f =>
      if (!f.isPack) {
        Seq((SingleFrame(f.path, f.frameId, f.ts, f.size): FrameUnit, f.blocks))
      } else if (f.size == 0) {
        Seq.empty
      } else {
        val nSplits = ((f.size + maxSplit - 1) / maxSplit).max(1L)
        val step = ((f.size + nSplits - 1) / nSplits).max(1L)
        (0L until f.size by step).map { s =>
          (PackSlice(f.path, s, math.min(s + step, f.size), f.size): FrameUnit, f.blocks)
        }
      }
    }
  }

  /** Pack work units into ≤`partitions` input partitions balanced by
    * BYTES (greedy longest-processing-time: biggest unit to the least
    * loaded bin), so one huge container slice can't ride with a full
    * share of small files. Each partition's preferred hosts are the
    * byte-weighted top block hosts of its slices.
    */
  def groupUnits(units: Array[(FrameUnit, Seq[HostedRange])],
      partitions: Int): Array[InputPartition] = {
    if (units.isEmpty) return Array.empty
    val sorted = units.sortBy { case (u, _) => (-u.bytes, u.path, u.start) }
    val nBins = math.min(math.max(1, partitions), units.length)
    val load = Array.fill(nBins)(0L)
    val bins = Array.fill(nBins)(mutable.ArrayBuffer.empty[(FrameUnit, Seq[HostedRange])])
    sorted.foreach { t =>
      var best = 0
      var i = 1
      while (i < nBins) { if (load(i) < load(best)) best = i; i += 1 }
      bins(best) += t
      load(best) += t._1.bytes
    }
    bins.filter(_.nonEmpty).map { bin =>
      val hostWeight = mutable.Map.empty[String, Long]
      bin.foreach { case (u, blocks) =>
        val (s, e) = (u.start, u.start + u.bytes)
        blocks.foreach { b =>
          val overlap = math.min(e, b.end) - math.max(s, b.start)
          if (overlap > 0) b.hosts.foreach { h =>
            hostWeight.update(h, hostWeight.getOrElse(h, 0L) + overlap)
          }
        }
      }
      val locations = hostWeight.toSeq.sortBy { case (h, w) => (-w, h) }
        .take(3).map(_._1).toArray
      // order within the partition by (path, offset) for sequential reads
      FrameSlicesPartition(
        bin.sortBy(t => (t._1.path, t._1.start)).map(_._1).toArray,
        locations): InputPartition
    }
  }

  /** Open one work unit as its (frameId, ts, bytes) frames. Streams are
    * closed at iterator exhaustion; `register` additionally hands them to
    * the caller so an early-terminated reader (pushed limit) can close
    * them in `PartitionReader.close()`.
    */
  def openFrames(unit: FrameUnit, conf: Configuration,
      register: AutoCloseable => Unit = _ => ()): Iterator[(Long, Long, Array[Byte])] =
    unit match {
      case SingleFrame(path, id, ts, size) =>
        require(size <= Int.MaxValue, s"single frame too large: $path ($size bytes)")
        val p = new Path(path)
        val in = p.getFileSystem(conf).open(p)
        try {
          val bytes = new Array[Byte](size.toInt)
          in.readFully(0L, bytes)
          Iterator.single((id, ts, bytes))
        } finally in.close()

      case slice @ PackSlice(path, _, _, fileLen) =>
        if (fileLen < 4) Iterator.empty
        else {
          val p = new Path(path)
          val in = p.getFileSystem(conf).open(p)
          register(in)
          val magic = new Array[Byte](4)
          in.readFully(0L, magic)
          if (magic.sameElements(PackMagicV3)) {
            // per-file random sync lives in the header: learn it first
            require(fileLen >= 4L + SyncLen, s"truncated GFP3 header: $path")
            val sync = new Array[Byte](SyncLen)
            in.readFully(4L, sync)
            new PackSliceIterator(in, slice, sync, dataStart = 4L + SyncLen)
          }
          else if (magic.sameElements(PackMagicV2))
            new PackSliceIterator(in, slice, RecordMarker, dataStart = 4L)
          else if (magic.sameElements(PackMagicV1)) {
            // legacy, no sync markers: only the slice owning byte 0 reads
            // (whole file, sequential); other slices of the same file are
            // no-ops. Correct but skewed — v2 is the scale format.
            try {
              if (slice.start > 0) Iterator.empty
              else {
                require(fileLen <= Int.MaxValue,
                  s"legacy v1 container too large to read unsplit: $path")
                val bytes = new Array[Byte](fileLen.toInt)
                in.readFully(0L, bytes)
                parsePackV1(bytes, path)
              }
            } finally in.close()
          } else {
            in.close()
            throw new IllegalArgumentException(s"not a GFPK/GFP2 container: $path")
          }
        }
    }

  /** v1 parse: sequential [id][ts][len][bytes] records after the magic. */
  private def parsePackV1(bytes: Array[Byte], path: String): Iterator[(Long, Long, Array[Byte])] = {
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.position(4)
    new Iterator[(Long, Long, Array[Byte])] {
      override def hasNext: Boolean = buf.remaining() >= 20
      override def next(): (Long, Long, Array[Byte]) = {
        val id = buf.getLong()
        val ts = buf.getLong()
        val len = buf.getInt()
        require(len >= 0 && len <= buf.remaining(),
          s"corrupt GFPK record in $path: frame $id declares $len bytes, " +
            s"${buf.remaining()} remain")
        val frame = new Array[Byte](len)
        buf.get(frame)
        (id, ts, frame)
      }
    }
  }

  /** v2/v3 byte-range record iterator: finds the first valid sync marker
    * at or after `start` (chained-header validation kills payload bytes
    * that merely look like a marker — and in v3 the marker itself is 16
    * per-file random bytes, so payload collisions are 2^-128), then
    * follows the record chain until a record starts at or past `end`.
    *
    * All steady-state reads go through a multi-MB read-ahead window and
    * advance strictly forward, so a slice costs O(bytes / window) large
    * positioned reads — NOT three tiny preads per record, which on a
    * checksummed FileSystem (LocalFileSystem, HDFS) turns into a syscall
    * storm (the r4 bench measured q36 at 15.4 s from exactly that; the
    * windowed reader returns it to ~1 s). Positioned reads only — no
    * seek state, safe over any FSDataInputStream.
    */
  private final class PackSliceIterator(in: FSDataInputStream, slice: PackSlice,
      sync: Array[Byte], dataStart: Long)
      extends Iterator[(Long, Long, Array[Byte])] {
    private val syncLen = sync.length
    private val hdrLen = syncLen + FixedHeaderLen
    private val end = slice.end
    private val fileLen = slice.fileLen

    // ---- read-ahead window: [winStart, winStart+winLen) of the file ----
    private val WindowSize = 4 << 20
    private var winStart = 0L
    private var winLen = 0
    private var win = Array.emptyByteArray

    /** Ensure [pos, pos+n) is buffered; return `pos`'s offset into `win`.
      * Refills read up to WindowSize bytes forward from `pos` (growing
      * past WindowSize only for an over-sized payload).
      */
    private def ensure(pos: Long, n: Int): Int = {
      if (pos >= winStart && pos + n <= winStart + winLen)
        (pos - winStart).toInt
      else {
        require(pos + n <= fileLen,
          s"read past EOF in ${slice.path}: [$pos, ${pos + n}) of $fileLen")
        val want = math.max(WindowSize, n)
        val avail = math.min(want.toLong, fileLen - pos).toInt
        if (win.length < avail) win = new Array[Byte](avail)
        in.readFully(pos, win, 0, avail)
        winStart = pos
        winLen = avail
        0
      }
    }

    private def syncAtWin(off: Int): Boolean = {
      var i = 0
      while (i < syncLen) { if (win(off + i) != sync(i)) return false; i += 1 }
      true
    }
    private def longLE(off: Int): Long = {
      var v = 0L
      var i = 7
      while (i >= 0) { v = (v << 8) | (win(off + i) & 0xffL); i -= 1 }
      v
    }
    private def intLE(off: Int): Int =
      (win(off) & 0xff) | ((win(off + 1) & 0xff) << 8) |
        ((win(off + 2) & 0xff) << 16) | ((win(off + 3) & 0xff) << 24)

    /** Depth-2 validation of a candidate sync position via DIRECT small
      * preads (so the scan window stays intact): marker + sane declared
      * length + the chain continuing (next sync or exact EOF). Only runs
      * on scan-time candidates — never in the steady-state record loop.
      */
    private def validHeaderAt(m: Long): Boolean = {
      if (m + hdrLen > fileLen) return false
      val hdr = new Array[Byte](hdrLen)
      in.readFully(m, hdr)
      var i = 0
      while (i < syncLen) { if (hdr(i) != sync(i)) return false; i += 1 }
      val bb = java.nio.ByteBuffer.wrap(hdr).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val len = bb.getInt(syncLen + 16)
      if (len < 0 || m + hdrLen + len > fileLen) return false
      val nxt = m + hdrLen + len
      if (nxt == fileLen) true
      else if (nxt + syncLen > fileLen) false
      else {
        val peek = new Array[Byte](syncLen)
        in.readFully(nxt, peek)
        java.util.Arrays.equals(peek, sync)
      }
    }

    /** Windowed forward scan for the first validated sync in [from, end). */
    private def findFirstMarker(from: Long): Long = {
      var pos = from
      while (pos < end && pos + hdrLen <= fileLen) {
        val off = ensure(pos, hdrLen)
        val lastOff = winLen - hdrLen // last in-window offset with a full header
        var i = off
        while (i <= lastOff && winStart + i < end) {
          if (syncAtWin(i) && validHeaderAt(winStart + i)) return winStart + i
          i += 1
        }
        val next = winStart + i
        if (next >= end || next + hdrLen > fileLen) return -1L
        pos = next // header straddles the window edge: refill from here
      }
      -1L
    }

    private var nextMarker = findFirstMarker(math.max(slice.start, dataStart))
    private var closed = false

    private def closeIn(): Unit = if (!closed) { closed = true; in.close() }

    override def hasNext: Boolean = {
      val has = nextMarker >= 0 && nextMarker < end
      if (!has) closeIn()
      has
    }

    private def corrupt(m: Long): Nothing = throw new IllegalStateException(
      s"corrupt container chain in ${slice.path} at offset $m")

    override def next(): (Long, Long, Array[Byte]) = {
      if (!hasNext) throw new NoSuchElementException
      val m = nextMarker
      // the previous chain check only proved syncLen bytes fit at m — a
      // truncated final header must fail as corrupt, not as a raw EOF
      if (m + hdrLen > fileLen) corrupt(m)
      // header (sync already validated at m by the scan or the previous
      // record's chain check) — all window accesses move strictly forward
      var off = ensure(m, hdrLen)
      val id = longLE(off + syncLen)
      val ts = longLE(off + syncLen + 8)
      val len = intLE(off + syncLen + 16)
      if (len < 0 || m + hdrLen + len > fileLen) corrupt(m)
      val bytes = new Array[Byte](len)
      off = ensure(m + hdrLen, len)
      System.arraycopy(win, off, bytes, 0, len)
      val nxt = m + hdrLen + len
      if (nxt < fileLen) {
        // chain check: the next record's sync must follow immediately
        if (nxt + syncLen > fileLen) corrupt(nxt)
        off = ensure(nxt, syncLen)
        if (!syncAtWin(off)) corrupt(nxt)
      }
      nextMarker = if (nxt >= fileLen) -1L else nxt
      (id, ts, bytes)
    }
  }

  /** JVM value of a column from a decoded (frameId, token row) pair —
    * strings come back as String, numerics as their primitive box.
    */
  private[sources] def columnValue(name: String, frameId: Long, row: InternalRow): Any = {
    if (name == "frame_id") return frameId
    val ord = tokenOrdinal(name)
    if (row.isNullAt(ord)) return null
    tokenSchema(ord).dataType match {
      case StringType => row.getUTF8String(ord).toString
      case DoubleType => row.getDouble(ord)
      case IntegerType => row.getInt(ord)
      case LongType => row.getLong(ord)
      case dt => row.get(ord, dt)
    }
  }

  /** Total order used by both filter comparisons and top-N: numerics by
    * double value, strings lexicographically.
    */
  private[sources] def compareValues(a: Any, b: Any): Int = (a, b) match {
    case (x: String, y: String) => x.compareTo(y)
    case (x: Number, y: Number) => java.lang.Double.compare(x.doubleValue(), y.doubleValue())
    case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
    case _ => throw new IllegalArgumentException(s"incomparable: $a vs $b")
  }

  private def comparable(v: Any): Boolean = v match {
    case _: String | _: Number | _: Boolean => true
    case _ => false
  }

  /** Can the source fully evaluate this predicate? (Attribute known +
    * pushable, literal of a simple type, operator in the URL vocabulary.)
    */
  def supportedFilter(f: Filter): Boolean = f match {
    case EqualTo(a, v) => PushableColumns(a) && comparable(v)
    case GreaterThan(a, v) => PushableColumns(a) && comparable(v)
    case GreaterThanOrEqual(a, v) => PushableColumns(a) && comparable(v)
    case LessThan(a, v) => PushableColumns(a) && comparable(v)
    case LessThanOrEqual(a, v) => PushableColumns(a) && comparable(v)
    case In(a, vs) => PushableColumns(a) && vs.forall(comparable)
    case IsNotNull(a) => fullSchema.fieldNames.contains(a)
    case IsNull(a) => fullSchema.fieldNames.contains(a)
    case And(l, r) => supportedFilter(l) && supportedFilter(r)
    case Or(l, r) => supportedFilter(l) && supportedFilter(r)
    case Not(c) => supportedFilter(c)
    case _ => false
  }

  /** SQL three-valued evaluation: None = UNKNOWN (a null operand).
    * Collapsing null comparisons straight to `false` would be wrong
    * under `Not` — SQL's NOT(UNKNOWN) is UNKNOWN (row dropped), while
    * !(false) is true (row kept) — so UNKNOWN must propagate through
    * the boolean connectives (Kleene logic) and collapse to "drop" only
    * at the row gate, exactly like Spark's own FilterExec.
    */
  private def evalFilter3(f: Filter, frameId: Long, row: InternalRow): Option[Boolean] = {
    def cmp(a: String, v: Any): Option[Int] = {
      val x = columnValue(a, frameId, row)
      if (x == null) None else Some(compareValues(x, v))
    }
    f match {
      case EqualTo(a, v) => cmp(a, v).map(_ == 0)
      case GreaterThan(a, v) => cmp(a, v).map(_ > 0)
      case GreaterThanOrEqual(a, v) => cmp(a, v).map(_ >= 0)
      case LessThan(a, v) => cmp(a, v).map(_ < 0)
      case LessThanOrEqual(a, v) => cmp(a, v).map(_ <= 0)
      case In(a, vs) =>
        // supportedFilter rejects null list elements, so no UNKNOWN-from-
        // the-list case exists — only a null probe value
        val x = columnValue(a, frameId, row)
        if (x == null) None else Some(vs.exists(v => compareValues(x, v) == 0))
      case IsNotNull(a) => Some(columnValue(a, frameId, row) != null)
      case IsNull(a) => Some(columnValue(a, frameId, row) == null)
      case And(l, r) =>
        (evalFilter3(l, frameId, row), evalFilter3(r, frameId, row)) match {
          case (Some(false), _) | (_, Some(false)) => Some(false)
          case (Some(true), Some(true)) => Some(true)
          case _ => None
        }
      case Or(l, r) =>
        (evalFilter3(l, frameId, row), evalFilter3(r, frameId, row)) match {
          case (Some(true), _) | (_, Some(true)) => Some(true)
          case (Some(false), Some(false)) => Some(false)
          case _ => None
        }
      case Not(c) => evalFilter3(c, frameId, row).map(!_)
      case _ => Some(false) // unreachable: supportedFilter gates pushdown
    }
  }

  /** Row gate for pushed predicates: keep only when TRUE (UNKNOWN drops). */
  def evalFilter(f: Filter, frameId: Long, row: InternalRow): Boolean =
    evalFilter3(f, frameId, row).contains(true)

  /** One pushed sort key: column + direction + null placement. */
  final case class SortKey(column: String, descending: Boolean, nullsFirst: Boolean)

  object SortKey {
    def from(order: SortOrder): Option[SortKey] = order.expression() match {
      case f: NamedReference if f.fieldNames().length == 1 &&
          fullSchema.fieldNames.contains(f.fieldNames()(0)) =>
        Some(SortKey(f.fieldNames()(0),
          order.direction() == SortDirection.DESCENDING,
          order.nullOrdering() == NullOrdering.NULLS_FIRST))
      case _ => None
    }
  }

  final case class TopNSpec(keys: Seq[SortKey], limit: Int)

  /** Row comparator matching Spark's SortOrder semantics exactly — the
    * per-partition top-N MUST keep a superset of the global top-N.
    */
  private[sources] def rowOrdering(keys: Seq[SortKey]): Ordering[(Long, InternalRow)] =
    new Ordering[(Long, InternalRow)] {
      override def compare(x: (Long, InternalRow), y: (Long, InternalRow)): Int = {
        val it = keys.iterator
        while (it.hasNext) {
          val k = it.next()
          val a = columnValue(k.column, x._1, x._2)
          val b = columnValue(k.column, y._1, y._2)
          val c =
            if (a == null && b == null) 0
            else if (a == null) { if (k.nullsFirst) -1 else 1 }
            else if (b == null) { if (k.nullsFirst) 1 else -1 }
            else if (k.descending) -compareValues(a, b)
            else compareValues(a, b)
          if (c != 0) return c
        }
        0
      }
    }
}

/** `spark.read.format("graft-tokens").load(framesDir)`. */
class FrameTokenSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = FrameTokenSource.ShortName
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FrameTokenSource.fullSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new FrameTokenTable(properties.get("path"))
}

class FrameTokenTable(path: String) extends Table with SupportsRead {
  require(path != null, "graft-tokens requires a path (frame file directory)")
  override def name(): String = s"${FrameTokenSource.ShortName}:$path"
  override def schema(): StructType = FrameTokenSource.fullSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FrameTokenScanBuilder(path,
      Option(options.get("partitions")).map(_.toInt).getOrElse(32),
      Option(options.get("maxsplitbytes")).map(_.toLong)
        .getOrElse(FrameTokenSource.DefaultMaxSplitBytes),
      // snapshot the SESSION Hadoop conf at planning time (driver-side):
      // executors must resolve hdfs://s3a:// with the same credentials
      new SerializableHadoopConf(SparkSession.active.sessionState.newHadoopConf()),
      ConnectivityConf.fromOptions(options))
}

/** Connection-policy knobs, reference defaults (scraper.py:44-47):
  * 4 polls/s, 5 attempts, 1 s backoff base. `maxFilesPerTrigger` bounds
  * micro-batch admission (streaming flow control; None = all available).
  */
final case class ConnectivityConf(rateLimit: Double, maxRetries: Int,
    backoffBase: Double, maxFilesPerTrigger: Option[Int] = None)

object ConnectivityConf {
  val Defaults: ConnectivityConf = ConnectivityConf(4.0, 5, 1.0)
  def fromOptions(options: CaseInsensitiveStringMap): ConnectivityConf = ConnectivityConf(
    Option(options.get("ratelimit")).map(_.toDouble).getOrElse(Defaults.rateLimit),
    Option(options.get("maxretries")).map(_.toInt).getOrElse(Defaults.maxRetries),
    Option(options.get("backoffbase")).map(_.toDouble).getOrElse(Defaults.backoffBase),
    Option(options.get("maxfilespertrigger")).map(_.toInt))
}

class FrameTokenScanBuilder(path: String, partitions: Int, maxSplitBytes: Long,
    hconf: SerializableHadoopConf,
    connectivity: ConnectivityConf = ConnectivityConf.Defaults) extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownTopN
    with SupportsPushDownLimit {
  import FrameTokenSource._

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = fullSchema
  private var topN: Option[TopNSpec] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, unsup) = filters.partition(supportedFilter)
    pushed = sup
    unsup // engine evaluates what the source can't express (S2 backstop)
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = { required = requiredSchema }

  override def pushTopN(orders: Array[SortOrder], limit: Int): Boolean = {
    val keys = orders.toSeq.map(SortKey.from)
    if (keys.nonEmpty && keys.forall(_.isDefined)) {
      topN = Some(TopNSpec(keys.flatten, limit)); true
    } else false
  }

  override def pushLimit(limit: Int): Boolean = {
    // plain LIMIT without sort: any `limit` rows are valid per partition
    if (topN.isEmpty) topN = Some(TopNSpec(Nil, limit))
    true
  }

  /** Per-partition top-N only — Spark's global TakeOrdered completes it. */
  override def isPartiallyPushed(): Boolean = true

  override def build(): Scan =
    new FrameTokenScan(path, partitions, maxSplitBytes, hconf, required, pushed,
      topN, connectivity)
}

class FrameTokenScan(path: String, partitions: Int, maxSplitBytes: Long,
    hconf: SerializableHadoopConf, required: StructType,
    filters: Array[Filter], topN: Option[FrameTokenSource.TopNSpec],
    connectivity: ConnectivityConf = ConnectivityConf.Defaults)
    extends Scan with Batch with SupportsReportStatistics {
  import FrameTokenSource._

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  // one listing per scan: statistics and partition planning see the same
  // snapshot (a file arriving between the two calls can't skew them)
  private lazy val listed: Array[FrameFile] = listFrameFiles(path, hconf.value)

  /** Size/row statistics from the file listing, so Catalyst can make
    * broadcast-join and AQE decisions about source-backed frames instead
    * of assuming the worst case (`conf.defaultSizeInBytes` = effectively
    * infinite, which silently disqualifies the source from every
    * broadcast). Raw frame bytes are the same proxy parquet uses; a
    * pushed limit caps them. Row count: only emitted under a pushed
    * TopN/limit (≤ limit rows per partition is a guarantee); otherwise
    * unknown — decode yields 0..50 tokens per frame and a fabricated
    * count would mislead the optimizer.
    */
  override def estimateStatistics(): Statistics = new Statistics {
    private val totalBytes = listed.map(_.size).sum
    override def sizeInBytes(): java.util.OptionalLong = {
      val capped = topN match {
        // ≤ limit rows survive per partition; bound bytes accordingly
        // (rows are ≤ ~2 KB decoded; listing bytes already bound input)
        case Some(TopNSpec(_, limit)) =>
          math.min(totalBytes, limit.toLong * math.max(1, partitions) * 2048L)
        case None => totalBytes
      }
      java.util.OptionalLong.of(capped)
    }
    override def numRows(): java.util.OptionalLong = topN match {
      case Some(TopNSpec(_, limit)) =>
        java.util.OptionalLong.of(limit.toLong * math.max(1, partitions))
      case None => java.util.OptionalLong.empty()
    }
  }

  /** Shown by explain("formatted") on the BatchScan node. */
  override def description(): String = {
    val t = topN.map(s => s" PushedTopN: [${s.keys.mkString(", ")} LIMIT ${s.limit}]")
      .getOrElse("")
    s"graft-tokens path=$path PushedFilters: ${filters.mkString("[", ", ", "]")}," +
      s" ReadSchema: ${required.fieldNames.mkString("[", ",", "]")}$t"
  }

  override def planInputPartitions(): Array[InputPartition] =
    groupUnits(planSlices(listed, maxSplitBytes), partitions)

  override def createReaderFactory(): PartitionReaderFactory =
    new FrameTokenReaderFactory(hconf, required, filters, topN)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new FrameTokenMicroBatchStream(path, partitions, maxSplitBytes, hconf,
      required, filters, topN, connectivity)
}

final case class FrameSlicesPartition(units: Array[FrameTokenSource.FrameUnit],
    locations: Array[String]) extends InputPartition {
  override def preferredLocations(): Array[String] = locations
}

class FrameTokenReaderFactory(hconf: SerializableHadoopConf,
    required: StructType, filters: Array[Filter],
    topN: Option[FrameTokenSource.TopNSpec]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new FrameTokenPartitionReader(
      partition.asInstanceOf[FrameSlicesPartition].units, hconf.value,
      required, filters, topN)
}

/** Decode → filter → bounded top-N → prune, all inside the reader: the
  * "server side" of the reference's architecture, executor-local.
  */
class FrameTokenPartitionReader(units: Seq[FrameTokenSource.FrameUnit],
    conf: Configuration, required: StructType, filters: Array[Filter],
    topN: Option[FrameTokenSource.TopNSpec])
    extends PartitionReader[InternalRow] {
  import FrameTokenSource._

  // streams opened by slice iterators; closed on exhaustion, and here as
  // a backstop when a pushed limit stops the reader mid-slice
  private val openStreams = mutable.ArrayBuffer.empty[AutoCloseable]

  private val projection: Array[(Long, InternalRow) => Any] =
    required.fields.map { f =>
      if (f.name == "frame_id") (id: Long, _: InternalRow) => id
      else {
        val ord = tokenOrdinal(f.name)
        val dt = f.dataType
        (_: Long, row: InternalRow) => if (row.isNullAt(ord)) null else row.get(ord, dt)
      }
    }

  private val iter: Iterator[InternalRow] = {
    val ser = ExpressionEncoder[TokenProfile]().createSerializer()
    val decoded = units.iterator
      .flatMap(u => FrameTokenSource.openFrames(u, conf, openStreams += _))
      .flatMap { case (frameId, ts, bytes) =>
        TokenExtractor.extractTokens(bytes, ts).iterator
          .map(t => (frameId, ser(t).copy()))
      }
    val filtered =
      if (filters.isEmpty) decoded
      else decoded.filter { case (id, row) => filters.forall(evalFilter(_, id, row)) }
    val bounded = topN match {
      case Some(TopNSpec(Nil, limit)) => filtered.take(limit)
      case Some(TopNSpec(keys, limit)) =>
        // Bounded selection: a max-heap of size `limit` under the pushed
        // ordering keeps the partition's top-N without sorting the rest.
        val ord = rowOrdering(keys)
        val heap = new java.util.PriorityQueue[(Long, InternalRow)](
          math.max(1, limit), ord.reverse)
        filtered.foreach { r =>
          heap.add(r)
          if (heap.size > limit) { heap.poll(); () }
        }
        val arr = heap.asScala.toArray.sorted(ord)
        arr.iterator
      case None => filtered
    }
    bounded.map { case (id, row) =>
      val out = new Array[Any](projection.length)
      var i = 0
      while (i < projection.length) { out(i) = projection(i)(id, row); i += 1 }
      new GenericInternalRow(out)
    }
  }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (iter.hasNext) { current = iter.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = {
    openStreams.foreach(s => scala.util.Try(s.close()))
    openStreams.clear()
  }
}

/** Offset = length of the (sorted) frame-file listing: each micro-batch
  * decodes the newly arrived files, the file-drop analog of the
  * reference's 5-second poll cycle.
  */
class FrameTokenMicroBatchStream(path: String, partitions: Int,
    maxSplitBytes: Long, hconf: SerializableHadoopConf,
    required: StructType, filters: Array[Filter],
    topN: Option[FrameTokenSource.TopNSpec],
    connectivity: ConnectivityConf = ConnectivityConf.Defaults)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  import FrameTokenSource._

  /** Per-stream governor (ST3/ST4): paces the listing polls at the
    * reference's request rate and retries transient listing failures
    * with jittered exponential backoff. One instance per stream — no
    * shared state across concurrent queries.
    */
  private val governor = new Connectivity.ConnectionGovernor(
    connectivity.rateLimit, connectivity.maxRetries, connectivity.backoffBase)

  private case class FilesOffset(n: Int) extends Offset {
    override def json(): String = s"""{"files":$n}"""
  }
  private val N = """\{"files":(\d+)\}""".r

  // SpoolLocks reader marker: the offset is a COUNT over the sorted
  // listing, so a compaction rewriting the spool under this stream
  // would silently duplicate/drop frames — the marker makes the
  // compactor refuse instead. Registered on first real poll (not at
  // planning-time construction, which Spark may discard), released in
  // stop(); acquisition itself refuses a spool mid-compaction.
  @volatile private var readerMarker: Path = null
  private def ensureMarker(): Unit =
    if (readerMarker == null) synchronized {
      if (readerMarker == null)
        readerMarker = SpoolLocks.acquireReader(path, "stream", hconf.value)
    }

  private def governedCount(): Int = {
    ensureMarker()
    governor.connect { _ =>
      scala.util.Try(listFrameFiles(path, hconf.value).length).toOption
    }.getOrElse(throw new IllegalStateException(
      s"frame listing failed after ${governor.maxRetries} attempts: $path"))
  }

  override def initialOffset(): Offset = FilesOffset(0)
  override def latestOffset(): Offset = FilesOffset(governedCount())

  // ---- Trigger.AvailableNow (backfill) support: pin the end offset at
  // query start so "process everything present, then stop" is exact —
  // files dropped AFTER the prepare call belong to the next run. Without
  // this Spark logs a fallback to one unbounded batch whose end moves
  // with the listing.
  private var availableNowCap: Option[Int] = None

  override def prepareForTriggerAvailableNow(): Unit = {
    availableNowCap = Some(governedCount())
  }

  override def getDefaultReadLimit: ReadLimit =
    connectivity.maxFilesPerTrigger match {
      case Some(m) => ReadLimit.maxFiles(m)
      case None => ReadLimit.allAvailable()
    }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val n = governedCount()
    val capped = availableNowCap.fold(n)(math.min(n, _))
    val admitted = limit match {
      // flow control: a huge backlog drains in bounded batches instead
      // of one giant catch-up batch (AvailableNow composes — Spark loops
      // batches until the pinned cap is reached)
      case l: org.apache.spark.sql.connector.read.streaming.ReadMaxFiles =>
        math.min(capped, start.asInstanceOf[FilesOffset].n + l.maxFiles())
      case _ => capped
    }
    FilesOffset(admitted)
  }

  override def reportLatestOffset(): Offset = FilesOffset(governedCount())
  override def deserializeOffset(json: String): Offset = json match {
    case N(n) => FilesOffset(n.toInt)
    case _ => throw new IllegalArgumentException(s"bad offset: $json")
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    ensureMarker()
    val s = start.asInstanceOf[FilesOffset].n
    val e = end.asInstanceOf[FilesOffset].n
    val files = listFrameFiles(path, hconf.value).slice(s, e)
    groupUnits(planSlices(files, maxSplitBytes), partitions)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FrameTokenReaderFactory(hconf, required, filters, topN)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = {
    val m = readerMarker
    if (m != null) { readerMarker = null; SpoolLocks.release(m, hconf.value) }
  }
}
