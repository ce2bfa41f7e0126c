package graft.sources

import java.io.{EOFException, FileNotFoundException, IOException}
import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, FileStatus, FileSystem, FileUtil, Path, PositionedReadable, Seekable}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** S3 / object-store connectivity (SURVEY.md §2.1 S11, S12).
  *
  * The engine is deliberately storage-scheme-agnostic: every reader and
  * sink addresses data through the Hadoop `FileSystem` API, so
  * `s3a://bucket/prefix` works exactly like a local path once an S3
  * `FileSystem` implementation is on the classpath. On a real deployment
  * that is the standard `hadoop-aws` + `aws-sdk-bundle` pair
  * (`fs.s3a.impl = org.apache.hadoop.fs.s3a.S3AFileSystem`); those jars
  * cannot be vendored HERE because this build environment is zero-egress
  * (no artifact resolution) and the jars ship neither with
  * `/opt/spark/jars` nor the coursier cache — verified by inventory. The
  * engine-side code path is instead proven by [[StubS3FileSystem]], a
  * local-disk object store registered as the handler for `s3a://` in
  * tests: writes, reads, the commit-protocol rename dance, folder upload
  * and read-filter-writeback all run through the same `FileSystem` calls
  * the real connector would serve.
  *
  * Reference behavior mirrored:
  *  - S11 `rough-drafts/upload_folder_to_s3.py:34-75` — upload every file
  *    of a local folder to a bucket, object key = file basename.
  *  - S12 `rough-drafts/s3_data_cleanup.py:57-178` — list a bucket's CSV
  *    objects, drop rows matching a predicate (`Host == node`), write the
  *    survivors back. The reference does this one object at a time through
  *    a temp dir on the driver box; the Spark form reads the whole prefix
  *    as ONE distributed scan, filters once, and commits the result back —
  *    at 100 TB the per-object loop is the difference between hours and a
  *    single job.
  */
object ObjectStore {

  /** Recommended session configuration for real S3A at scale — public
    * Hadoop/Spark tuning keys only. Callers supply credentials via the
    * standard provider chain (env/instance profile), never in code.
    * No-op on the stub: keys are read only by the real connector. */
  def configureS3a(spark: SparkSession): Unit = {
    val c = spark.sparkContext.hadoopConfiguration
    // directory-listing and rename emulation on S3 are O(objects); the
    // committers that matter at scale avoid rename entirely
    c.setIfUnset("fs.s3a.committer.name", "magic")
    c.setIfUnset("fs.s3a.connection.maximum", "96")
    c.setIfUnset("fs.s3a.fast.upload.buffer", "disk")
    c.setIfUnset("fs.s3a.multipart.size", "128M")
    c.setIfUnset("fs.s3a.threads.max", "64")
  }

  /** S11: copy every regular file directly under `localDir` into
    * `destUri` (e.g. `s3a://bucket/`), key = basename — the reference's
    * folder-upload step. Driver-side by design: this moves a handful of
    * already-written artifacts; bulk data takes `df.write.parquet(dest)`
    * straight to the store, never through a local staging folder. */
  def uploadFolder(spark: SparkSession, localDir: String, destUri: String): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new Path(localDir)
    val dst = new Path(destUri)
    val srcFs = src.getFileSystem(conf)
    val dstFs = dst.getFileSystem(conf)
    dstFs.mkdirs(dst)
    val files = srcFs.listStatus(src).filter(_.isFile)
    files.foreach { st =>
      FileUtil.copy(srcFs, st.getPath, dstFs, new Path(dst, st.getPath.getName),
        false /* keep source */, true /* overwrite */, conf)
    }
    files.length
  }

  /** S12: read every CSV object under `prefix`, drop rows POSITIVELY
    * matching `drop` (a NULL predicate — e.g. a missing Host cell — keeps
    * the row, matching the reference's `!= node` semantics), write the
    * survivors back under the same prefix. The rewrite goes to a sibling
    * `_graft_tmp` prefix first, and the swap renames the original aside to
    * `_graft_old` BEFORE the new data moves in, so the original bytes
    * exist on the store until the new prefix is fully in place
    * (write-validate-rename, S14, applied to the object store).
    *
    * Crash recovery (the swap is three non-atomic steps on s3a-style
    * stores), performed AT ENTRY like [[graft.Pipeline.compactDaily]] so a
    * plain re-run self-heals: `_graft_old` present with the live prefix
    * gone means the rename-aside completed (on copy-then-delete stores,
    * live only vanishes after every object was copied) → the original is
    * rolled back before reading; BOTH present is ambiguous on a
    * non-atomic-rename store (mid rename-aside, mid rename-in, or
    * pre-cleanup) → fail loudly naming both prefixes — every byte still
    * exists, and guessing is how data gets lost silently. `_graft_tmp`
    * alone is pre-swap residue and is simply overwritten by the new
    * write. Returns (rowsBefore, rowsAfter). */
  def readFilterWriteback(spark: SparkSession, prefix: String,
                          drop: Column): (Long, Long) = {
    import org.apache.spark.sql.functions.{coalesce, count, lit}
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(prefix)
    val fs = dir.getFileSystem(conf)
    val tmp = new Path(dir.getParent, dir.getName + "_graft_tmp")
    val old = new Path(dir.getParent, dir.getName + "_graft_old")

    if (fs.exists(old)) {
      if (!fs.exists(dir)) {
        if (!fs.rename(old, dir))
          throw new IOException(s"crash recovery failed: $old -> $dir")
      } else if (!fs.exists(tmp)) {
        // BOTH exist but tmp is fully gone: rename(tmp, dir) completed (on
        // copy-then-delete stores the source only vanishes after every
        // object landed), so `dir` IS the new data and the crash hit
        // between the swap and delete(old) — the benign completed-swap
        // state self-heals rather than demanding manual triage
        fs.delete(old, true)
      } else throw new IOException(
        s"ambiguous crashed writeback swap: $dir, $old AND $tmp all exist " +
          "(mid rename-aside or mid rename-in). No data is lost. Triage: " +
          s"if $dir is COMPLETE, delete BOTH staging prefixes; if it is " +
          s"incomplete, delete $dir AND $tmp, then re-run ($old rolls " +
          "back). Never delete the tmp prefix alone - recovery reads " +
          "tmp-gone as 'swap completed' and would drop the preserved " +
          "original against a partial live prefix.")
    }

    // both row counts ride the ONE write job as observe metrics — no
    // separate count scans (at object-store scale every extra pass is a
    // full re-read of the prefix)
    val obsIn = org.apache.spark.sql.Observation()
    val obsOut = org.apache.spark.sql.Observation()
    spark.read.option("header", "true").csv(prefix)
      .observe(obsIn, count(lit(1)).as("n"))
      .filter(!coalesce(drop, lit(false)))
      .observe(obsOut, count(lit(1)).as("n"))
      .write.mode("overwrite").option("header", "true").csv(tmp.toString)
    val nBefore = obsIn.get("n").asInstanceOf[Long]
    val nAfter = obsOut.get("n").asInstanceOf[Long]

    // entry-time recovery guarantees `old` does not exist here
    if (fs.exists(dir) && !fs.rename(dir, old))
      throw new IOException(s"writeback swap failed: $dir -> $old")
    if (!fs.rename(tmp, dir))
      throw new IOException(
        s"writeback swap failed: $tmp -> $dir (original preserved at $old)")
    fs.delete(old, true)
    (nBefore, nAfter)
  }
}

/** A Hadoop `FileSystem` that serves an object-store URI scheme from
  * local disk — the test double standing in for `S3AFileSystem` (which
  * cannot be vendored in this zero-egress build; see [[ObjectStore]]).
  * Register with
  * `spark.hadoop.fs.s3a.impl = graft.sources.StubS3FileSystem` and
  * optionally `fs.stubs3.root = /some/dir` (defaults to java.io.tmpdir).
  *
  * Object-store semantics are emulated where they differ from POSIX:
  * rename is non-atomic copy-then-delete (as s3a emulates it), append is
  * unsupported (as on S3). Anything the engine writes through this stub
  * therefore survives the same semantics a real object store imposes —
  * in particular the output-committer rename dance.
  */
class StubS3FileSystem extends FileSystem {

  private var myUri: URI = _
  private var bucketRoot: java.io.File = _
  private var workingDir: Path = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    myUri = URI.create(s"${name.getScheme}://${name.getAuthority}")
    val root = conf.get("fs.stubs3.root",
      sys.props("java.io.tmpdir") + "/graft-stubs3")
    bucketRoot = new java.io.File(root, name.getAuthority) // one dir per bucket
    bucketRoot.mkdirs()
    workingDir = new Path(myUri.toString + "/")
  }

  override def getScheme: String = "s3a"
  override def getUri: URI = myUri

  private def toLocal(p: Path): java.io.File = {
    val rel = p.toUri.getPath.stripPrefix("/")
    if (rel.isEmpty) bucketRoot else new java.io.File(bucketRoot, rel)
  }

  private def toPublic(f: java.io.File): Path = {
    val rel = bucketRoot.toURI.relativize(f.toURI).getPath.stripSuffix("/")
    new Path(myUri.toString + "/" + rel)
  }

  private def status(f: java.io.File): FileStatus =
    new FileStatus(if (f.isFile) f.length else 0, f.isDirectory, 1,
      32L * 1024 * 1024, f.lastModified, toPublic(f))

  override def getFileStatus(p: Path): FileStatus = {
    val f = toLocal(p)
    if (!f.exists) throw new FileNotFoundException(p.toString)
    status(f)
  }

  override def listStatus(p: Path): Array[FileStatus] = {
    val f = toLocal(p)
    if (!f.exists) throw new FileNotFoundException(p.toString)
    if (f.isFile) Array(status(f))
    else Option(f.listFiles()).getOrElse(Array.empty).map(status)
  }

  override def open(p: Path, bufferSize: Int): FSDataInputStream = {
    val f = toLocal(p)
    if (!f.isFile) throw new FileNotFoundException(p.toString)
    new FSDataInputStream(new StubS3FileSystem.SeekableFileInput(f))
  }

  override def create(p: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    val f = toLocal(p)
    if (f.exists && !overwrite) throw new IOException(s"already exists: $p")
    f.getParentFile.mkdirs()
    new FSDataOutputStream(
      new java.io.BufferedOutputStream(new java.io.FileOutputStream(f)), statistics)
  }

  override def append(p: Path, bufferSize: Int,
                      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("append is not supported on object stores")

  /** Non-atomic copy-then-delete, exactly how s3a emulates rename — the
    * commit protocol must work WITHOUT relying on atomicity. */
  override def rename(src: Path, dst: Path): Boolean = {
    val s = toLocal(src)
    if (!s.exists) return false
    val dRaw = toLocal(dst)
    // Hadoop rename contract: renaming into an existing DIRECTORY moves
    // the source inside it
    val d = if (dRaw.isDirectory) new java.io.File(dRaw, s.getName) else dRaw
    if (d.exists) return false
    d.getParentFile.mkdirs()
    copyRec(s, d)
    deleteRec(s)
    true
  }

  private def copyRec(s: java.io.File, d: java.io.File): Unit =
    if (s.isDirectory) {
      d.mkdirs()
      Option(s.listFiles()).getOrElse(Array.empty)
        .foreach(c => copyRec(c, new java.io.File(d, c.getName)))
    } else {
      java.nio.file.Files.copy(s.toPath, d.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }

  private def deleteRec(f: java.io.File): Boolean = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
    f.delete()
  }

  override def delete(p: Path, recursive: Boolean): Boolean = {
    val f = toLocal(p)
    if (!f.exists) false
    else if (f.isDirectory && !recursive &&
      Option(f.listFiles()).exists(_.nonEmpty))
      throw new IOException(s"directory not empty: $p")
    else deleteRec(f)
  }

  override def mkdirs(p: Path, permission: FsPermission): Boolean = {
    val f = toLocal(p)
    f.mkdirs() || f.isDirectory
  }

  override def setWorkingDirectory(d: Path): Unit = workingDir = d
  override def getWorkingDirectory: Path = workingDir
}

object StubS3FileSystem {

  /** Seekable + positioned-readable local file stream — the contract
    * `FSDataInputStream` requires of its wrapped stream (parquet footers
    * are read by position). */
  private class SeekableFileInput(f: java.io.File) extends java.io.InputStream
      with Seekable with PositionedReadable {
    private val raf = new java.io.RandomAccessFile(f, "r")

    override def read(): Int = raf.read()
    override def read(b: Array[Byte], off: Int, len: Int): Int = raf.read(b, off, len)
    override def seek(pos: Long): Unit = raf.seek(pos)
    override def getPos: Long = raf.getFilePointer
    override def seekToNewSource(targetPos: Long): Boolean = false

    override def read(position: Long, buffer: Array[Byte], offset: Int,
                      length: Int): Int = {
      val cur = raf.getFilePointer
      try { raf.seek(position); raf.read(buffer, offset, length) }
      finally raf.seek(cur)
    }

    override def readFully(position: Long, buffer: Array[Byte], offset: Int,
                           length: Int): Unit = {
      var done = 0
      while (done < length) {
        val n = read(position + done, buffer, offset + done, length - done)
        if (n < 0) throw new EOFException(s"EOF at ${position + done} in $f")
        done += n
      }
    }

    override def readFully(position: Long, buffer: Array[Byte]): Unit =
      readFully(position, buffer, 0, buffer.length)

    override def close(): Unit = raf.close()
  }
}
