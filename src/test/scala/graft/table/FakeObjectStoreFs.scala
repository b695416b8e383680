package graft.table

import java.net.URI

import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** A local-backed filesystem that models an OBJECT STORE's semantics
  * (registered under the `fakeobj://` scheme by CommitArbiterSpec):
  *
  *  - `rename` onto an EXISTING destination directory "succeeds" by
  *    moving the source INSIDE it (the HDFS-style fallback s3a and
  *    the Hadoop local connector both emulate — RawLocalFileSystem's
  *    native behavior, kept deliberately): two writers racing a
  *    version slot through rename BOTH return true, and the loser's
  *    manifest lands as nested garbage — rename is NOT a usable
  *    commit CAS here, exactly the round-12 proven local-connector
  *    hazard;
  *  - `create(overwrite = false)` is a CONDITIONAL PUT with S3's two
  *    defining properties: the if-absent check is ATOMIC (a JVM-global
  *    lock — store-side serialization), and visibility is WHOLE-OBJECT
  *    (bytes buffer until close; the object materializes atomically,
  *    so a concurrent reader sees the complete manifest or no file,
  *    never a half-written one). This is the primitive
  *    [[CommitArbiter.ConditionalPut]] builds on.
  *
  * Everything else behaves like the local filesystem, so Spark can
  * write parquet through it unmodified. */
class FakeObjectStoreFs extends RawLocalFileSystem {
  override def getScheme: String = "fakeobj"
  override def getUri: URI = URI.create("fakeobj:///")

  /** conditional PUT: buffer the object; the absent-check and the
    * materialization happen together at close, atomically — as a
    * real If-None-Match PUT resolves at request completion */
  private def conditionalPut(f: Path): FSDataOutputStream = {
    val target = pathToFile(f)
    val buf = new java.io.ByteArrayOutputStream() {
      override def close(): Unit = FakeObjectStoreFs.putLock.synchronized {
        if (target.exists())
          throw new org.apache.hadoop.fs.FileAlreadyExistsException(
            s"conditional put lost: $f exists")
        target.getParentFile.mkdirs()
        val tmp = java.io.File.createTempFile(
          ".fakeobj-put", ".tmp", target.getParentFile)
        java.nio.file.Files.write(tmp.toPath, toByteArray)
        // whole-object visibility: readers see all bytes or no file
        java.nio.file.Files.move(tmp.toPath, target.toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
    }
    new FSDataOutputStream(buf, null)
  }

  override def create(f: Path, permission: FsPermission,
                      overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream =
    if (overwrite)
      super.create(f, permission, true, bufferSize, replication,
        blockSize, progress)
    else conditionalPut(f)

  /** `FileSystem.create(path, overwrite)` funnels through THIS
    * signature (RawLocalFileSystem overrides it past the FsPermission
    * variant above) — without this override the conditional put
    * silently degraded to RawLocal's check-then-create, a TOCTOU the
    * 6-writer race duly caught: two racers both passed the exists
    * check, wrote the same slot file (the corrupt "1AR1" parquet
    * tail), and one commit was lost (head 6 of 7). Every no-overwrite
    * create on this scheme must be store-side atomic. */
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream =
    if (overwrite)
      super.create(f, overwrite, bufferSize, replication, blockSize,
        progress)
    else conditionalPut(f)

  /** the store ADVERTISES its conditional-create primitive, the way a
    * conditional-write-enabled s3a does (HADOOP-19256) — what
    * `setCommitArbiter("cput")`'s capability probe (round-14 advisor)
    * checks before accepting the protocol on a non-local scheme */
  override def hasPathCapability(path: Path, capability: String): Boolean =
    if (TableIO.ConditionalCreateCapabilities.contains(capability)) true
    else super.hasPathCapability(path, capability)

  override def createNonRecursive(f: Path, permission: FsPermission,
                                  overwrite: Boolean, bufferSize: Int,
                                  replication: Short, blockSize: Long,
                                  progress: Progressable): FSDataOutputStream =
    if (overwrite)
      super.createNonRecursive(f, permission, true, bufferSize,
        replication, blockSize, progress)
    else conditionalPut(f)
}

object FakeObjectStoreFs {
  /** serializes conditional puts across the JVM's racing writers —
    * the store-side atomicity S3's conditional PUT provides */
  val putLock = new Object
}

/** a store that does NOT advertise conditional create (a stock s3a
  * below Hadoop 3.4.1, or one with conditional writes disabled) —
  * `setCommitArbiter("cput")`'s probe must refuse it loudly */
class NonAdvertisingStoreFs extends RawLocalFileSystem {
  override def getScheme: String = "dumbobj"
  override def getUri: URI = URI.create("dumbobj:///")
}

/** an HDFS-like store where `create` makes the path VISIBLE before
  * close and the byte stream then dies mid-write — the round-14
  * advisor's torn-slot case: the old createExclusive mapped the
  * failure to "lost race" because the (partial) target existed,
  * leaving a corrupt slot every reader would fold */
class TornWriteStoreFs extends RawLocalFileSystem {
  override def getScheme: String = "tornwrite"
  override def getUri: URI = URI.create("tornwrite:///")

  private def torn(f: Path, real: FSDataOutputStream): FSDataOutputStream =
    new FSDataOutputStream(new java.io.OutputStream {
      override def write(b: Int): Unit = real.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit = {
        // a few bytes land (the path is already visible), then the
        // connection dies
        real.write(b, off, math.min(len, 4))
        real.close()
        throw new java.io.IOException(s"simulated mid-write failure: $f")
      }
      override def close(): Unit = ()
    }, null)

  override def create(f: Path, permission: FsPermission,
                      overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    val real = super.create(f, permission, overwrite, bufferSize,
      replication, blockSize, progress)
    if (overwrite) real else torn(f, real)
  }

  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    val real = super.create(f, overwrite, bufferSize, replication,
      blockSize, progress)
    if (overwrite) real else torn(f, real)
  }
}

/** an HDFS-like store where the no-overwrite create's bytes ALL land
  * but `close()` then throws (a connection reset after the last
  * packet) — the round-14 verdict's own-complete-slot case: the old
  * handler saw a complete object at the slot and conceded "the other
  * writer's win", so a txn-less retrier would commit its rows TWICE.
  * The fixed handler compares the slot's bytes to ours and reports
  * the win. Advertises conditional create so `setCommitArbiter
  * ("cput")` accepts the scheme. */
class CloseFailStoreFs extends RawLocalFileSystem {
  override def getScheme: String = "closefail"
  override def getUri: URI = URI.create("closefail:///")

  /** fail only COMMIT-SLOT creates (`v<N>` under commits/) — parquet's
    * own data-file writes also open with overwrite = false, and the
    * scenario under test is the publish PUT, not the data upload */
  private def isSlot(f: Path): Boolean = f.getName.matches("v\\d+")

  private def closeFail(f: Path,
                        real: FSDataOutputStream): FSDataOutputStream =
    new FSDataOutputStream(new java.io.OutputStream {
      override def write(b: Int): Unit = real.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        real.write(b, off, len)
      override def close(): Unit = {
        real.close() // every byte is durably at the slot...
        throw new java.io.IOException(s"simulated close failure: $f")
      }
    }, null)

  override def create(f: Path, permission: FsPermission,
                      overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    val real = super.create(f, permission, overwrite, bufferSize,
      replication, blockSize, progress)
    if (overwrite || !isSlot(f)) real else closeFail(f, real)
  }

  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    val real = super.create(f, overwrite, bufferSize, replication,
      blockSize, progress)
    if (overwrite || !isSlot(f)) real else closeFail(f, real)
  }

  override def hasPathCapability(path: Path, capability: String): Boolean =
    if (TableIO.ConditionalCreateCapabilities.contains(capability)) true
    else super.hasPathCapability(path, capability)
}

/** a store under THROTTLING: the no-overwrite create (the conditional
  * PUT) fails with a generic IOException, and — while
  * [[ThrottledStoreFs.failReads]] is set — so does every `open` (the
  * GET the completeness probe issues). PUT and GET failures correlate
  * under exactly the object-store conditions the cput protocol
  * targets; the round-15 advisor's case is a RACING WRITER'S
  * COMMITTED manifest already at the slot: the old probe swallowed
  * its own read failure as "torn" and DELETED the winner's
  * acknowledged commit. The fixed handler rethrows without touching
  * an unreadable slot. */
class ThrottledStoreFs extends RawLocalFileSystem {
  override def getScheme: String = "throttled"
  override def getUri: URI = URI.create("throttled:///")

  private def throttle(f: Path): Nothing =
    throw new java.io.IOException(s"simulated PUT throttle: $f")

  override def create(f: Path, permission: FsPermission,
                      overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream =
    if (overwrite)
      super.create(f, permission, true, bufferSize, replication,
        blockSize, progress)
    else throttle(f)

  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream =
    if (overwrite)
      super.create(f, overwrite, bufferSize, replication, blockSize,
        progress)
    else throttle(f)

  override def open(f: Path, bufferSize: Int)
      : org.apache.hadoop.fs.FSDataInputStream =
    if (ThrottledStoreFs.failReads.get())
      throw new java.io.IOException(s"simulated GET throttle: $f")
    else super.open(f, bufferSize)
}

object ThrottledStoreFs {
  /** toggled by the spec: true = GETs fail too (correlated throttling) */
  val failReads = new java.util.concurrent.atomic.AtomicBoolean(false)
}

/** a visible-create store whose no-overwrite create makes the path
  * visible as an EMPTY object and then throws a generic IOException —
  * the round-15 advisor's create-time case: the old handler's
  * `if (exists(p)) return false` reported OUR abandoned empty object
  * as "another writer's slot", leaving it to be folded by every
  * reader. The fixed handler reads the slot, sees no `PAR1` tail,
  * deletes our partial, and rethrows. */
class CreateFailStoreFs extends RawLocalFileSystem {
  override def getScheme: String = "createfail"
  override def getUri: URI = URI.create("createfail:///")

  private def visibleThenFail(f: Path, real: FSDataOutputStream): Nothing = {
    real.close() // the empty object is now visible at the path
    throw new java.io.IOException(s"simulated create failure: $f")
  }

  override def create(f: Path, permission: FsPermission,
                      overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    val real = super.create(f, permission, overwrite, bufferSize,
      replication, blockSize, progress)
    if (overwrite) real else visibleThenFail(f, real)
  }

  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    val real = super.create(f, overwrite, bufferSize, replication,
      blockSize, progress)
    if (overwrite) real else visibleThenFail(f, real)
  }
}
