package graft.util

import java.nio.file.{Files, Path}

/** Process-scoped scratch directories: created like
  * `Files.createTempDirectory` but swept by a single JVM shutdown hook,
  * so repeated gate/bench runs don't accumulate staged parquet,
  * roundtrip sinks, and checkpoints in java.io.tmpdir — the round-4
  * advisor flagged the x09 variant of this leak, and every staged
  * streaming input is the same class. Deletion is best-effort: a
  * SIGKILL still leaks, and the hook swallows per-file errors (a dir
  * may already be partly gone). Dirs live until JVM exit, so
  * within-run reuse (e.g. the kill-and-recover checkpoint) is safe. */
object Scratch {
  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[Path]()
  private val armed = new java.util.concurrent.atomic.AtomicBoolean()

  def dir(prefix: String): String = register(Files.createTempDirectory(prefix))

  /** variant for an explicit parent (e.g. /dev/shm checkpoints) */
  def dirUnder(base: Path, prefix: String): String =
    register(Files.createTempDirectory(base, prefix))

  /** tmpfs-backed scratch for EPHEMERAL streaming scaffolding —
    * micro-batch checkpoints (offset WAL / commit log / state deltas,
    * fsynced per batch) and staged stream inputs of the gated
    * queries. These are drained and discarded within one query; on
    * the bench box java.io.tmpdir is ext4, so every per-batch fsync
    * rides the host's disk — measured 4-8× wall-time swings on the
    * stream-stream joins under host disk contention (round-18 optim;
    * the latency metric already checkpointed to /dev/shm for the same
    * reason). Table data, sink outputs, and the throughput/recovery
    * bench checkpoints stay on real disk — their I/O is the thing
    * being measured. Falls back to the default tmpdir when no
    * writable /dev/shm exists. */
  def shmDir(prefix: String): String = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (Files.isWritable(shm)) dirUnder(shm, prefix) else dir(prefix)
  }

  /** best-effort immediate recursive delete (also what the exit hook
    * runs per registered dir) */
  def deleteTree(d: Path): Unit =
    try if (Files.exists(d)) {
      val walk = Files.walk(d)
      try walk.sorted(java.util.Comparator.reverseOrder()).forEach { p =>
        try Files.deleteIfExists(p) catch { case _: Throwable => () }
      } finally walk.close()
    } catch { case _: Throwable => () }

  /** enroll a pre-named path (e.g. the pid-keyed x09 scratch db) in the
    * exit sweep */
  def register(p: Path): String = {
    dirs.add(p)
    if (armed.compareAndSet(false, true))
      Runtime.getRuntime.addShutdownHook(new Thread(() => sweep()))
    p.toString
  }

  private def sweep(): Unit = dirs.forEach(deleteTree)
}
