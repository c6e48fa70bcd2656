package graft

import java.nio.file.{Files, Path, Paths}

/** Scratch-space policy for run-lifetime temporaries (streaming
  * checkpoints, serving dirs, shuffle/block-manager files).
  *
  * Guide §2.1/§6: shuffle and state-store scratch is latency-bound
  * small-file I/O — put it on the fastest local device available. On
  * this harness box `/tmp` is a virtio ext4 disk whose per-file
  * create/sync latency (~50-100 ms under load) dominates every tiny
  * exchange and every micro-batch commit; `/dev/shm` is a 126 GiB
  * tmpfs. Measured (CacheMicro2): one-exchange query 335 ms → 244 ms,
  * two-exchange join 433 ms → 239 ms just from moving
  * `spark.local.dir` to tmpfs. On a production cluster the same knob
  * points at local NVMe (`spark.local.dir=/mnt/nvme*`), never a
  * network or OS disk — the policy is "fastest local device", tmpfs
  * merely being that device here.
  *
  * `SPARK_GRAFT_SCRATCH` overrides the root (set it to a disk path to
  * reproduce the old layout); otherwise `/dev/shm` is used when
  * writable, falling back to `java.io.tmpdir`.
  *
  * Everything created here is RUN-LIFETIME ONLY: a shutdown hook
  * deletes each dir this JVM created (tmpfs is RAM — leaks would
  * accumulate across bench runs). Persistent fixtures (staged inputs,
  * the d17 warehouse) deliberately do NOT live here.
  */
object Scratch {

  lazy val root: Path = {
    val base = sys.env.get("SPARK_GRAFT_SCRATCH")
      .orElse {
        val shm = Paths.get("/dev/shm")
        if (Files.isWritable(shm)) Some("/dev/shm/graft-scratch") else None
      }
      .getOrElse(sys.props("java.io.tmpdir"))
    val p = Paths.get(base)
    Files.createDirectories(p)
    p
  }

  private val created =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()

  private lazy val hook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      created.forEach { p =>
        try deleteRecursively(p) catch { case _: Throwable => () }
      }
    }, "graft-scratch-cleanup"))
  }

  /** A fresh unique scratch dir under [[root]], deleted on JVM exit —
    * the drop-in for `Files.createTempDirectory(prefix)` at every
    * run-lifetime call site (streaming checkpoints, serving dirs).
    */
  def tempDir(prefix: String): Path = {
    hook
    val p = Files.createTempDirectory(root, prefix)
    created.add(p)
    p
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      val s = Files.list(p)
      try s.forEach(deleteRecursively) finally s.close()
    }
    Files.deleteIfExists(p)
  }
}
