package graft

/** Spark local dir on tmpfs (/dev/shm): shuffle files, checkpoint blocks, and
  * disk spills live in RAM instead of the shared block device.
  *
  * This host is multi-tenant: thread dumps of slow runs show task threads
  * RUNNABLE inside BypassMergeSortShuffleWriter's FileChannel.transferTo
  * against the shared disk — identical jobs swing 20 s → 270 s purely on
  * neighbor IO load. The engine's local shuffles are tens of MB; backing them
  * with tmpfs removes the only disk dependency in the hot path. On a real
  * cluster the equivalent is fast local NVMe / ramdisk scratch per executor.
  *
  * Falls back to java.io.tmpdir when /dev/shm is unavailable. Reaps
  * directories left behind by dead JVMs (a kill -9 skips Spark's shutdown
  * hook, and tmpfs leaks are RAM leaks).
  */
object ShmLocalDir {

  def path(): String = {
    val base = new java.io.File("/dev/shm")
    if (!base.isDirectory || !base.canWrite)
      return System.getProperty("java.io.tmpdir")
    val mine = ProcessHandle.current().pid()
    Option(base.listFiles()).getOrElse(Array.empty[java.io.File]).foreach { f =>
      val name = f.getName
      if (f.isDirectory && name.startsWith("graft-spark-")) {
        val pid = name.stripPrefix("graft-spark-").toLongOption
        val dead = pid.exists { p =>
          if (p == mine) false
          else {
            val h = ProcessHandle.of(p)
            !(h.isPresent && h.get.isAlive)
          }
        }
        if (dead) delete(f)
      }
    }
    val dir = new java.io.File(base, s"graft-spark-$mine")
    dir.mkdirs()
    dir.getAbsolutePath
  }

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(delete)
    f.delete(): Unit
  }
}
