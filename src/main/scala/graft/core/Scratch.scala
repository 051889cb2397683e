package graft.core

/** Per-JVM scratch layouts for queries whose OPERATOR is a
  * written-then-read layout (the IVF inverted lists, the keyed version
  * source): the caller's returned DataFrame reads the path lazily, so
  * in-query deletion would break the harness's later materialization —
  * instead a JVM shutdown hook deletes the dir at exit, bounding the
  * accumulation at zero across runs (previously one leaked dir per
  * driver JVM). Paths are pid-suffixed so concurrent driver JVMs
  * (Bench + Verify in parallel) cannot clobber each other's layout
  * mid-scan.
  */
object Scratch {

  private val hooked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** A per-JVM scratch dir path under java.io.tmpdir, deleted at JVM
    * exit. Idempotent per path — repeated calls register one hook. */
  def perJvmDir(name: String): String = {
    val p = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft_${name}_${ProcessHandle.current().pid()}").toString
    if (hooked.add(p)) sys.addShutdownHook(deleteRec(p))
    p
  }

  /** Recursive best-effort delete (missing path is a no-op). The walk
    * stream is closed explicitly — callers outside the shutdown hook
    * (query glue deleting scratch state roots) must not leak a
    * directory handle until GC. */
  def deleteRec(root: String): Unit = {
    val p = java.nio.file.Paths.get(root)
    if (java.nio.file.Files.exists(p)) {
      val st = java.nio.file.Files.walk(p)
      try {
        val it = st
          .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .iterator()
        while (it.hasNext) java.nio.file.Files.deleteIfExists(it.next())
      } finally st.close()
    }
  }
}
