package graft.core

/** Per-JVM scratch directories for queries that must write as a side
  * effect (sink round-trips, the persisted IVF index). One UUID base
  * per JVM keeps concurrent harness runs on one machine disjoint; a
  * shutdown hook removes the whole base recursively, so bench/verify
  * JVMs don't strand corpus-sized directories in tmp (every oracle
  * that checks these queries recomputes relationally or reads a
  * committed golden — nothing reads the scratch after JVM exit).
  */
object Scratch {

  private lazy val base: java.io.File = {
    val d = new java.io.File(
      System.getProperty("java.io.tmpdir"),
      s"graft_run_${java.util.UUID.randomUUID().toString.take(8)}")
    d.mkdirs()
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRec(d)))
    d
  }

  private def deleteRec(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRec)
    f.delete(): Unit
  }

  /** Absolute path of a per-JVM scratch subdirectory. */
  def dir(name: String): String = {
    val d = new java.io.File(base, name)
    d.mkdirs()
    d.getAbsolutePath
  }
}
