package graft.util

/** Shared temp-directory lifecycle: one root per purpose, removed
  * recursively on JVM exit. Replaces the per-caller copies of the
  * createTempDirectory + recursive-delete + shutdown-hook idiom.
  */
object Tmp {

  /** A temp root whose whole tree is deleted when the JVM exits. */
  def root(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => rm(p.toFile)))
    p
  }

  def rm(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(rm))
    f.delete(); ()
  }
}
