package graft.engine

/** Shared once-per-JVM work-directory materialization: one sanitizer and
  * one memoize map instead of a copy per module (Gold layers, the
  * incremental demo, CSV staging, the streaming source dir all use it).
  */
object Workdirs {

  private val done = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Filesystem-safe key for an sfDir. */
  def key(sfDir: String): String =
    sfDir.replaceAll("[^A-Za-z0-9.]+", "_").dropWhile(_ == '_')

  /** Run `build` at most once per (JVM, kind, sfDir); returns the
    * work dir under `target/<kind>/<key>`.
    */
  def materializeOnce(kind: String, sfDir: String)(build: String => Unit): String =
    done.computeIfAbsent(s"$kind|$sfDir", _ => {
      val dir = new java.io.File(s"target/$kind/${key(sfDir)}").getAbsolutePath
      build(dir)
      dir
    })

  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }
}
