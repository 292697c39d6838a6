package graft.util

import java.nio.file.{Files, Path}

/** Tracked temp directories (source round-trip scratch, streaming
  * checkpoints): every dir created here is recursively deleted when the
  * JVM exits, so repeated Verify/Bench invocations don't accumulate
  * unbounded copies under /tmp. Thread-safe — the driver runs queries
  * concurrently.
  */
object Scratch {

  private val dirs = scala.collection.mutable.ArrayBuffer[Path]()
  @volatile private var hooked = false

  /** Fresh temp dir, registered for deletion at JVM exit. */
  def dir(tag: String): String = synchronized {
    if (!hooked) {
      Runtime.getRuntime.addShutdownHook(new Thread(() => deleteAll()))
      hooked = true
    }
    val p = Files.createTempDirectory(s"graft_$tag")
    dirs += p
    p.toString
  }

  /** Delete everything created so far (also runs at JVM exit). */
  def deleteAll(): Unit = synchronized {
    dirs.foreach(p => delete(p.toFile))
    dirs.clear()
  }

  private def delete(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(delete)
    f.delete(); ()
  }
}
