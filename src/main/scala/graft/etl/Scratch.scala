package graft.etl

/** Temp-directory factory for the keys that materialize a scratch lake
  * (k24/k25/k26/k27/d28, a66's silver, s9's ORC round trip, the v39
  * index): every directory is registered for recursive deletion at JVM
  * exit, so repeated Verify/Bench sessions don't leak a lake copy under
  * /tmp per run. Deletion at exit (not eagerly) because the relations
  * the keys return keep reading the files until the session ends, and
  * specs assert against the physical layout after the query returns. */
object Scratch {

  def tempDir(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft-$tag")
    deleteOnExit(p)
    p.toString
  }

  /** Register `p` for recursive deletion when the JVM exits. */
  def deleteOnExit(p: java.nio.file.Path): Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(p.toFile)
    }))
}
