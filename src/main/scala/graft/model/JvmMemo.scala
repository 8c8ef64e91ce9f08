package graft.model

/** Per-JVM memoization of an expensive pass keyed by fixture dir (the
  * "one shared streaming pass, many view queries" pattern the CDC-maintained
  * retrieval indexes use).
  *
  * `computeIfAbsent` only creates a lazy HOLDER inside the map's bin lock;
  * the body itself evaluates outside it, synchronized per key on the
  * holder's own monitor — so first callers for DIFFERENT fixtures that hash
  * to the same bin no longer serialize behind one drain (ADVICE r11), while
  * concurrent first callers for the SAME fixture still run the pass once.
  * A body that throws UNINSTALLS its holder: the next caller runs its OWN
  * body — a lazy val would otherwise re-evaluate the FIRST caller's closure
  * forever, pinning its captured SparkSession (possibly stopped by the time
  * a later suite retries) for the JVM's life.
  */
final class JvmMemo[V] {
  private val slots =
    new java.util.concurrent.ConcurrentHashMap[String, () => V]()

  def getOrRun(key: String)(body: => V): V = {
    val mk = new java.util.function.Function[String, () => V] {
      override def apply(k: String): () => V = { lazy val v = body; () => v }
    }
    val holder = slots.computeIfAbsent(key, mk)
    try holder()
    catch {
      case t: Throwable =>
        // remove only OUR holder (a racing successful re-install survives);
        // a thread concurrently succeeding on this same holder still gets
        // its value — the next first-caller just re-runs the pass
        slots.remove(key, holder)
        throw t
    }
  }
}

/** Registry of per-JVM temp working dirs (state/checkpoint trees under
  * /tmp) deleted on JVM exit — long-lived JVMs (sbt test, the bench) would
  * otherwise accrete one abandoned tree per (pass, fixture) forever
  * (ADVICE r11). Deletion is best-effort: a dir busy at exit is left for
  * the OS tmp reaper. */
object TempDirs {
  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      dirs.forEach { d =>
        try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
        catch { case _: Throwable => () }
      }, "graft-tempdir-cleanup"))

  /** Register `path` for recursive deletion at JVM exit; returns it. */
  def deleteOnExit(path: String): String = {
    hookInstalled
    dirs.add(path)
    path
  }
}
