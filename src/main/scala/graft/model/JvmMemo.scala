package graft.model

/** Per-JVM memoization of an expensive pass keyed by fixture dir (the
  * "one shared streaming pass, many view queries" pattern the CDC-maintained
  * retrieval indexes use).
  *
  * `computeIfAbsent` only creates an inert HOLDER inside the map's bin
  * lock; the body itself evaluates outside it, synchronized per key on the
  * holder's own monitor — so first callers for DIFFERENT fixtures that hash
  * to the same bin no longer serialize behind one drain (ADVICE r11), while
  * concurrent first callers for the SAME fixture still run the pass once.
  * The holder runs its body AT MOST ONCE and memoizes the outcome — success
  * OR failure: a failed run fails every thread already blocked on the
  * holder with the ORIGINAL throwable (never re-evaluating the first
  * caller's closure, whose captured SparkSession may be stopped — the
  * retry-on-failure behavior of a Scala lazy val, ADVICE r12) and
  * UNINSTALLS itself, so any caller arriving (or retrying) after re-enters
  * computeIfAbsent with its own body.
  */
final class JvmMemo[V] {
  private final class Holder(body0: () => V) {
    private[this] var body: () => V = body0
    private[this] var result: Either[Throwable, V] = _
    def get(): V = synchronized {
      if (result == null) {
        result = try Right(body()) catch { case t: Throwable => Left(t) }
        // the closure (and everything it captured — SparkSession, fixture
        // dirs) is dead weight once the outcome is memoized: the memo maps
        // live for the JVM, the captured environment must not
        body = null
      }
      result.fold(t => throw t, identity)
    }
  }

  private val slots =
    new java.util.concurrent.ConcurrentHashMap[String, Holder]()

  def getOrRun(key: String)(body: => V): V = {
    val mk = new java.util.function.Function[String, Holder] {
      override def apply(k: String): Holder = new Holder(() => body)
    }
    val holder = slots.computeIfAbsent(key, mk)
    try holder.get()
    catch {
      case t: Throwable =>
        // remove only OUR holder (a racing successful re-install survives);
        // every waiter rethrows the memoized failure and lands here too —
        // the remove is idempotent on the holder's identity
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
