package graft.model

/** Commit-once staging of derived fixture data under /tmp, shared by every
  * component that caches an expensive derivation across runs and JVMs
  * (changelog envelopes, late-data replay files, bucketed tables).
  *
  * Protocol: the final dir name embeds a CONTENT fingerprint of the source
  * fixture files, so changed fixtures can never reuse a stale staging; the
  * payload is written to a private temp dir and committed with ONE atomic
  * rename, so concurrent JVMs race safely (the loser discards its temp and
  * adopts the winner's dir) and a reader can never observe a half-written
  * staging. The `_STAGED` marker is created before the rename — its
  * presence inside the committed dir is the reuse gate (underscore-prefixed
  * files are invisible to every Spark reader).
  */
object Staging {

  /** Nanoseconds spent actually REBUILDING stagings in this JVM (reuse
    * hits add nothing). The bench samples the delta around each query so a
    * cold-cache first run's one-time staging cost is attributable to the
    * query that paid it, per query, not per run. Atomic: maintainer pool
    * threads may stage concurrently with the driver. Only the OUTERMOST
    * [[ensure]] on a thread adds its span — a staged model built from
    * other staged artifacts (IVF-PQ stages codes from the PQ model and the
    * cell assignment, each itself staged) would otherwise double-count
    * every inner rebuild inside the outer span. */
  val rebuildNanos = new java.util.concurrent.atomic.AtomicLong(0L)

  private val ensureDepth = new ThreadLocal[Integer] {
    override def initialValue(): Integer = 0
  }

  /** Fingerprint of source fixture files: name/size/mtime, 12 hex chars. */
  def fingerprint(sfDir: String, sources: Seq[String]): String = {
    val sig = sources.sorted.map { n =>
      val f = new java.io.File(sfDir, n)
      s"$n:${f.length}:${f.lastModified}"
    }.mkString("|")
    java.security.MessageDigest.getInstance("MD5")
      .digest(sig.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
  }

  /** Write `df` as ONE parquet file `dir/name.parquet` with a forced mtime
    * — the building block of mtime-ordered replay stagings: the file stream
    * source orders files by (modification time, path), so forced mtimes fix
    * the micro-batch replay order, and [[ensure]]'s whole-dir rename
    * preserves them. */
  def stageOrderedFile(df: org.apache.spark.sql.DataFrame, dir: String,
                       name: String, mtime: Long): Unit = {
    val part = s"$dir/.write-$name"
    df.coalesce(1).write.parquet(part)
    val file = new java.io.File(part).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    val dst = new java.io.File(s"$dir/$name.parquet")
    assert(file.renameTo(dst), s"stage failed: $name")
    dst.setLastModified(mtime)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(part))
  }

  /** Write `df` (a single string column) as ONE text file `dir/name.json` —
    * the name-ordered building block for JSON-envelope replay stagings: the
    * DSv2 changelog source admits fresh files sorted by path, so
    * lexicographic names fix the micro-batch order. */
  def stageNamedTextFile(df: org.apache.spark.sql.DataFrame, dir: String,
                         name: String): Unit = {
    val part = s"$dir/.write-$name"
    df.coalesce(1).write.text(part)
    val file = new java.io.File(part).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".txt")).get
    val dst = new java.io.File(s"$dir/$name.json")
    assert(file.renameTo(dst), s"stage failed: $name")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(part))
  }

  /** Ensure `dir` is staged: reuse a committed dir, else run `write` into a
    * temp sibling and atomically promote it. A dir present WITHOUT the
    * marker is a stale artifact (older protocol, or a crash before its
    * rename became visible) — it is replaced, not trusted. Returns `dir`. */
  def ensure(dir: String)(write: String => Unit): String = {
    val dirFile = new java.io.File(dir)
    if (new java.io.File(dir, "_STAGED").exists()) return dir
    val t0 = System.nanoTime()
    val tmp = dir + ".tmp-" + java.util.UUID.randomUUID().toString.take(8)
    val tmpFile = new java.io.File(tmp)
    ensureDepth.set(ensureDepth.get + 1)
    try write(tmp)
    finally {
      ensureDepth.set(ensureDepth.get - 1)
      if (ensureDepth.get == 0)
        rebuildNanos.addAndGet(System.nanoTime() - t0)
    }
    new java.io.File(tmp, "_STAGED").createNewFile()
    if (!tmpFile.renameTo(dirFile)) {
      if (new java.io.File(dir, "_STAGED").exists()) {
        // lost the race to a committed winner: adopt theirs
        org.apache.commons.io.FileUtils.deleteDirectory(tmpFile)
      } else {
        // stale unmarked dir blocks the rename: replace it
        org.apache.commons.io.FileUtils.deleteDirectory(dirFile)
        if (!tmpFile.renameTo(dirFile)) {
          org.apache.commons.io.FileUtils.deleteDirectory(tmpFile)
          if (!new java.io.File(dir, "_STAGED").exists())
            throw new IllegalStateException(s"staging commit failed for $dir")
        }
      }
    }
    dir
  }
}
