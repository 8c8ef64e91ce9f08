package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** The commit-once staging protocol: concurrent racers, stale dirs, and
  * reuse — the invariant is that a reader can only ever observe a fully
  * committed dir. */
class StagingSpec extends AnyFunSuite {

  private def tmpBase(): String =
    java.nio.file.Files.createTempDirectory("graft-staging-spec-").toString

  test("concurrent ensure calls commit exactly one complete staging") {
    val dir = tmpBase() + "/shared"
    val writes = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 4).map { i =>
      new Thread(() => {
        Staging.ensure(dir) { tmp =>
          writes.incrementAndGet()
          new java.io.File(tmp).mkdirs()
          // slow write: widen the race window
          Thread.sleep(50)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(tmp, "data.txt"), s"writer".getBytes("UTF-8"))
        }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    // whoever won, the committed dir is complete and marked
    assert(new java.io.File(dir, "_STAGED").exists())
    assert(new java.io.File(dir, "data.txt").exists())
    // and no temp dirs leak
    val leftovers = new java.io.File(dir).getParentFile.listFiles()
      .filter(_.getName.contains(".tmp-"))
    assert(leftovers.isEmpty, s"leaked temps: ${leftovers.mkString(",")}")
  }

  test("a stale unmarked dir is replaced, not trusted") {
    val dir = tmpBase() + "/stale"
    new java.io.File(dir).mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "old.txt"), "stale".getBytes("UTF-8"))
    Staging.ensure(dir) { tmp =>
      new java.io.File(tmp).mkdirs()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(tmp, "new.txt"), "fresh".getBytes("UTF-8"))
    }
    assert(new java.io.File(dir, "_STAGED").exists())
    assert(new java.io.File(dir, "new.txt").exists())
    assert(!new java.io.File(dir, "old.txt").exists(), "stale content survived")
  }

  test("a committed dir is reused without re-running the write") {
    val dir = tmpBase() + "/reuse"
    var calls = 0
    Staging.ensure(dir) { tmp => calls += 1; new java.io.File(tmp).mkdirs() }
    Staging.ensure(dir) { tmp => calls += 1; new java.io.File(tmp).mkdirs() }
    assert(calls === 1)
  }

  test("fingerprint changes when a source file's content metadata changes") {
    val base = tmpBase()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(base, "t.parquet"), "aa".getBytes("UTF-8"))
    val fp1 = Staging.fingerprint(base, Seq("t.parquet"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(base, "t.parquet"), "bbb".getBytes("UTF-8"))
    val fp2 = Staging.fingerprint(base, Seq("t.parquet"))
    assert(fp1 !== fp2)
    assert(fp1.matches("[0-9a-f]{12}") && fp2.matches("[0-9a-f]{12}"))
  }
}
