package graft

import org.scalatest.funsuite.AnyFunSuite

/** The committed bench reference must match HEAD's query set — the
  * MECHANICAL check for VERDICT r16 wrong #1 (the r16 reference predated
  * two queries and carried pre-clone numbers; the round table disclosed
  * it, but nothing enforced it). A bench run rewrites repo-root
  * BENCH_DETAIL.json from `SparkEntry.queries` itself, so this failing
  * means exactly one thing: queries changed since the committed
  * reference was measured — re-run the bench and promote a fresh one. */
class BenchReferenceSpec extends AnyFunSuite {
  test("the committed BENCH_DETAIL.json covers exactly HEAD's query set") {
    val f = new java.io.File("BENCH_DETAIL.json")
    assume(f.exists, "no committed bench reference beside the build")
    // explicit UTF-8: the artifact may carry non-ASCII accounting notes
    // and the forked JVM's default charset is not guaranteed
    val txt = new String(java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
    val qObj = txt.substring(txt.indexOf("\"queries\":{"))
    val named = "\"([A-Za-z0-9_]+)\":".r.findAllMatchIn(qObj)
      .map(_.group(1)).toSet - "queries"
    val head = SparkEntry.queries.keySet
    val missing = (head -- named).toSeq.sorted
    val stale = (named -- head).toSeq.sorted
    assert(missing.isEmpty && stale.isEmpty,
      s"bench reference stale vs HEAD — unbenched: ${missing.mkString(", ")};" +
        s" no-longer-declared: ${stale.mkString(", ")}")
  }
}
