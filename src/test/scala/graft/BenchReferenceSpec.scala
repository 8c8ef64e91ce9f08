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

  /** The carrier-floor table (VERDICT r18 wrong #1) is a COMMITTED
    * artifact — BENCH_FLOORS.json — consumed by Bench's `body_suspect`
    * gate AND by this spec, not PLANS.md prose. This test pins: (a) the
    * file parses with every field the gate reads, so a corrupted table
    * can't silently disable the check (the ADVICE r18 false-clean class);
    * (b) every floor carrier is a declared query, so a renamed/retired
    * carrier can't make the gate quietly blind; (c) the PROMOTION
    * CRITERION itself — a committed reference claiming flag-clean
    * (contended=false, degraded=false, body_suspect=false) must actually
    * satisfy the floors it was promoted under. A reference that violates
    * a floor while claiming clean is a false-clean promotion and the
    * build says so. */
  test("BENCH_FLOORS.json parses, names declared queries, and the " +
    "committed reference honors it when claiming flag-clean") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val ff = new java.io.File("BENCH_FLOORS.json")
    assert(ff.exists, "no committed BENCH_FLOORS.json beside the build — " +
      "the body_suspect gate has no floors to read")
    val floors = mapper.readTree(ff)
    val sf = floors.get("sf")
    val thr = floors.get("threshold_ratio")
    val fl = floors.get("floors_sec")
    val rule = floors.get("update_rule")
    assert(sf != null && sf.isTextual, "floors: missing/non-text \"sf\"")
    assert(thr != null && thr.isNumber && thr.asDouble > 1.0,
      "floors: missing or nonsensical \"threshold_ratio\"")
    assert(rule != null && rule.isTextual && rule.asText.nonEmpty,
      "floors: the update rule must travel with the table")
    assert(fl != null && fl.isObject && fl.size > 0,
      "floors: missing/empty \"floors_sec\"")
    val carriers = {
      val it = fl.fieldNames()
      val b = Seq.newBuilder[String]
      while (it.hasNext) b += it.next()
      b.result()
    }
    carriers.foreach { c =>
      assert(SparkEntry.queries.contains(c),
        s"floor carrier $c is not a declared query — the gate is blind on it")
      assert(fl.get(c).isNumber && fl.get(c).asDouble > 0.0,
        s"floor for $c is not a positive number")
    }
    // r20: the jitter-band table (streaming-trigger family) rides the
    // same artifact and the same blindness checks — a band naming a
    // retired query, or a malformed [lo, hi], must fail the build too
    val bd = floors.get("bands_sec")
    assert(bd != null && bd.isObject && bd.size > 0,
      "floors: missing/empty \"bands_sec\" (the streaming-family gate)")
    val bandCarriers = {
      val it = bd.fieldNames()
      val b = Seq.newBuilder[String]
      while (it.hasNext) b += it.next()
      b.result()
    }
    bandCarriers.foreach { c =>
      assert(SparkEntry.queries.contains(c),
        s"band carrier $c is not a declared query — the gate is blind on it")
      val arr = bd.get(c)
      assert(arr.isArray && arr.size == 2 &&
          arr.get(0).isNumber && arr.get(1).isNumber &&
          arr.get(0).asDouble > 0.0 &&
          arr.get(0).asDouble < arr.get(1).asDouble,
        s"band for $c is not a positive [lo, hi] pair with lo < hi")
    }
    val df = new java.io.File("BENCH_DETAIL.json")
    assume(df.exists, "no committed bench reference beside the build")
    val detail = mapper.readTree(df)
    val sameSf = Option(detail.get("sf")).exists(_.asText == sf.asText)
    if (sameSf) {
      val acc = detail.get("accounting")
      def flag(k: String): Boolean =
        acc != null && Option(acc.get(k)).exists(_.asBoolean)
      val claimsClean =
        !flag("contended") && !flag("degraded") && !flag("body_suspect")
      if (claimsClean) {
        val qn = detail.get("queries")
        val over = carriers.flatMap { c =>
          Option(qn.get(c)).map(_.asDouble)
            .filter(_ > thr.asDouble * fl.get(c).asDouble)
            .map(v => f"$c=$v%.2f (floor ${fl.get(c).asDouble}%.2f)")
        } ++ bandCarriers.flatMap { c =>
          val hi = bd.get(c).get(1).asDouble
          Option(qn.get(c)).map(_.asDouble)
            .filter(_ > thr.asDouble * hi)
            .map(v => f"$c=$v%.2f (band hi $hi%.2f)")
        }
        assert(over.isEmpty,
          "committed reference claims flag-clean but violates its floors — " +
            s"a false-clean promotion: ${over.mkString(", ")}")
      }
    }
  }
}
