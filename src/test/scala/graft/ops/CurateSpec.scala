package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.model.Tables

class CurateSpec extends AnyFunSuite with SparkSpec {

  test("hash split fractions cover every document exactly once") {
    val total = Tables.documents(spark, sfDir).count()
    val bySplit = Curate.qTrainTestSplit(spark, sfDir).collect()
      .groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(bySplit.values.sum === total)
    assert(bySplit.keySet === Set("train", "val", "test"))
    // 80/10/10 within tolerance on the fixture
    assert(bySplit("train").toDouble / total > 0.6)
  }

  test("hash sample is deterministic and bucket-bounded") {
    val a = Curate.qSampleHash(spark, sfDir).collect()
    val b = Curate.qSampleHash(spark, sfDir).collect()
    assert(a.map(_.toSeq).sameElements(b.map(_.toSeq)))
    assert(a.forall(r => r.getLong(2) >= 0 && r.getLong(2) < 10))
  }

  test("quality filter output satisfies every gate") {
    val out = Curate.qQualityFilter(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(2) >= 30 && r.getLong(3) >= 2))
  }

  test("mix weights: shares sum to 1, weights invert the shares, allocs capped") {
    val rows = Curate.qMixWeights(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val n = rows.length
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-4)
    rows.foreach { r =>
      // weight = target_share / actual_share, so weight * share * n == 1
      assert(math.abs(r.getDouble(4) * r.getDouble(3) * n - 1.0) < 1e-4)
      assert(r.getLong(5) <= r.getLong(2), "allocation exceeds the source's tokens")
      assert(r.getLong(5) <= 10000L / n)
    }
  }

  test("budget sample: per-source prefixes fit the allocation, maximal, hash-stable") {
    val rows = Curate.qBudgetSample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val nSources = graft.model.Tables.documents(spark, sfDir)
      .select("source").distinct().count()
    val alloc = 10000L / nSources
    val bySrc = rows.groupBy(_._2)
    bySrc.foreach { case (src, rs) =>
      // cum_tokens is the running sum in selection order and fits the budget
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(_._3).scanLeft(0L)(_ + _).tail.sameElements(sorted.map(_._4)), src)
      assert(sorted.last._4 <= alloc, src)
    }
    // maximality: re-deriving the greedy prefix from the raw table keeps
    // exactly the same docs (nothing that fits was left out)
    val docs = graft.model.Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "source", "cast(size(split(text, ' ')) as long) n",
        "md5(cast(doc_id as string)) h")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    docs.groupBy(_._2).foreach { case (src, ds) =>
      var cum = 0L
      val expect = ds.sortBy(d => (d._4, d._1)).takeWhile { d =>
        cum += d._3; cum <= alloc
      }.map(_._1).toSet
      assert(bySrc.get(src).map(_.map(_._1).toSet).getOrElse(Set.empty) === expect, src)
    }
  }

  test("incremental dedup flags exactly the batch docs with matching signatures") {
    val out = Curate.qIncrementalDedup(spark, sfDir).collect()
    assert(out.nonEmpty, "fixture should contain cross-split signature collisions")
    val sig = Dedup.simhash(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val flagged = out.map(r => (r.getLong(0), r.getString(1))).toSet
    // soundness: every flag is justified by the signature table
    flagged.foreach { case (id, reason) =>
      assert(id >= 400L, s"corpus doc $id flagged")
      reason match {
        case "in_corpus" =>
          assert(sig.exists { case (o, s) => o < 400L && s == sig(id) })
        case "in_batch" =>
          assert(sig.exists { case (o, s) => o >= 400L && o < id && s == sig(id) })
        case other => fail(s"unknown reason $other")
      }
    }
    // completeness: every batch doc with a matching signature is flagged
    sig.foreach { case (id, s) =>
      if (id >= 400L) {
        if (sig.exists { case (o, so) => o < 400L && so == s })
          assert(flagged.contains(id -> "in_corpus"), s"$id missing in_corpus")
        if (sig.exists { case (o, so) => o >= 400L && o < id && so == s })
          assert(flagged.contains(id -> "in_batch"), s"$id missing in_batch")
      }
    }
    // each (doc, reason) at most once
    assert(out.map(r => (r.getLong(0), r.getString(1))).distinct.length === out.length)
  }

  test("length histogram counts sum to the corpus size") {
    val total = Tables.documents(spark, sfDir).count()
    val out = Curate.qLengthHistogram(spark, sfDir).collect()
    assert(out.map(_.getLong(2)).sum === total)
    assert(out.forall(_.getLong(1) % 10 === 0))
  }

  test("decontamination flags only test-split docs with genuine train overlap") {
    import org.apache.spark.sql.functions._
    val out = Curate.qDecontaminate(spark, sfDir).collect()
    assert(out.nonEmpty, "fixture should contain contaminated test docs")
    out.foreach { r =>
      val (id, nSh, nContam) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(nContam >= 1 && nContam <= nSh, s"doc $id: $nContam of $nSh")
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
    }
    // every flagged doc is in the TEST bucket range (>= 90) — a train/test
    // bucket overlap would make documents contaminate themselves
    val flagged = out.map(_.getLong(0)).toSet
    val buckets = Tables.documents(spark, sfDir)
      .select(col("doc_id"), Curate.hashBucket(col("doc_id"), 100).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    flagged.foreach(id => assert(buckets(id) >= 90, s"doc $id not in test split"))
  }

  test("stratified sample respects per-language rates with a default") {
    import org.apache.spark.sql.functions._
    val out = Curate.qStratifiedSample(spark, sfDir).collect()
    val langs = Tables.documents(spark, sfDir).select(col("lang")).distinct().count()
    assert(out.length === langs, "one row per language")
    out.foreach { r =>
      val (lang, rate, total, sampled) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(rate === (if (lang == "en") 10L else 30L))
      assert(sampled <= total)
      // the hash rate lands near the target within binomial noise
      assert(math.abs(sampled.toDouble / total - rate / 100.0) < 0.15,
        s"$lang sampled $sampled/$total at target $rate%")
    }
  }

  test("pii scrub: counts follow the injection rule, the scrubbed text " +
    "carries no residual matches, and placeholders land (r19)") {
    import org.apache.spark.sql.functions._
    val out = Curate.qPiiScrub(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) === (if (id % 3 == 0) 1L else 0L), s"emails@$id")
      assert(r.getLong(2) === (if (id % 4 == 0) 1L else 0L), s"codes@$id")
    }
    // re-derive one scrubbed doc and pin the md5 + residual-free contract
    val doc = graft.model.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 12 === 0) // both patterns present
      .select(col("doc_id"), col("text")).head()
    val id = doc.getLong(0)
    val injected = doc.getString(1) +
      s" contact user$id@example.com" +
      s" ref ${(id * 7919) % 100000}"
    val clean = injected
      .replaceAll("user[0-9]+@example[.]com", "<EMAIL>")
      .replaceAll("ref [0-9]+", "ref <ID>")
    assert(!clean.matches(".*user[0-9]+@example[.]com.*"))
    assert(clean.contains("<EMAIL>") && clean.contains("ref <ID>"))
    val row = out.find(_.getLong(0) == id).get
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(clean.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(row.getString(4) === md, s"scrubbed md5 mismatch for doc $id")
    assert(row.getLong(3) === clean.length.toLong)
  }
}
