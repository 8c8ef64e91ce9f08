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

  test("length histogram counts sum to the corpus size") {
    val total = Tables.documents(spark, sfDir).count()
    val out = Curate.qLengthHistogram(spark, sfDir).collect()
    assert(out.map(_.getLong(2)).sum === total)
    assert(out.forall(_.getLong(1) % 10 === 0))
  }
}
