package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.model.Tables

class PruneSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("bloom semi-join equals the plain semi-join") {
    val urgent = Tables.orders(spark, sfDir).filter(col("o_orderpriority") === "1-URGENT")
    val li = Tables.lineitem(spark, sfDir)
    val got = Prune.bloomSemiJoin(li, "l_orderkey", urgent, "o_orderkey")
      .select(col("l_orderkey"), col("l_linenumber"))
    val exact = li.join(urgent.select(col("o_orderkey")).distinct(),
        li("l_orderkey") === col("o_orderkey"), "left_semi")
      .select(col("l_orderkey"), col("l_linenumber"))
    assert(got.exceptAll(exact).count() === 0 && exact.exceptAll(got).count() === 0)
  }

  test("bloom pre-filter prunes most non-matching rows before the join") {
    val urgent = Tables.orders(spark, sfDir).filter(col("o_orderpriority") === "1-URGENT")
    val li = Tables.lineitem(spark, sfDir)
    val total = li.count()
    val matching = li.join(urgent.select(col("o_orderkey")).distinct(),
      li("l_orderkey") === col("o_orderkey"), "left_semi").count()
    val pruned = li.filter(
      Prune.bloomMightContain(li, "l_orderkey", urgent, "o_orderkey", 100000L)).count()
    // no false negatives, and the false-positive overhead stays small
    assert(pruned >= matching)
    assert(pruned <= matching + (total - matching) / 10,
      s"bloom kept $pruned of $total (true matches: $matching)")
  }
}

class RangeJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("binned point-in-interval equals the naive theta join (edges + multi-bin)") {
    // empty interval (7,7); single-point (5,6); bin-spanning (95,205) at width 100
    val intervals = Seq((1L, 0L, 10L), (2L, 5L, 6L), (3L, 7L, 7L), (4L, 95L, 205L))
      .toDF("iv_id", "s", "en")
    val points = Seq(10L -> 0L, 11L -> 5L, 12L -> 9L, 13L -> 10L,
        14L -> 100L, 15L -> 204L, 16L -> 205L)
      .toDF("p_id", "p")
    val got = RangeJoin.pointInInterval(points, "p", intervals, "s", "en", 100L)
      .select(col("p_id"), col("iv_id"))
    val naive = points.join(intervals, col("p") >= col("s") && col("p") < col("en"))
      .select(col("p_id"), col("iv_id"))
    assert(got.exceptAll(naive).count() === 0 && naive.exceptAll(got).count() === 0)
    // each matching pair exactly once
    assert(got.count() === got.distinct().count())
  }

  test("range-join query windows partition the matched events") {
    val out = RangeJoin.qRangeJoin(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(1) > 0))
  }
}

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
