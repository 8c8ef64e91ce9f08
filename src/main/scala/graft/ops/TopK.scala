package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` computing per-group top-k as a bounded sorted buffer —
  * the UDAF extension point (SURVEY.md §2.2 "UDF/UDAF surface").
  *
  * Scale rationale vs the `row_number` window: a window sorts every group's
  * full row set (shuffle + sort of N rows); this aggregator keeps only k
  * entries per group in the partial aggregate, so the shuffle carries at
  * most k·groups tuples and map-side combine does the heavy cut. For top-3
  * of 10⁹ rows across 10⁴ groups that is the difference between shuffling
  * 10⁹ rows and shuffling 3·10⁴.
  *
  * Ordering: descending by score, ties broken by ascending id — identical
  * to `row_number over (order by score desc, id)`.
  */
class TopKAggregator(k: Int) extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

  private def insert(buf: List[(Double, Long)], v: (Double, Long)): List[(Double, Long)] = {
    // descending score, ascending id on ties
    val lt = (a: (Double, Long), b: (Double, Long)) =>
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    val (before, after) = buf.span(lt(_, v))
    (before ::: v :: after).take(k)
  }

  override def zero: List[(Double, Long)] = Nil
  override def reduce(b: List[(Double, Long)], a: (Double, Long)): List[(Double, Long)] =
    insert(b, a)
  override def merge(b1: List[(Double, Long)], b2: List[(Double, Long)]): List[(Double, Long)] =
    b2.foldLeft(b1)(insert)
  override def finish(r: List[(Double, Long)]): Seq[(Double, Long)] = r
  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
