package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator computing a bounded top-k of (id, score) pairs per
  * group, ordered by (score desc, id asc).
  *
  * This is the 100 TB path for grouped top-k: Spark runs the aggregator
  * with map-side partials, so each partition reduces its rows to a ≤k
  * buffer before anything shuffles — the exchange moves O(groups·k)
  * rows, versus the window-function formulation which shuffles *every*
  * scored row to sort it. Output order is fully deterministic (unique
  * id tiebreak), so results are hash-identical to the window version.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Long, Double), List[(Double, Long)], Seq[(Long, Double)]] {

  // buffer: sorted desc by (score, then id asc), length ≤ k
  override def zero: List[(Double, Long)] = Nil

  private def insert(b: List[(Double, Long)], e: (Double, Long)): List[(Double, Long)] = {
    // order: higher score first; equal scores -> lower id first
    def lt(x: (Double, Long), y: (Double, Long)): Boolean =
      x._1 > y._1 || (x._1 == y._1 && x._2 < y._2)
    val (pre, post) = b.span(lt(_, e))
    val merged = pre ::: (e :: post)
    if (merged.length > k) merged.init else merged
  }

  override def reduce(b: List[(Double, Long)], row: (Long, Long, Double)): List[(Double, Long)] =
    insert(b, (row._3, row._2))

  override def merge(b1: List[(Double, Long)], b2: List[(Double, Long)]): List[(Double, Long)] =
    b2.foldLeft(b1)(insert)

  override def finish(b: List[(Double, Long)]): Seq[(Long, Double)] =
    b.map { case (score, id) => (id, score) }

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    Encoders.kryo[List[(Double, Long)]]
  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    Encoders.kryo[Seq[(Long, Double)]]
}
