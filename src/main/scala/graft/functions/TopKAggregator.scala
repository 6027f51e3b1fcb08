package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator (SURVEY §7.4): keeps the k largest
  * (score, id) pairs per group with a bounded buffer — the
  * `Dataset.groupByKey(...).agg(TopK.toColumn)` alternative to a ranking
  * window. The buffer is O(k) per group and merges associatively, so the
  * aggregation is one shuffle of k-sized partials (map-side combined) —
  * at 100 TB this beats a window when groups are few and hot (the
  * ranking window would sort every row of a group through one task).
  *
  * Ordering matches the window-based operators: score descending, id
  * ascending on ties — results are deterministic and comparable.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), List[(Long, Double)], Seq[(Long, Double)]] {

  /** score desc, id asc — worst element last. */
  private def sorted(xs: List[(Long, Double)]): List[(Long, Double)] =
    xs.sortBy { case (id, score) => (-score, id) }

  override def zero: List[(Long, Double)] = Nil

  override def reduce(buf: List[(Long, Double)], row: (Long, Double)): List[(Long, Double)] =
    sorted(row :: buf).take(k)

  override def merge(a: List[(Long, Double)], b: List[(Long, Double)]): List[(Long, Double)] =
    sorted(a ++ b).take(k)

  override def finish(buf: List[(Long, Double)]): Seq[(Long, Double)] = sorted(buf)

  override def bufferEncoder: Encoder[List[(Long, Double)]] =
    ExpressionEncoder[List[(Long, Double)]]()
  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder[Seq[(Long, Double)]]()
}
