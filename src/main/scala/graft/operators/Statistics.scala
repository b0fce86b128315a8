package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Attached-function statistics — the reference's associative+commutative
  * accumulators bound to collections
  * (`rust/worker/src/execution/functions/statistics.rs:25-80`:
  * `CounterFunction`, token-frequency statistics), re-expressed as typed
  * `Aggregator`s so Catalyst partial-aggregates them map-side and
  * Structured Streaming can run them incrementally over the WAL
  * (state-store-backed, `st_*` queries show the streaming face).
  */
object Statistics {

  /** Token-frequency statistic: counts per token, finished as the global
    * top-N by (count desc, token asc). Buffer is a plain count map —
    * merge is map union with summed counts (assoc + comm).
    */
  class TokenFreqAgg(topN: Int)
      extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
    override def zero: Map[String, Long] = Map.empty
    override def reduce(m: Map[String, Long], t: String): Map[String, Long] =
      m.updated(t, m.getOrElse(t, 0L) + 1L)
    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      b.foldLeft(a) { case (m, (t, c)) => m.updated(t, m.getOrElse(t, 0L) + c) }
    override def finish(m: Map[String, Long]): Seq[(String, Long)] =
      m.toSeq.sortBy { case (t, c) => (-c, t) }.take(topN)
    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Seq[(String, Long)]] =
      ExpressionEncoder[Seq[(String, Long)]]()
  }

  /** CounterFunction (`statistics.rs`): plain long counter. */
  class CounterAgg extends Aggregator[Long, Long, Long] {
    override def zero: Long = 0L
    override def reduce(b: Long, a: Long): Long = b + a
    override def merge(a: Long, b: Long): Long = a + b
    override def finish(r: Long): Long = r
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }
}
