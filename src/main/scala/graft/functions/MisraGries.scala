package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch as a typed [[Aggregator]] (the
  * custom-UDAF surface next to [[GeoMean]], usable via
  * `functions.udaf`). At most `k` counters are kept; the classic
  * guarantee is that any item with true frequency > n/(k+1) still owns
  * a counter at the end, with each counter undercounting by at most
  * n/(k+1). Partial buffers merge by counter-sum followed by the
  * (k+1)-th-largest subtraction, which preserves that bound across
  * arbitrary partitionings (the mergeable-summaries construction —
  * Agarwal et al., PODS'12, §3.1) — so the result is partitioning-
  * independent enough for an exact-rescue finish: verify the ≤ k
  * candidates against exact counts and the combined pipeline returns
  * precisely the true heavy hitters while only ever shuffling candidate
  * rows, not the full token stream.
  */
case class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 0)

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], tok: String): Map[String, Long] =
    b.get(tok) match {
      case Some(c) => b.updated(tok, c + 1)
      case None if b.size < k => b.updated(tok, 1L)
      case None => // decrement-all step; drop exhausted counters
        b.view.mapValues(_ - 1).filter(_._2 > 0).toMap
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest count so at most k survive
      val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
      sum.view.mapValues(_ - cut).filter(_._2 > 0).toMap
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
