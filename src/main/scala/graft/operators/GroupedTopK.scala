package graft.operators

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Grouped top-k as a typed `Aggregator` (the engine's UDAF surface —
  * SURVEY.md §2.1 "UDF/UDAF/UDTF registration"): keeps the k largest
  * (value, tieBreak) pairs per group in a bounded buffer.
  *
  * Scale rationale vs the window formulation
  * (`row_number().over(partitionBy(g).orderBy(v))  <= k`): a window sorts
  * EVERY row of every group after a full shuffle; this aggregator is
  * map-side combinable — each partition reduces to at most k pairs per
  * group before the shuffle, so the exchanged data is O(groups * k), not
  * O(rows). At 100 TB that is the difference between a bounded and an
  * unbounded shuffle. Determinism: ordering is on (value, tieBreak)
  * descending, a total order when tieBreak is unique.
  *
  * The buffer is a sorted ascending array (size <= k, binary-insert);
  * the k under consideration is small by construction.
  */
object GroupedTopK {

  type Pair = (Double, Long)

  final case class TopKAgg(k: Int) extends Aggregator[Pair, List[Pair], Seq[Pair]] {
    override def zero: List[Pair] = Nil

    private def insert(buf: List[Pair], x: Pair): List[Pair] = {
      // ascending insert, then clamp from the front (smallest drops first)
      val (lo, hi) = buf.span(p => p._1 < x._1 || (p._1 == x._1 && p._2 < x._2))
      val merged = lo ::: x :: hi
      if (merged.size > k) merged.drop(merged.size - k) else merged
    }

    override def reduce(buf: List[Pair], x: Pair): List[Pair] = insert(buf, x)

    override def merge(a: List[Pair], b: List[Pair]): List[Pair] =
      b.foldLeft(a)(insert)

    override def finish(buf: List[Pair]): Seq[Pair] = buf.reverse // desc

    override def bufferEncoder: Encoder[List[Pair]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Pair]]()
    override def outputEncoder: Encoder[Seq[Pair]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Pair]]()
  }

  /** Column form: top-k (value, tieBreak) pairs per group, descending. */
  def topK(k: Int)(value: Column, tieBreak: Column): Column =
    udaf(TopKAgg(k)).apply(value, tieBreak)
}
