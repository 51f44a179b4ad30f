package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One (id, score) candidate row for the bounded top-k aggregate. */
case class ScoredId(id: Long, score: Double)

/** Bounded top-k aggregate keeping the k best entries by
  * (score desc, id asc) — the tie-break matches
  * `row_number over (order by score desc, id asc)` exactly, so results
  * are hash-identical to the window formulation.
  *
  * Scale rationale: `Window.partitionBy(query)` creates one shuffle
  * partition per query, each holding every scored row for that query —
  * a skew scale-killer when #queries is small and the corpus is large.
  * As an Aggregator the map side reduces every partition to ≤k entries
  * per group before the shuffle, so shuffle traffic is
  * O(#groups · k · #partitions) regardless of corpus size.
  *
  * The buffer is kept sorted (zero = empty, reduce/merge preserve order),
  * so a row that can't displace the current worst is O(1).
  */
class TopKAgg(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
  private val ord: Ordering[ScoredId] = Ordering.by((s: ScoredId) => (-s.score, s.id))

  override def zero: Seq[ScoredId] = Nil

  override def reduce(b: Seq[ScoredId], a: ScoredId): Seq[ScoredId] =
    if (b.length >= k && ord.gteq(a, b.last)) b
    else ((a +: b).sorted(ord)).take(k)

  override def merge(b1: Seq[ScoredId], b2: Seq[ScoredId]): Seq[ScoredId] =
    (b1 ++ b2).sorted(ord).take(k)

  override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r

  override def bufferEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
}
