package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` keeping the k (key, id) pairs with the SMALLEST
  * keys per group — the ascending sibling of [[TopKAggregator]], used by
  * [[graft.ops.Sampling.uniformExactKPerGroup]] for hash-order-statistic
  * sampling: each map task keeps ≤k pairs per group (partial
  * aggregation), the reduce side k-way-merges them, so the group shuffle
  * carries at most k·groups rows and NO group is ever sorted whole. The
  * window formulation (`row_number` over `orderBy(key)`) is
  * result-identical but sorts every group's full row set — with
  * million-row groups that sort spills where this buffer cannot (it is
  * k pairs, period).
  *
  * Keys are expected distinct within a group (the sampling hash is a
  * bijection); (key, id) ordering makes the buffer total either way, so
  * the result is deterministic under any partitioning or merge order. */
class BottomKAggregator(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
  require(k >= 1, "bottom-k needs k >= 1")

  override def zero: Seq[(Long, Long)] = Vector.empty

  private def trim(buf: Seq[(Long, Long)]): Seq[(Long, Long)] =
    buf.sorted.take(k)

  override def reduce(buf: Seq[(Long, Long)], in: (Long, Long)): Seq[(Long, Long)] =
    // skip the sort while the buffer is not full-and-beaten: the common
    // row is ABOVE the current k-th key and never enters the buffer
    if (buf.size >= k && in._1 > buf.last._1) buf else trim(buf :+ in)

  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    trim(a ++ b)

  override def finish(buf: Seq[(Long, Long)]): Seq[(Long, Long)] = trim(buf)

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()

  override def outputEncoder: Encoder[Seq[(Long, Long)]] = bufferEncoder
}
