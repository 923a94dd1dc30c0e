package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bottom-k DISTINCT values as a typed `Aggregator` — the bounded
  * sketch state behind the KMV (k-minimum-values) cardinality and
  * set-overlap estimators in `graft.ext.Sketch`.
  *
  * Differs from [[TopKAgg]] in the one property KMV's math depends on:
  * the buffer holds each value AT MOST ONCE. A duplicated hash must
  * not occupy two of the k slots, or the k-th minimum is biased low
  * and the (k−1)/h_k cardinality estimate overshoots. Deduplication
  * happens inside `reduce`/`merge`, so callers feed the RAW value
  * stream — no `distinct()` pre-shuffle: the exchange carries at most
  * k longs per group per map partition instead of the group's whole
  * distinct universe.
  *
  * The buffer is an ascending-sorted `List` capped at `k` (insertion
  * O(k); k here is 64–1024, far below the swap-to-a-heap threshold).
  * `merge` is a sorted dedup-merge, associative and commutative, so
  * partial buffers combine in any shuffle order — the mergeability
  * that lets per-day KMV sketches roll up without re-reading raw data.
  */
class KmvAgg(k: Int) extends Aggregator[Long, List[Long], Seq[Long]] {
  require(k > 0, "k must be positive")

  override def zero: List[Long] = Nil

  override def reduce(buf: List[Long], v: Long): List[Long] = {
    // fast reject: buffer full and v doesn't beat (or ties) the max
    if (buf.lengthCompare(k) >= 0 && v >= buf.last) buf
    else {
      val (smaller, rest) = buf.span(_ < v)
      if (rest.headOption.contains(v)) buf // already present
      else (smaller ::: v :: rest).take(k)
    }
  }

  override def merge(a: List[Long], b: List[Long]): List[Long] = {
    val out = List.newBuilder[Long]
    var (x, y, n) = (a, b, 0)
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && x.head < y.head)) {
        out += x.head
        if (y.nonEmpty && y.head == x.head) y = y.tail // dedup across buffers
        x = x.tail
      } else {
        out += y.head
        if (x.nonEmpty && x.head == y.head) x = x.tail
        y = y.tail
      }
      n += 1
    }
    out.result()
  }

  override def finish(buf: List[Long]): Seq[Long] = buf

  override def bufferEncoder: Encoder[List[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
