package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored row flowing into [[TopKAgg]]: `score` ranks descending,
  * `id` breaks ties ascending (and is what callers usually want back).
  */
case class Scored(score: Double, id: Long)

/** Bounded top-k as a typed `Aggregator` — the aggregation-pushdown
  * alternative to the window-function top-k (`row_number() <= k`).
  *
  * Why it exists: the window form must shuffle EVERY row of the group
  * to one reducer and sort it; per-group state is O(group size). This
  * aggregator's buffer never holds more than `k` rows, `reduce`
  * runs map-side (partial aggregation before the exchange), and
  * `merge` combines two k-bounded buffers — so the shuffle carries at
  * most k rows per group per map partition and per-group reducer state
  * is O(k). At 100 TB with millions of rows per group and k=10, the
  * exchange shrinks by orders of magnitude; this is the standard
  * "top-k aggregate" rewrite OLAP engines apply automatically.
  *
  * Semantics: highest `score` first, ties broken by smallest `id` —
  * a total order, so the result is deterministic and oracle-able
  * against the `row_number()` window form (equivalence unit-gated, and
  * `q_topk_agg` hash-checks it against a DuckDB window query).
  *
  * The buffer is a descending-sorted `List` capped at `k`: insertion
  * is O(k) per row, fine for the small k this rewrite targets. For
  * k in the thousands swap in a bounded heap — same Aggregator shape.
  */
class TopKAgg(k: Int) extends Aggregator[Scored, List[Scored], Seq[Scored]] {
  require(k > 0, "k must be positive")

  /** score desc, id asc — `true` when `a` outranks `b`. */
  private def outranks(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: List[Scored] = Nil

  override def reduce(buf: List[Scored], row: Scored): List[Scored] =
    insert(buf, row)

  /** Merge two sorted, k-bounded buffers (classic sorted-list merge,
    * truncated at k). Associative and commutative, which is what lets
    * Spark combine partial buffers in any shuffle order.
    */
  override def merge(a: List[Scored], b: List[Scored]): List[Scored] = {
    val out = List.newBuilder[Scored]
    var (x, y, n) = (a, b, 0)
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && outranks(x.head, y.head))) {
        out += x.head; x = x.tail
      } else {
        out += y.head; y = y.tail
      }
      n += 1
    }
    out.result()
  }

  override def finish(buf: List[Scored]): Seq[Scored] = buf

  private def insert(buf: List[Scored], row: Scored): List[Scored] = {
    // fast reject: buffer full and the new row doesn't beat the tail
    if (buf.lengthCompare(k) >= 0 && !outranks(row, buf.last)) buf
    else {
      val (better, rest) = buf.span(outranks(_, row))
      (better ::: row :: rest).take(k)
    }
  }

  override def bufferEncoder: Encoder[List[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}
