package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k-by-score partial aggregator: folds (score, id) rows
  * into the k best under (score DESC, id ASC), mergeable.
  *
  * Why an Aggregator and not `row_number() OVER (PARTITION BY qid)`:
  * the window form shuffles EVERY candidate row to its qid's reducer
  * and sorts there — for a kNN join that is the full n·|candidates|
  * score stream through the exchange. This buffer keeps ≤ k entries
  * per (map partition, group) and merges associatively, so the shuffle
  * carries at most k rows per group per map partition — the same
  * partial/final shape Spark's min/max use, applied to a ranked list.
  * At 100 TB that is the difference between shuffling the scored pair
  * stream (quadratic-ish) and shuffling n·k tuples.
  *
  * Determinism: the order is total — java.lang.Double.compare on the
  * score with ±0.0 unified (callers feed well-defined finite cosines;
  * NaN gets IEEE total-order placement rather than undefined
  * behavior), then the id ascending — so any merge tree yields the
  * same k list, and a DuckDB `ORDER BY score DESC, id` window replays
  * it exactly.
  *
  * The buffer is a sorted Array of ≤ k (score, id) pairs; reduce is a
  * binary-search insertion, merge is a two-pointer sorted merge — O(k)
  * state, O(log k)/O(k) per op.
  */
class TopKByScore(k: Int)
    extends Aggregator[(Double, Long), Array[(Double, Long)], Array[(Double, Long)]]
    with Serializable {
  require(k >= 1, s"top-k capacity must be positive, got $k")

  // (a before b) under score DESC, id ASC. +0.0 added to each score so
  // -0.0 compares equal to 0.0 (SQL double ordering: IEEE -0.0+0.0 =
  // +0.0) and such ties fall to the id, matching ORDER BY in both
  // engines; the stored/output score value itself is untouched.
  private def before(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(b._1 + 0.0, a._1 + 0.0) // reversed: higher first
    c < 0 || (c == 0 && a._2 < b._2)
  }

  override def zero: Array[(Double, Long)] = Array.empty

  override def reduce(buf: Array[(Double, Long)], x: (Double, Long)): Array[(Double, Long)] = {
    if (buf.length == k && !before(x, buf(k - 1))) return buf
    // binary search for insertion point among the sorted buffer
    var lo = 0
    var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (before(buf(mid), x)) lo = mid + 1 else hi = mid
    }
    val outLen = math.min(k, buf.length + 1)
    val out = new Array[(Double, Long)](outLen)
    System.arraycopy(buf, 0, out, 0, lo)
    if (lo < outLen) {
      out(lo) = x
      val tail = math.min(buf.length - lo, outLen - lo - 1)
      if (tail > 0) System.arraycopy(buf, lo, out, lo + 1, tail)
    }
    out
  }

  override def merge(a: Array[(Double, Long)], b: Array[(Double, Long)]): Array[(Double, Long)] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[(Double, Long)](math.min(k, a.length + b.length))
    var i = 0; var j = 0; var o = 0
    while (o < out.length) {
      if (j >= b.length || (i < a.length && before(a(i), b(j)))) { out(o) = a(i); i += 1 }
      else { out(o) = b(j); j += 1 }
      o += 1
    }
    out
  }

  override def finish(buf: Array[(Double, Long)]): Array[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Array[(Double, Long)]] =
    ExpressionEncoder[Array[(Double, Long)]]()
  override def outputEncoder: Encoder[Array[(Double, Long)]] =
    ExpressionEncoder[Array[(Double, Long)]]()
}
