package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded k-minimum-values partial aggregator: folds a stream of
  * longs into its k smallest DISTINCT values, mergeable — the KMV
  * distinct-value synopsis of Beyer et al., "On synopses for
  * distinct-value estimation under multiset operations" (SIGMOD 2007).
  *
  * Why an Aggregator and not `DISTINCT` + a window: the distinct
  * shuffles the full VALUE DOMAIN to the reducers before any ranking —
  * at 100 TB that is the cardinality being estimated. This buffer
  * keeps ≤ k longs per (map partition, group), dedups inside the
  * buffer, and merges associatively, so the exchange carries at most k
  * longs per group per map partition no matter the stream size — the
  * bounded-state shape that is the entire point of a KMV sketch
  * (same partial/final discipline as [[TopKByScore]]).
  *
  * Determinism: the result is a pure function of the input VALUE SET
  * (insertion order and merge tree are invisible — min-k of a set),
  * so a DuckDB `row_number() OVER (ORDER BY h)` window replays it
  * exactly.
  *
  * The buffer is a sorted ascending Array of ≤ k unique longs; reduce
  * is a binary-search insert that drops duplicates, merge is a
  * two-pointer unique merge — O(k) state, O(log k)/O(k) per op.
  */
class MinKDistinctLongs(k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] with Serializable {
  require(k >= 1, s"KMV capacity must be positive, got $k")

  override def zero: Array[Long] = Array.empty

  override def reduce(buf: Array[Long], x: Long): Array[Long] = {
    if (buf.length == k && x >= buf(k - 1)) return buf
    var lo = 0
    var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buf(mid) < x) lo = mid + 1 else hi = mid
    }
    if (lo < buf.length && buf(lo) == x) return buf // already present
    val outLen = math.min(k, buf.length + 1)
    val out = new Array[Long](outLen)
    System.arraycopy(buf, 0, out, 0, lo)
    if (lo < outLen) {
      out(lo) = x
      val tail = math.min(buf.length - lo, outLen - lo - 1)
      if (tail > 0) System.arraycopy(buf, lo, out, lo + 1, tail)
    }
    out
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Long](math.min(k, a.length + b.length))
    var i = 0; var j = 0; var o = 0
    while (o < out.length && (i < a.length || j < b.length)) {
      val take =
        if (j >= b.length) { val v = a(i); i += 1; v }
        else if (i >= a.length) { val v = b(j); j += 1; v }
        else if (a(i) < b(j)) { val v = a(i); i += 1; v }
        else if (b(j) < a(i)) { val v = b(j); j += 1; v }
        else { val v = a(i); i += 1; j += 1; v } // shared value, once
      out(o) = take
      o += 1
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
