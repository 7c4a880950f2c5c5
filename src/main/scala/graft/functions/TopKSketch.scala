package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch (Misra & Gries, "Finding repeated
  * elements", Sci. Comput. Program. 1982) as a typed `Aggregator` —
  * mergeable per Agarwal et al., "Mergeable Summaries" (PODS 2012).
  *
  * The 100 TB shape for "top tokens" when the VOCABULARY itself is the
  * problem: exact wordcount shuffles one row per distinct key (fine for
  * words, fatal for URLs/n-grams/user-agents at web scale); the sketch
  * keeps ≤ `capacity` counters per partition, shuffles only those, and
  * guarantees after any merge tree:
  *   - every item with true count > N / (capacity+1) is present;
  *   - each reported estimate undercounts by at most N / (capacity+1).
  * Which items BELOW the guarantee line survive depends on merge order
  * (partitioning), so the sketch is spec-bounded against the exact
  * aggregation rather than DuckDB-oracle-hashed.
  *
  * Update is O(1) amortized: on overflow past `capacity`, subtract the
  * buffer's minimum count from every counter and drop the zeros (the
  * classic MG decrement step, batched). Merge sums counters, then
  * re-shrinks to `capacity` the same way.
  */
class TopKSketch(capacity: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  private def shrink(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= capacity) m
    else {
      // decrement such that at most `capacity` survive: subtract the
      // (capacity+1)-th largest count (≥ classic one-at-a-time MG, same
      // guarantee — this is the "Mergeable Summaries" batched form)
      val cut = m.valuesIterator.toArray.sorted(Ordering[Long].reverse)(capacity)
      m.flatMap { case (k, v) =>
        if (v > cut) Some(k -> (v - cut)) else None
      }
    }

  override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
    shrink(b.updated(a, b.getOrElse(a, 0L) + 1L))

  override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] =
    shrink(y.foldLeft(x) { case (acc, (k, v)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + v)
    })

  override def finish(r: Map[String, Long]): Map[String, Long] = r

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
}
