package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed custom aggregation (SURVEY §2 U2): the engine-level form of the
  * reference's `ReduceInterface` — arbitrary per-key merge logic
  * (`/root/reference/mp/worker.go:17`, `test.go:44-71`) as an
  * `Aggregator[IN, BUF, OUT]`: Spark runs `reduce` as the map-side
  * partial (the reference's in-mapper combine, `test.go:15`) and `merge`
  * as the reduce-side final, exactly the A2/A6 decomposition.
  *
  * Computes discount-adjusted quantity sum: Σ qty·(1−disc).
  */
class NetQtyAggregator extends Aggregator[(Double, Double), (Double, Long), Double]
    with Serializable {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), in: (Double, Double)): (Double, Long) =
    (b._1 + in._1 * (1 - in._2), b._2 + 1)
  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(b: (Double, Long)): Double = b._1
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object NetQtyAggregator {
  /** Column form over (quantity, discount). */
  def netQty(qty: Column, disc: Column): Column =
    udaf(new NetQtyAggregator,
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))
      .apply(qty, disc)
}
