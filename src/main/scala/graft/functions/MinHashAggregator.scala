package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed MinHash-signature aggregator: folds a stream of shingle hashes
  * into a `numPerm`-wide signature of per-permutation minima, with
  * h_i(x) = (a_i·x + b_i) mod P.
  *
  * Why an `Aggregator` and not array lambdas: Spark higher-order
  * functions (`transform`/`array_min`) evaluate interpreted, one boxed
  * lambda call per element — a 128-perm signature over a corpus is
  * O(perms · shingles) lambda invocations (minutes at sf0.1). This
  * aggregator is a `TypedImperativeAggregate` under the hood: the
  * buffer lives as a plain `Array[Long]` object per group (serialized
  * only on spill/shuffle), and each input row costs one tight JVM loop
  * of multiply-mod-min — ~100× faster, and it's the idiomatic
  * map-side-combining shape (partial signatures merge associatively, so
  * the shuffle carries one signature per (partition, doc), not the
  * shingles). This is also the engine's `ReduceInterface` equivalent
  * (SURVEY §2 U2): arbitrary typed per-key merge logic
  * (`/root/reference/mp/worker.go:17`).
  *
  * Inputs must already be reduced mod P (see `Dedup.minhashLsh`), so
  * a_i·x + b_i stays within signed-64 range.
  */
class MinHashAggregator(numPerm: Int, p: Long, permA: Array[Long], permB: Array[Long])
    extends Aggregator[Long, Array[Long], Array[Long]] with Serializable {

  override def zero: Array[Long] = Array.fill(numPerm)(Long.MaxValue)

  override def reduce(buf: Array[Long], x: Long): Array[Long] = {
    var i = 0
    while (i < numPerm) {
      val h = (permA(i) * x + permB(i)) % p
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numPerm) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object MinHashAggregator {
  /** Column form: MinHash signature of the grouped shingle-hash column. */
  def sig(shingleHash: Column, numPerm: Int, p: Long,
          permA: Array[Long], permB: Array[Long]): Column =
    udaf(new MinHashAggregator(numPerm, p, permA, permB),
      Encoders.scalaLong).apply(shingleHash)
}
