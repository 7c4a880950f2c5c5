package graft

import org.scalacheck.{Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Fnv32a, MinHashAggregator}

/** ScalaCheck properties for the pure algorithm kernels (SURVEY §5.3):
  * algebraic laws that must hold for ANY input, not just fixtures. */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("fnv32a: always a 32-bit unsigned value, equals a reference fold") {
    check(Prop.forAll { (s: String) =>
      val bytes = s.getBytes("UTF-8")
      val h = Fnv32a.hash(bytes)
      val ref = bytes.foldLeft(2166136261L)((a, b) =>
        ((a ^ (b & 0xFFL)) * 16777619L) & 0xFFFFFFFFL)
      h >= 0L && h <= 0xFFFFFFFFL && h == ref
    })
  }

  test("minhash aggregator: merge is commutative and agrees with single-pass") {
    val p = 2000000011L
    val agg = new MinHashAggregator(8,
      p, Array.tabulate(8)(i => 3L + 7L * i), Array.tabulate(8)(i => 11L * i))
    def fold(zs: List[Long]) = zs.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
    check(Prop.forAll { (xs: List[Long], ys: List[Long]) =>
      val xn = xs.map(x => math.floorMod(x, p))
      val yn = ys.map(y => math.floorMod(y, p))
      val ab = agg.merge(fold(xn), fold(yn)).toSeq
      val ba = agg.merge(fold(yn), fold(xn)).toSeq
      val single = fold(xn ++ yn).toSeq
      ab == single && ba == single
    })
  }

  test("minhash signature is monotone: adding elements never raises a min") {
    val p = 2000000011L
    val agg = new MinHashAggregator(8,
      p, Array.tabulate(8)(i => 5L + 11L * i), Array.tabulate(8)(i => 13L * i))
    def fold(zs: List[Long]) = zs.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
    check(Prop.forAll { (xs: List[Long], extra: Long) =>
      val xn = xs.map(x => math.floorMod(x, p))
      val base = fold(xn).toSeq
      val more = agg.reduce(fold(xn), math.floorMod(extra, p)).toSeq
      more.zip(base).forall { case (m, b) => m <= b }
    })
  }

  // BPE apply-step laws over a tiny alphabet (so (l, r) pairs actually
  // occur in generated sequences)
  private val symGen = org.scalacheck.Gen.listOf(
    org.scalacheck.Gen.oneOf("a", "b", "c"))

  test("bpe mergePair: content preserved, no (l,r) adjacency survives, idempotent") {
    import graft.operators.TextOps.mergePair
    check(Prop.forAll(symGen, symGen.suchThat(_.nonEmpty)) { (xs, lr) =>
      val (l, r) = (lr.head, if (lr.length > 1) lr(1) else "b")
      val out = mergePair(xs, l, r)
      // token concatenation is invariant — merging only regroups
      val contentOk = out.mkString == xs.mkString
      // greedy left-to-right leaves no adjacent (l, r) pair; the merged
      // token "l+r" (2+ chars) can never equal a 1-char symbol, so the
      // merge cannot CREATE new (l, r) adjacencies either...
      val adjacencyOk = !out.zip(out.drop(1)).exists { case (x, y) =>
        x == l && y == r }
      // ...which makes a second application a no-op
      val idempotentOk = mergePair(out, l, r) == out
      contentOk && adjacencyOk && idempotentOk
    })
  }
}
