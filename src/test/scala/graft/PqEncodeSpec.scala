package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Bit-parity of the compiled PQ encode kernel
  * ([[graft.functions.PqEncodeCodes]], r16) against the declarative
  * `array_min(array(<K structs>))` form it replaced. The kernel feeds
  * every PQ/IVFPQ code column (live serves, staged indices, appends),
  * so code-for-code equality here is what keeps all their DuckDB
  * oracles unchanged. */
class PqEncodeSpec extends SparkSuiteBase {
  import spark.implicits._

  private def assertParity(vecs: Seq[(Long, Array[Long])],
      books: Array[Array[Array[Long]]]): Unit = {
    val df = vecs.toDF("vec_id", "eq")
    val rows = df.select(
      Similarity.pqCodesCol(books, "eq").as("k"),
      Similarity.pqCodesColDeclarative(books, "eq").as("d")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Int](0) === r.getSeq[Int](1),
        s"kernel codes ${r.getSeq[Int](0)} != declarative ${r.getSeq[Int](1)}")
    }
  }

  test("compiled PQ codes ≡ declarative argmin on the fixture codebooks + seeded vectors") {
    val books = Similarity.pqCodebooks(spark, sf)
    val dims = Similarity.PqM * Similarity.PqD
    val rnd = new scala.util.Random(42)
    // micro-unit-scaled range, same magnitude as the quantized corpus
    val vecs = (0 until 300).map(i => (i.toLong,
      Array.fill(dims)((rnd.nextDouble() * 4e6 - 2e6).toLong)))
    assertParity(vecs, books)
    // and exact codeword hits (d2 = 0 in one subspace, competition in
    // the rest): vector = concatenation of one codeword per subspace
    val exact = (0 until 20).map { i =>
      (1000L + i, books.map(b => b(i % b.length)).flatten)
    }
    assertParity(exact, books)
  }

  test("d2 ties pick the LOWER code in both forms") {
    // a codebook family whose subspace 0 holds the SAME codeword at
    // codes 1 and 3 — every vector ties between them and array_min's
    // lexicographic (d2, code) order must win in the kernel too
    val dup = Array(7L, -3L, 0L, 11L, 2L, -8L, 5L, 1L)
    val books: Array[Array[Array[Long]]] =
      Array.tabulate(Similarity.PqM) { s =>
        if (s == 0) Array(Array.fill(8)(900000L), dup, Array.fill(8)(-900000L), dup)
        else Array.tabulate(4)(c => Array.fill(8)(c * 1000L - 1500L))
      }
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 50).map { i =>
      // subspace 0 = exactly the duplicated codeword (d2 = 0 twice)
      (i.toLong, dup ++ Array.fill(56)((rnd.nextDouble() * 4000 - 2000).toLong))
    }
    val df = vecs.toDF("vec_id", "eq")
    val rows = df.select(
      Similarity.pqCodesCol(books, "eq").as("k"),
      Similarity.pqCodesColDeclarative(books, "eq").as("d")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Int](0).head === 1, "tie must keep the lower code")
      assert(r.getSeq[Int](0) === r.getSeq[Int](1))
    }
  }

  test("ragged vector (length ≠ M·D) yields NULL codes") {
    val books = Similarity.pqCodebooks(spark, sf)
    val df = Seq((1L, Array.fill(17)(5L))).toDF("vec_id", "eq")
    val r = df.select(Similarity.pqCodesCol(books, "eq").as("k")).head()
    assert(r.isNullAt(0))
  }
}
