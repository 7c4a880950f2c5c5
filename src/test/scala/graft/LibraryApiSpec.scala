package graft

import org.apache.spark.sql.functions._
import graft.operators.{Clustering, Dedup, Pipeline, Similarity, TextOps}

/** The library surface: every north-star operator callable on a
  * user-supplied DataFrame (the (spark, dir) forms are thin catalog
  * wrappers over these). */
class LibraryApiSpec extends SparkSuiteBase {

  private def userDocs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs away fast", "en"),
      (2L, "the quick brown fox jumps over the lazy dog and runs away quickly", "en"),
      (3L, "completely different text about sorting tables and joining rows", "en"),
      (4L, "der hund läuft", "de"))
      .toDF("doc_id", "text", "lang")
  }

  test("minhash near-dup detection on an arbitrary docs DataFrame") {
    val pairs = Dedup.minhashLsh(userDocs).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
  }

  test("dedupNear drops the non-canonical near-dup, keeps the rest") {
    val kept = Dedup.dedupNear(userDocs).collect().map(_.getLong(0)).sorted
    assert(kept.toSeq === Seq(1L, 3L, 4L)) // 2 is the near-dup of 1
  }

  test("quality + token + curation on an arbitrary docs DataFrame") {
    val q = TextOps.qualityScore(userDocs).collect()
      .map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(q.keySet === Set(1L, 2L, 3L, 4L))
    val ledger = Pipeline.curate(userDocs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 2 dropped as the near-dup of doc 1
    assert(ledger("en")._2 === 1L)
  }

  test("kNN join + mutual-kNN graph on an arbitrary embeddings DataFrame") {
    import spark.implicits._
    // 3 clusters × 4 near-identical 64-dim vectors; dim 63 constant
    val rnd = new scala.util.Random(19)
    val rows = for (c <- 0 until 3; m <- 0 until 4) yield {
      val e = Array.fill(64)(0.01 * rnd.nextGaussian())
      e(c) = 1.0           // cluster direction
      e(63) = 0.5          // constant dimension (SQ w=1 guard below)
      ((c * 4 + m).toLong, e)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val knn = Similarity.knnJoin(emb, 3).collect()
    // each vector's top-3 are its 3 cluster mates
    knn.foreach { r =>
      assert(r.getLong(0) / 4 === r.getLong(1) / 4,
        s"${r.getLong(0)} neighbors outside its cluster")
    }
    val labels = Similarity.knnGraph(emb, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(labels.size === 12)
    labels.foreach { case (v, comp) => assert(comp === (v / 4) * 4,
      s"vector $v labeled $comp, want cluster min ${(v / 4) * 4}") }
  }

  test("SQ8 search on an arbitrary embeddings DataFrame (constant-dim width guard)") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = for (c <- 0 until 3; m <- 0 until 4) yield {
      val e = Array.fill(64)(0.01 * rnd.nextGaussian())
      e(c) = 1.0
      e(63) = 0.5
      ((c * 4 + m).toLong, e)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val top = Similarity.sqTopK(emb, col("vec_id") === 0L, 3).collect()
    assert(top.map(_.getLong(1)).toSet === Set(1L, 2L, 3L),
      "vector 0's SQ8 top-3 must be its cluster mates")
  }

  test("hash sampling is deterministic, composable and partition-stable") {
    import spark.implicits._
    val docs = (0L until 1000L).map(i => (i, s"text $i", "en"))
      .toDF("doc_id", "text", "lang")
    val s1 = Pipeline.hashSample(docs, 10).collect().map(_.getLong(0)).sorted
    val s2 = Pipeline.hashSample(docs.repartition(7), 10).collect()
      .map(_.getLong(0)).sorted
    assert(s1.sameElements(s2), "sample changed under repartitioning")
    assert(s1.nonEmpty && s1.length < 1000)
    // idempotence: re-sampling the sample at the same modulus is a no-op
    val again = Pipeline.hashSample(
      docs.where(col("doc_id").isin(s1.toIndexedSeq: _*)), 10).collect()
      .map(_.getLong(0)).sorted
    assert(again.sameElements(s1))
    // refinement: a larger modulus on the same hash nests inside
    val finer = Pipeline.hashSample(docs, 20).collect().map(_.getLong(0))
    assert(finer.toSet.subsetOf(s1.toSet))
  }

  test("train/val split partitions the corpus: disjoint, exhaustive, stable") {
    import spark.implicits._
    val docs = (0L until 500L).map(i => (i, s"doc $i", "en"))
      .toDF("doc_id", "text", "lang")
    val (train, valid) = Pipeline.trainValSplit(docs, valMod = 10)
    val t = train.collect().map(_.getLong(0)).toSet
    val v = valid.collect().map(_.getLong(0)).toSet
    assert((t & v).isEmpty, "split must be disjoint")
    assert(t.size + v.size === 500, "split must be exhaustive")
    assert(v.nonEmpty && t.size > v.size)
    // stability: same membership on a reshuffled input
    val (_, v2) = Pipeline.trainValSplit(docs.repartition(7), valMod = 10)
    assert(v2.collect().map(_.getLong(0)).toSet === v)
    // schema preserved (no helper columns leak)
    assert(train.columns.toSeq === docs.columns.toSeq)
  }

  test("similarity + kmeans on an arbitrary vectors DataFrame") {
    import spark.implicits._
    val vecs = (0L until 20L).map { i =>
      (i, Array.tabulate(64)(d => math.sin((i * 64 + d).toDouble))) // deterministic
    }.toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(vecs, col("vec_id") < 2, k = 3)
    assert(top.collect().length === 6)
    val assigned = Clustering.kmeansAssign(
      vecs.select(col("vec_id"), col("embedding").as("e")), iters = 2)
    assert(assigned.count() === 20)
  }

  test("round-4 df-form surface on arbitrary DataFrames (README snippet shapes)") {
    import spark.implicits._
    // chunking over user docs
    val chunks = Pipeline.chunk(userDocs, size = 4, overlap = 1)
    assert(chunks.columns.toSeq ===
      Seq("doc_id", "chunk_idx", "chunk_len", "chunk_md5"))
    assert(chunks.where(col("doc_id") === 1L).count() >= 3)
    // weighted sampling over arbitrary (id, w) rows
    val ws = Pipeline.weightedSample(
      (1L to 50L).map(i => (i, i.toDouble)).toDF("id", "w"), 10)
    assert(ws.count() === 10)
    // skyline over arbitrary points
    val sky = graft.operators.Relational.skyline(
      Seq((1.0, java.sql.Date.valueOf("2024-01-02")),
        (2.0, java.sql.Date.valueOf("2024-01-01"))).toDF("price", "odate"))
    assert(sky.count() === 1L) // (2.0, 01-01) dominates
    // triangles over an arbitrary edge list
    val tri = graft.operators.Graphs.triangles(
      Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("u", "v")).collect()(0)
    assert(tri.getAs[Long]("n_triangles") === 1L)
    // snapshot diff over two arbitrary keyed frames
    val diff = graft.operators.Relational.snapshotDiff(
      Seq((1L, "a")).toDF("key", "p1"), Seq((1L, "b")).toDF("key", "p2"))
    assert(diff.collect()(0).getString(1) === "modified")
  }

  test("round-5 df-form surface on arbitrary DataFrames") {
    import spark.implicits._
    import graft.operators.{Events, Multimodal, Relational}
    // real image pipeline on a user id frame
    val imgs = Multimodal.decodeImages(
      Multimodal.imageTable(Seq(3L, 4L).toDF("doc_id"))).collect()
    assert(imgs.length === 2 && imgs.forall(_.width >= 16))
    // real audio pipeline likewise
    val wavs = Multimodal.decodeAudio(
      Multimodal.audioTable(Seq(3L).toDF("doc_id"))).collect()
    assert(wavs.head.sample_rate === 8000)
    // mixture sampling over arbitrary docs (two langs)
    val mixDocs = (0L until 200L).map(i =>
      (i, ("tok " * 40).trim, if (i % 4 == 0L) "small" else "big"))
      .toDF("doc_id", "text", "lang")
    val mix = Pipeline.mixTemperature(mixDocs).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(mix("small") >= mix("big"), "temperature must favor the small lang")
    // passage dedup over arbitrary docs
    val pd = Dedup.passageDedup(mixDocs, 10).collect()
    assert(pd.nonEmpty && pd.forall(_.getLong(2) <= pd.head.getLong(1)))
    // OHLC bars over an arbitrary tick frame
    val bars = Events.ohlcBars(Seq(
      (new java.sql.Timestamp(0L), 1L, "t", 4.0),
      (new java.sql.Timestamp(1000L), 2L, "t", 6.0))
      .toDF("ts", "event_id", "event_type", "value")).collect()
    assert(bars.length === 1 && bars.head.getDouble(2) === 4.0)
    // expectation checks over an arbitrary frame
    val ck = Relational.checkViolations(Seq(1.0, -1.0).toDF("v"),
      Seq("pos" -> (col("v") <= 0))).collect()
    assert(ck.head.getLong(1) === 1L)
    // ANN df forms self-size on a user corpus
    val emb = (0L until 64L).map(i =>
      (i, Array.tabulate(8)(d => if (d == (i % 8).toInt) 1.0 else 0.01)))
      .toDF("vec_id", "embedding")
    val ann = Similarity.ivfTopK(emb, col("vec_id") < 2, 3).collect()
    assert(ann.nonEmpty)
  }

  test("postings index build/append/lookup on an arbitrary docs DataFrame") {
    import graft.operators.TextOps
    val path = new java.io.File(graft.Engine.workDir("libapi-postings-"), "idx").getAbsolutePath
    TextOps.buildPostingsIndex(userDocs.where(org.apache.spark.sql.functions.col("doc_id") <= 2L), path)
    TextOps.appendPostingsIndex(userDocs.where(org.apache.spark.sql.functions.col("doc_id") > 2L), path)
    val hits = TextOps.lookupPostings(spark, path, "the", "fox").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // docs 1 and 2 contain "the" twice and "fox" once; 3/4 lack both
    assert(hits === Set((1L, 2L, 1L), (2L, 2L, 1L)))
    // a term only in the APPENDED slice is servable too
    val sorted = TextOps.lookupPostings(spark, path, "sorting", "tables").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(sorted === Set((3L, 1L, 1L)))
  }
}
