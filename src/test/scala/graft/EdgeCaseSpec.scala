package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Pipeline, TextOps}

/** Degenerate-input behavior: empty corpora and empty/whitespace-only
  * documents must flow through the operators with stable schemas and
  * the explicitly-defined guard values (no NULL/NaN leaking through
  * quality gates — the r2 ADVICE divide-by-zero finding, pinned). */
class EdgeCaseSpec extends SparkSuiteBase {

  private def docsOf(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang")
  }

  private val empty = docsOf(Nil)

  test("empty corpus: text/dedup/sample operators return empty, schema intact") {
    assert(TextOps.wordCount(empty).collect().isEmpty)
    assert(TextOps.qualityScore(empty).collect().isEmpty)
    assert(TextOps.qualityScore(empty).columns.toSeq ===
      Seq("doc_id", "n_tok", "avg_tok_len", "stop_ratio", "alpha_ratio", "score"))
    assert(Dedup.minhashLsh(empty).collect().isEmpty)
    assert(Dedup.dedupNear(empty).collect().isEmpty)
    assert(Pipeline.hashSample(empty, 10).collect().isEmpty)
    assert(Pipeline.curate(empty).collect().isEmpty)
  }

  test("empty corpus: round-4 text/pipeline operators return empty, schema intact") {
    assert(TextOps.repetition(empty).collect().isEmpty)
    assert(TextOps.repetition(empty).columns.toSeq ===
      Seq("doc_id", "n_tok", "n_types", "dup_ratio", "top_tok_ratio"))
    assert(TextOps.tfidfTopTerms(empty, 3).collect().isEmpty)
    assert(Pipeline.decontaminate(empty, 97, 4).collect().isEmpty)
  }

  test("empty events: sessionize and cdc compact return empty, schema intact") {
    import spark.implicits._
    val noEvents = Seq.empty[(Long, java.sql.Timestamp, Long, String, Double)]
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(graft.operators.Windows.sessionize(noEvents, 1000L).collect().isEmpty)
    assert(graft.operators.Windows.sessionize(noEvents, 1000L).columns.toSeq ===
      Seq("user_id", "sid", "start_us", "n_events", "sum_v"))
    assert(graft.operators.Relational.cdcCompact(noEvents).collect().isEmpty)
  }

  test("decontaminate: corpus whose docs are ALL benchmark docs yields empty train") {
    val onlyBench = docsOf(Seq((0L, "a b c d e f", "en")))
    assert(Pipeline.decontaminate(onlyBench, 97, 4).collect().isEmpty)
  }

  test("empty and whitespace-only docs score 0.0 and gate as low-quality") {
    val docs = docsOf(Seq(
      (1L, "", "en"),
      (2L, "   \t  \n ", "en"),
      (3L, "the quick brown fox jumps over the lazy dog and is of sound mind " * 3, "en")))
    val q = TextOps.qualityScore(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    Seq(1L, 2L).foreach { id =>
      val r = q(id)
      assert(r.getLong(1) === 0L, s"doc $id n_tok")
      assert(r.getDouble(2) === 0.0 && r.getDouble(3) === 0.0 &&
        r.getDouble(4) === 0.0, s"doc $id ratios must be 0.0, not null/NaN")
      assert(r.getDouble(5) === 0.0, s"doc $id score")
    }
    assert(q(3L).getDouble(5) > 0.5)
    // the curation gate classifies the degenerate docs as lowq, not kept
    val ledger = Pipeline.curate(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(ledger("en")._2 === 2L, "empty docs must count as lowq")
    assert(ledger("en")._1 === 1L)
  }

  test("single-doc corpus: pair-based dedup yields no pairs, keeps the doc") {
    val one = docsOf(Seq((7L, "only one document here", "en")))
    assert(Dedup.minhashLsh(one).collect().isEmpty)
    assert(Dedup.dedupNear(one).collect().map(_.getLong(0)).toSeq === Seq(7L))
  }

  test("empty inputs: round-4 batch operators return empty, schema intact") {
    import spark.implicits._
    val r = graft.operators.Relational
    val noPts = Seq.empty[(Double, java.sql.Date)].toDF("price", "odate")
    assert(r.skyline(noPts).collect().isEmpty)
    assert(r.skyline(noPts).columns.toSeq === Seq("price", "odate", "n_dups"))
    val noVals = Seq.empty[(Long, Double)].toDF("id", "v")
    assert(r.equiDepth(noVals, 10, 8).collect().isEmpty)
    assert(r.equiDepth(noVals, 10, 8).columns.toSeq ===
      Seq("bucket", "cnt", "lo_v", "hi_v", "sum_v"))
    assert(Pipeline.weightedSample(noVals.toDF("id", "w"), 5).collect().isEmpty)
    assert(TextOps.collocations(empty, 2L).collect().isEmpty)
    assert(TextOps.ngramDocFreq(empty, 2L).collect().isEmpty)
    assert(Dedup.containmentPairs(empty, 0.5).collect().isEmpty)
    val bpe = TextOps.bpeLearn(spark, empty, 4)
    assert(bpe.collect().isEmpty)
    assert(bpe.columns.toSeq === Seq("rank", "left", "right", "pair_count"))
  }

  test("edgeless graph: triangles report zero counts without NaN poisoning integers") {
    import spark.implicits._
    val noEdges = Seq.empty[(Long, Long)].toDF("u", "v")
    val row = graft.operators.Graphs.triangles(noEdges).collect()(0)
    assert(row.getLong(0) === 0L && row.getLong(1) === 0L)
    assert(row.getLong(3) === 0L)
    // n_wedges is an empty SUM → NULL; clustering = 3·0/NULL → NULL.
    // Both documented: a caller sees "no wedges", never a NaN.
    assert(row.isNullAt(2) && row.isNullAt(4))
  }

  test("empty inputs: round-6 operators return empty, schema intact") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // BPE encode of an empty corpus: no words, empty vocab, empty out
    val enc = TextOps.bpeEncode(spark, empty, Seq.empty[(String, String)])
    assert(enc.collect().isEmpty)
    assert(enc.columns.toSeq === Seq("doc_id", "n_words", "n_tokens", "token_ids"))
    // keepBest with no components: every doc is its own canonical
    val solo = Dedup.keepBest(
      Seq((7L, 42L)).toDF("doc_id", "n_chars"),
      Seq.empty[(Long, Long)].toDF("doc_id", "comp")).collect()
    assert(solo.map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq ===
      Seq((7L, 7L, true)))
    // semantic dedup over an empty vector frame: empty out, no fit crash
    val noVecs = Seq.empty[(Long, Seq[Double], Double)].toDF("vec_id", "e", "nrm")
    assert(Dedup.semanticDedup(noVecs, Array(Array(0.0, 0.0)), 0.9)
      .collect().isEmpty)
  }

  test("empty inputs: round-5 operators return empty or zero, never NULL counts") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    assert(Pipeline.mixTemperature(empty).collect().isEmpty)
    assert(Dedup.passageDedup(empty, 10).collect().isEmpty)
    val noTicks = Seq.empty[(java.sql.Timestamp, Long, String, Double)]
      .toDF("ts", "event_id", "event_type", "value")
    assert(graft.operators.Events.ohlcBars(noTicks).collect().isEmpty)
    // an empty table has ZERO violations, not NULL ones
    val ck = graft.operators.Relational.checkViolations(
      Seq.empty[Double].toDF("v"), Seq("pos" -> (col("v") <= 0))).collect()
    assert(ck.length === 1 && ck.head.getLong(1) === 0L)
    val orph = graft.operators.Relational.orphanCount("fk",
      Seq.empty[Long].toDF("a"), "a", Seq.empty[Long].toDF("b"), "b").collect()
    assert(orph.head.getLong(1) === 0L)
    // short-doc corpus: no full passage, no rows (not a crash)
    assert(Dedup.passageDedup(
      Seq((1L, "too short")).toDF("doc_id", "text"), 10).collect().isEmpty)
    // media pipelines on an empty id frame: empty out, no codec crash
    val noIds = Seq.empty[Long].toDF("doc_id")
    assert(graft.operators.Multimodal.decodeImages(
      graft.operators.Multimodal.imageTable(noIds)).collect().isEmpty)
    assert(graft.operators.Multimodal.decodeAudio(
      graft.operators.Multimodal.audioTable(noIds)).collect().isEmpty)
    assert(graft.operators.Multimodal.sampleVideoFrames(
      graft.operators.Multimodal.videoTable(noIds)).collect().isEmpty)
  }
}
