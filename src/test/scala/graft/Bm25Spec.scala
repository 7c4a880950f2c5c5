package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

class Bm25Spec extends SparkSuiteBase {

  test("q_bm25 (artifact-served) ≡ the direct corpus-scan reference") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2))
    val served = TextOps.bm25(spark, sf).collect().map(key)
    val direct = TextOps.bm25Direct(
      graft.sources.Tables(spark, sf, "documents"),
      TextOps.LookupTerms._1, TextOps.LookupTerms._2, TextOps.SearchK)
      .collect().map(key)
    assert(served.toSeq === direct.toSeq,
      "staged-artifact BM25 must rank identically to the direct form")
    assert(served.nonEmpty)
    // ranked: scores non-increasing, doc_id ascending within ties
    served.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
      case _ =>
    }
  }

  test("q_bm25_append: the append-maintained artifacts rank identically to the one-shot form") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2))
    val appended = TextOps.bm25Appended(spark, sf).collect().map(key)
    val oneShot = TextOps.bm25(spark, sf).collect().map(key)
    assert(appended.toSeq === oneShot.toSeq,
      "per-doc pure posting/dl rows over disjoint slices must reproduce the one-shot ranking")
    // the dl sidecar really was maintained by append (≥ 2 file groups)
    val (dlRoot, _) = TextOps.stagedAppendedDocLens(spark, sf)
    val parts = new java.io.File(dlRoot).listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(parts >= 2, s"expected base+delta part files, got $parts")
  }

  test("term-frequency saturation: the 50th occurrence is not 50× evidence") {
    import spark.implicits._
    // same doc length, tf 1 vs 50 of the query term; filler is neutral
    val docs = Seq(
      (1L, ("term " * 1 + "pad " * 59).trim),
      (2L, ("term " * 50 + "pad " * 10).trim)).toDF("doc_id", "text")
    val r = TextOps.bm25Direct(docs, "term", "absent", 10).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(2L) > r(1L), "more occurrences must still score higher")
    // linear scoring would put doc 2 at ~50× doc 1; BM25's asymptote is
    // (k1+1)·idf — the ratio must stay near that bound, far under 50×
    assert(r(2L).toDouble / r(1L) < 3.0,
      s"saturation failed: ${r(2L)} vs ${r(1L)}")
  }

  test("doc-length normalization: same tf, shorter doc ranks higher") {
    import spark.implicits._
    val docs = Seq(
      (1L, ("term " + "pad " * 9).trim),            // 10 tokens
      (2L, ("term " + "pad " * 99).trim),           // 100 tokens
      (3L, "unrelated filler words only here")).toDF("doc_id", "text")
    val r = TextOps.bm25Direct(docs, "term", "absent", 10).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) > r(2L),
      s"short doc must outrank long at equal tf: ${r(1L)} vs ${r(2L)}")
    assert(!r.contains(3L), "docs matching no term must not appear")
  }

  test("idf: at equal tf and dl, the rarer term's doc outranks the common term's") {
    import spark.implicits._
    // 'rare' appears in 1 doc, 'common' in 8; docs 1 and 2 are
    // structurally identical except which term they contain
    val base = (10L to 17L).map(i => (i, ("common " + "pad " * 9).trim))
    val docs = (Seq(
      (1L, ("rare " + "pad " * 9).trim),
      (2L, ("common " + "pad " * 9).trim)) ++ base).toDF("doc_id", "text")
    val r = TextOps.bm25Direct(docs, "rare", "common", 20).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) > r(2L), s"rare-term doc must outrank: ${r(1L)} vs ${r(2L)}")
  }

  test("q_bm25 plan: pruned artifact read, no corpus scan of documents") {
    val df = TextOps.bm25(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [bucket"),
      s"postings scan must keep its static bucket pruning:\n$plan")
    assert(!plan.contains("documents.parquet"),
      s"BM25 serve path must not scan the documents table:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be TakeOrderedAndProject, not a full sort:\n$plan")
  }

  test("hybridRrf: integer fusion law, rank sentinels, and the both-lists dominance guarantee") {
    val out = graft.operators.TextOps.hybridRrf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length === graft.operators.TextOps.HybridK)
    val c = graft.operators.TextOps.RrfC
    out.foreach { case (id, br, cr, rrf) =>
      assert(br >= 0L && br <= graft.operators.TextOps.SearchK, s"doc $id")
      assert(cr >= 0L && cr <= graft.operators.TextOps.SearchK, s"doc $id")
      assert(br > 0L || cr > 0L, s"doc $id in neither list")
      val exp = (if (br == 0L) 0L else 1000000L / (c + br)) +
        (if (cr == 0L) 0L else 1000000L / (c + cr))
      assert(rrf === exp, s"doc $id fusion law")
    }
    // with C = 60 and 25-deep lists, ANY doc in both lists beats ANY
    // single-list doc: 2·(10⁶ div 85) = 23528 > 10⁶ div 61 = 16393 —
    // the no-calibration guarantee that makes RRF the fusion default
    val both = out.filter(t => t._2 > 0L && t._3 > 0L).map(_._4)
    val single = out.filter(t => t._2 == 0L || t._3 == 0L).map(_._4)
    if (both.nonEmpty && single.nonEmpty)
      assert(both.min > single.max)
    // descending total order
    assert(out.map(_._4).toSeq === out.map(_._4).sortBy(-_).toSeq)
  }
}
