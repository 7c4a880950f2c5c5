package graft

import graft.operators.{Evaluation, TextOps}
import org.apache.spark.sql.functions.col

class EvaluationSpec extends SparkSuiteBase {

  test("ndcgAtK: separated clusters score 1.0, a singleton label scores 0") {
    import spark.implicits._
    // two tight 12-vector clusters on orthogonal axes (every top-10
    // neighbor shares the query's label, R = 11 ≥ 10 → NDCG exactly 1)
    // plus one singleton label on a third axis (R = 0 → IDCG 0 → 0).
    val emb =
      ((0 until 12).map(i => (i.toLong,
          Array(1f, 0f, 0f, 0.01f * i), 1)) ++
       (0 until 12).map(i => (100L + i,
          Array(0f, 1f, 0f, 0.01f * i), 2)) ++
       Seq((900L, Array(0f, 0f, 1f, 0f), 3)))
        .toDF("vec_id", "embedding", "label")
    val out = Evaluation.ndcgAtK(emb).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out.size === 25)
    out.foreach { case (id, (dcg, idcg, ndcg)) =>
      if (id == 900L) {
        assert(dcg === 0L && idcg === 0L && ndcg === 0L)
      } else {
        assert(dcg === Evaluation.NdcgCum.last, s"vec $id dcg $dcg")
        assert(idcg === Evaluation.NdcgCum.last)
        assert(ndcg === 1000000L, s"vec $id ndcg $ndcg")
      }
    }
  }

  test("ndcgAtK: known mixed ranking reproduces the hand-computed DCG") {
    import spark.implicits._
    // query 0 (label 1): one same-label partner at rank 1 (cos ≈ .995),
    // ten label-2 vectors at ranks 2-11 (cos ≈ .447) push the second
    // label-1 partner (cos ≈ .316) OUT of the top-10 — so DCG = w1
    // alone while R = 2 keeps IDCG = cum(2): NDCG is a strict,
    // hand-checkable fraction exercising the integer division.
    val emb =
      (Seq((0L, Array(1f, 0f, 0f, 0f), 1),
           (1L, Array(1f, 0.1f, 0f, 0f), 1),
           (2L, Array(1f, 3f, 0f, 0f), 1)) ++
       (0 until 10).map(i => (10L + i,
          Array(0.5f, 0f, 1f, 0.01f * i), 2)))
        .toDF("vec_id", "embedding", "label")
    val row0 = Evaluation.ndcgAtK(emb).where(col("vec_id") === 0L).head()
    val expDcg = Evaluation.NdcgW(0)
    assert(row0.getLong(2) === expDcg)
    assert(row0.getLong(3) === Evaluation.NdcgCum(2))
    assert(row0.getLong(4) === 1000000L * expDcg / Evaluation.NdcgCum(2))
    assert(row0.getLong(4) === 613147L) // 10¹² div 1630930
  }

  test("ndcgAtK declared form: one row per vector, 0 ≤ dcg ≤ idcg ≤ cum(10)") {
    val out = Evaluation.ndcgAtK(spark, sf).collect()
    val n = graft.sources.Tables(spark, sf, "embeddings").count()
    assert(out.length.toLong === n)
    out.foreach { r =>
      val (dcg, idcg, ndcg) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(dcg >= 0L && dcg <= idcg, s"vec ${r.getLong(0)}: $dcg > $idcg")
      assert(idcg <= Evaluation.NdcgCum.last)
      assert(ndcg >= 0L && ndcg <= 1000000L)
      assert(ndcg === (if (idcg == 0L) 0L else 1000000L * dcg / idcg))
    }
  }

  test("confusionBody: hand-computed confusion matrix with a never-predicted class") {
    import spark.implicits._
    val pred = Seq(
      (1, 1), (1, 1), (1, 2),   // class 1: 2 right, 1 predicted as 2
      (2, 2), (2, 1),           // class 2: 1 right, 1 predicted as 1
      (3, 3),                   // class 3: perfect
      (4, 1))                   // class 4: never predicted
      .toDF("label", "predicted")
    val out = Evaluation.confusionBody(pred).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    // class 1: tp=2, fp=2 ((2,1),(4,1)), fn=1, support=3
    assert(out(1) === ((2L, 2L, 1L, 3L,
      2000000L / 4, 2000000L / 3, 4000000L / 7)))
    // class 2: tp=1, fp=1, fn=1, support=2
    assert(out(2) === ((1L, 1L, 1L, 2L, 500000L, 500000L, 500000L)))
    // class 3: perfect
    assert(out(3) === ((1L, 0L, 0L, 1L, 1000000L, 1000000L, 1000000L)))
    // class 4: tp=0, never predicted → guarded zeros, fn=support=1
    assert(out(4) === ((0L, 0L, 1L, 1L, 0L, 0L, 0L)))
  }

  test("confusion declared form: supports partition the corpus, fp/fn ≥ 0") {
    val out = Evaluation.confusion(spark, sf).collect()
    val n = graft.sources.Tables(spark, sf, "embeddings").count()
    assert(out.map(_.getLong(4)).sum === n)
    // Σfp = Σfn = total misclassified (each error is one class's fp
    // and another's fn)
    assert(out.map(_.getLong(2)).sum === out.map(_.getLong(3)).sum)
    out.foreach { r =>
      assert(r.getLong(1) >= 0L && r.getLong(2) >= 0L && r.getLong(3) >= 0L)
      assert(r.getLong(1) + r.getLong(3) === r.getLong(4)) // tp + fn = support
      Seq(5, 6, 7).foreach(i =>
        assert(r.getLong(i) >= 0L && r.getLong(i) <= 1000000L))
    }
  }

  private def aucOf(rows: Seq[(String, Double)]): Map[String, Double] = {
    import spark.implicits._
    Evaluation.aucByType(rows.toDF("event_type", "value"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
  }

  test("aucByType: perfect separation is 1.0, reversal 0.0, all-tied 0.5") {
    val perfect = aucOf(Seq(
      "pos" -> 9.0, "pos" -> 8.0, "pos" -> 7.0,
      "neg" -> 3.0, "neg" -> 2.0, "neg" -> 1.0))
    assert(perfect("pos") === 1.0)
    assert(perfect("neg") === 0.0)
    // a single shared score: every comparison is a tie, midranks give exactly 1/2
    val tied = aucOf(Seq("a" -> 5.0, "a" -> 5.0, "b" -> 5.0, "b" -> 5.0))
    assert(tied("a") === 0.5 && tied("b") === 0.5)
  }

  test("aucByType equals the O(n²) pairwise definition on random tied data") {
    val rnd = new scala.util.Random(417)
    for (trial <- 1 to 10) {
      // small score alphabet → heavy ties, the case midranks exist for
      val rows = Seq.fill(30 + rnd.nextInt(40))(
        (if (rnd.nextBoolean()) "p" else "q", rnd.nextInt(8) * 0.25))
      val got = aucOf(rows)
      for (t <- Seq("p", "q") if got.contains(t)) {
        val pos = rows.filter(_._1 == t).map(_._2)
        val neg = rows.filter(_._1 != t).map(_._2)
        val pairs = for (p <- pos; n <- neg)
          yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0
        val ref = pairs.sum / (pos.size * neg.size)
        assert(math.abs(got(t) - ref) < 1e-12,
          s"trial $trial type $t: got ${got(t)} ref $ref")
      }
    }
  }

  test("aucByType declared form: 5 one-vs-rest rows, counts partition N") {
    val out = Evaluation.aucByType(spark, sf).collect()
    assert(out.length === 5)
    val n = graft.sources.Tables(spark, sf, "events")
      .where(col("value").isNotNull).count()
    out.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) === n)
      val auc = r.getDouble(3)
      assert(auc >= 0.0 && auc <= 1.0, s"${r.getString(0)}: $auc")
      // value is noise w.r.t. event_type in the fixture — AUC near 1/2
      assert(math.abs(auc - 0.5) < 0.2, s"${r.getString(0)}: $auc")
    }
  }

  test("chi2Terms: a perfectly language-exclusive term scores χ² = N and ranks first") {
    import spark.implicits._
    // 4 docs of lang A all contain "shibboleth"; 12 others never do.
    // Perfect association: a=4, b=0, c=0, d=12 → χ² = N = 16.
    val docs = ((1 to 4).map(i => (i.toLong, s"shibboleth filler$i common", "A")) ++
      (5 to 16).map(i => (i.toLong, s"filler$i common", "B")))
      .toDF("doc_id", "text", "lang")
    val out = TextOps.chi2Terms(docs, 3, 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))
    val top = out.filter(t => t._1 == "A" && t._6 == 1L).head
    assert(top._2 === "shibboleth")
    assert(top._3 === 4L && top._4 === 4L)
    assert(top._5 === 16.0)
    // "common" is in every doc → zero signal, excluded by the df < N cut
    assert(!out.exists(_._2 == "common"))
  }

  test("chi2Terms declared form: ≤ topK per language, positive association, rank total order") {
    val out = graft.operators.TextOps.chi2Terms(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))
    val langs = graft.sources.Tables(spark, sf, "documents")
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(out.map(_._1).toSet.subsetOf(langs))
    out.groupBy(_._1).foreach { case (lang, rows) =>
      assert(rows.length <= TextOps.Chi2TopK)
      assert(rows.map(_._6).sorted.toSeq === (1L to rows.length).toSeq, lang)
      // ranks follow (χ² desc, term asc)
      val sorted = rows.sortBy(_._6)
      sorted.sliding(2).foreach {
        case Array(hi, lo) =>
          assert(hi._5 > lo._5 || (hi._5 == lo._5 && hi._2 < lo._2), lang)
        case _ =>
      }
    }
    out.foreach { t =>
      assert(t._5 > 0.0)
      assert(t._3 >= 1L && t._3 <= t._4 && t._4 >= TextOps.Chi2MinDf)
    }
  }

  test("bootstrapMeans: deterministic resamples, Poisson mass near n, means near the true mean") {
    import spark.implicits._
    val n = 2000
    val ev = (1 to n).map(i => (i.toLong, (i % 100).toDouble))
      .toDF("event_id", "value")
    val out = Evaluation.bootstrapMeans(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
    assert(out.map(_._1).sorted.toSeq === (0L until Evaluation.BootR.toLong))
    // Σm per resample is Poisson(n): within 5σ = 5√n of n
    out.foreach { case (r, (nEff, _, _)) =>
      assert(math.abs(nEff - n) <= 5 * math.sqrt(n).toLong + 1, s"resample $r: $nEff")
    }
    // true mean = 49.5... cents → 4950.25? mean of (i % 100)*100 cents
    val trueMicro = ev.agg(org.apache.spark.sql.functions.avg(
      org.apache.spark.sql.functions.round($"value" * 100))).head().getDouble(0) * 1e6 / 1e0
    val means = out.map(_._2._3.toDouble)
    val grand = means.sum / means.length
    assert(math.abs(grand - trueMicro) / trueMicro < 0.02,
      s"grand mean $grand vs $trueMicro")
    // pure function of (row, resample): a second run is bit-identical
    val again = Evaluation.bootstrapMeans(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
    assert(out.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  test("abTest: hand-computed Welch t on crafted groups; sign follows mean(ta) − mean(tb)") {
    import spark.implicits._
    // a: cents {900, 1000, 1100, 1000} → mean 1000, var 20000/3
    // b: cents {500, 500, 700, 700}   → mean 600,  var 40000/3
    // t = 400 / √((20000/3)/4 + (40000/3)/4) = 400/√5000 = 5.656854…
    val ev = Seq(("a", 9.0), ("a", 10.0), ("a", 11.0), ("a", 10.0),
      ("b", 5.0), ("b", 5.0), ("b", 7.0), ("b", 7.0))
      .toDF("event_type", "value")
    val r = Evaluation.abTest(ev).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getString(0) === "a" && row.getString(1) === "b")
    assert(row.getDouble(4) === 1000.0 && row.getDouble(5) === 600.0)
    assert(math.abs(row.getDouble(6) - 400.0 / math.sqrt(5000.0)) < 1e-12)
    assert(row.getDouble(6) > 0, "sign convention: mean(a) > mean(b) → t > 0")
  }

  test("q_ab_test declared form: all type pairs, finite t, symmetric-in-magnitude sanity") {
    val out = Evaluation.abTest(spark, sf).collect()
    assert(out.length === 10) // C(5,2) pairs
    out.foreach { r =>
      assert(!r.getDouble(6).isNaN && !r.getDouble(6).isInfinite)
      assert(r.getLong(2) >= 2L && r.getLong(3) >= 2L)
      // value is noise w.r.t. type in the fixture — |t| should be small
      assert(math.abs(r.getDouble(6)) < 5.0,
        s"${r.getString(0)} vs ${r.getString(1)}: t=${r.getDouble(6)}")
    }
  }
}
