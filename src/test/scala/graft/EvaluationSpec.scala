package graft

import graft.operators.{Evaluation, TextOps}
import org.apache.spark.sql.functions.col

class EvaluationSpec extends SparkSuiteBase {

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
}
