package graft

import graft.operators.Incremental
import graft.sources.Tables
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSuiteBase {

  private def key(r: Row) =
    (r.getDate(0).toString, r.getString(1), r.getLong(2), r.getLong(3))

  test("incremental rollup ≡ full recompute bit-for-bit (BIGINT partials)") {
    val merged = Incremental.incrAgg(spark, sf).collect().map(key).toSet
    val full = Tables(spark, sf, "orders")
      .groupBy(
        to_date(date_trunc("month", col("o_orderdate"))).as("month"),
        col("o_orderstatus"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"),
        count(lit(1)).as("cnt"))
      .collect().map(key).toSet
    assert(merged === full)
  }

  test("state genuinely excludes the append window; merge covers every row exactly once") {
    val (root, cut) = Incremental.stagedAggState(spark, sf)
    val state = spark.read.parquet(s"$root/state")
    // no state group may touch the delta window: every state month is
    // strictly before the cut's month
    val cutMonth = cut.toLocalDateTime.toLocalDate.withDayOfMonth(1)
    state.select("month").collect().foreach { r =>
      assert(!r.getDate(0).toLocalDate.isAfter(cutMonth),
        s"state month ${r.getDate(0)} reaches past the cut month $cutMonth")
    }
    // row conservation: state counts + delta rows = all orders
    val stateCnt = state.agg(sum("cnt")).head().getLong(0)
    val orders = Tables(spark, sf, "orders")
    val deltaCnt = orders.where(col("o_orderdate") >= lit(cut)).count()
    assert(stateCnt + deltaCnt === orders.count(),
      "base/delta split must partition the table")
    assert(deltaCnt > 0, "the append window must be non-empty at this SF")
  }

  test("advanceState publishes a state the rollup is servable from alone") {
    val next = Incremental.advanceState(spark, sf)
    // the advanced artifact re-aggregated (it is already at final
    // grain, but re-agg proves idempotence) ≡ full recompute
    val advanced = spark.read.parquet(next)
      .groupBy("month", "o_orderstatus")
      .agg(sum("total_cents").as("total_cents"), sum("cnt").as("cnt"))
      .collect().map(key).toSet
    val full = Incremental.incrAgg(spark, sf).collect().map(key).toSet
    assert(advanced === full,
      "state ∪ delta folded into the artifact must equal the live merge")
    // stage-and-swap: the original state is untouched beside it
    val (root, _) = Incremental.stagedAggState(spark, sf)
    assert(next != s"$root/state" &&
      spark.read.parquet(s"$root/state").count() > 0)
  }

  test("multi-generation folds compose: state·D1 then ·D2 ≡ one-shot merge ≡ full recompute") {
    val (root, cut) = Incremental.stagedAggState(spark, sf)
    val state = spark.read.parquet(s"$root/state")
    val mid = java.sql.Timestamp.valueOf(
      cut.toLocalDateTime.plusDays(Incremental.DeltaDays.toLong / 2))
    val orders = Tables(spark, sf, "orders")
    val d1 = orders.where(col("o_orderdate") >= lit(cut) && col("o_orderdate") < lit(mid))
    val d2 = orders.where(col("o_orderdate") >= lit(mid))
    assert(d1.count() > 0 && d2.count() > 0, "both generations must be non-empty")
    val twoGen = Incremental.foldBatch(Incremental.foldBatch(state, d1), d2)
      .collect().map(key).toSet
    val oneShot = Incremental.incrAgg(spark, sf).collect().map(key).toSet
    assert(twoGen === oneShot,
      "any refresh cadence must land on the same rollup (associative partials)")
  }

  test("incremental word count ≡ the flagship word count bit-for-bit; delta-bounded plan") {
    val merged = Incremental.incrWordCount(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val full = graft.operators.TextOps.wordCount(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(merged === full)
    val plan = Incremental.incrWordCount(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft-wcstate-"),
      s"expected the persisted word state in the plan:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("doc_id"),
      s"delta docs scan must push the id predicate:\n$plan")
    val docScans = "documents\\.parquet".r.findAllIn(plan).length
    assert(docScans === 1,
      s"expected exactly one (delta) documents scan, found $docScans:\n$plan")
  }

  test("incremental HLL sketch ≡ the one-shot sketch bit-for-bit; delta-bounded plan") {
    val merged = Incremental.incrDistinct(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val full = graft.operators.Relational.approxDistinctDet(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(merged === full,
      "register max-merge must land on the full-corpus sketch exactly")
    val plan = Incremental.incrDistinct(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft-hllstate-"),
      s"expected the persisted register state in the plan:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("l_orderkey"),
      s"delta lineitem scan must push the key predicate:\n$plan")
    val liScans = "lineitem\\.parquet".r.findAllIn(plan).length
    assert(liScans === 1,
      s"expected exactly one (delta) lineitem scan, found $liScans:\n$plan")
  }

  test("incremental inverted index ≡ the one-shot index bit-for-bit; delta-bounded plan") {
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(keyed(Incremental.incrInverted(spark, sf))
      === keyed(graft.operators.TextOps.invertedIndex(spark, sf)))
    val plan = Incremental.incrInverted(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft-idxstate-"),
      s"expected the persisted index state in the plan:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("doc_id"),
      s"delta docs scan must push the id predicate:\n$plan")
    val docScans = "documents\\.parquet".r.findAllIn(plan).length
    assert(docScans === 1,
      s"expected exactly one (delta) documents scan, found $docScans:\n$plan")
  }

  test("capped-postings merge law on crafted slices: cap-straddling, sub-cap, delta-only terms") {
    import spark.implicits._
    val cap = graft.operators.TextOps.PostingsCap
    // base: "a" in cap+8 docs (state list capped), "b" in 10;
    // delta (ids ≥ 1000): more "a", 5 more "b", and new term "c"
    val base = ((1L to (cap + 8).toLong).map(i => (i, "a")) ++
      (101L to 110L).map(i => (i, "b"))).toDF("doc_id", "text")
    val delta = ((1000L to 1004L).map(i => (i, "a b")) :+ (1005L, "c")).toDF("doc_id", "text")
    val folded = graft.operators.TextOps.finishIndex(
      Incremental.foldIndex(
        graft.operators.TextOps.indexPartials(base),
        graft.operators.TextOps.indexPartials(delta)))
    val oneShot = graft.operators.TextOps.invertedIndex(base.unionByName(delta))
    assert(folded.collect().toSeq.map(_.toSeq) === oneShot.collect().toSeq.map(_.toSeq))
    val got = folded.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(3)))).toMap
    assert(got("a")._1 === (cap + 13).toLong)
    assert(got("a")._2 === (1L to cap.toLong).mkString(","), "capped list must not grow")
    assert(got("b")._2 === ((101L to 110L) ++ (1000L to 1004L)).mkString(","),
      "sub-cap lists must extend across the fold")
    assert(got("c") === ((1L, "1005")), "delta-only terms must appear")
  }

  test("incremental top-k ≡ the one-shot ranked aggregate bit-for-bit; delta-bounded plan") {
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(keyed(Incremental.incrTopk(spark, sf))
      === keyed(graft.operators.Relational.groupTopK(spark, sf)),
      "folded ranked state must land on the full-corpus top-k")
    val plan = Incremental.incrTopk(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft-topkstate-"),
      s"expected the persisted ranked state in the plan:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("o_orderdate"),
      s"delta orders scan must push the date predicate:\n$plan")
    val ordScans = "orders\\.parquet".r.findAllIn(plan).length
    assert(ordScans === 1,
      s"expected exactly one (delta) orders scan, found $ordScans:\n$plan")
  }

  test("seeded random corpora × random cuts: folds ≡ one-shot (wordcount, inverted index)") {
    import spark.implicits._
    import graft.operators.TextOps
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val n = 50 + rnd.nextInt(150)
      val vocab = (1 to (2 + rnd.nextInt(30))).map(i => s"w$i")
      val docs = (0L until n.toLong).map { i =>
        (i, Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }.toDF("doc_id", "text")
      val cut = 1 + rnd.nextInt(n - 1)
      val base = docs.where(col("doc_id") < cut)
      val delta = docs.where(col("doc_id") >= cut)
      def wcSet(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(wcSet(TextOps.wordCountPartials(base)
          .unionByName(TextOps.wordCountPartials(delta))
          .groupBy("word").agg(sum("cnt").as("cnt")))
        === wcSet(TextOps.wordCountPartials(docs)),
        s"wordcount fold diverged at n=$n cut=$cut")
      val idxFold = TextOps.finishIndex(Incremental.foldIndex(
        TextOps.indexPartials(base), TextOps.indexPartials(delta)))
      assert(idxFold.collect().map(_.toSeq).toSeq
        === TextOps.invertedIndex(docs).collect().map(_.toSeq).toSeq,
        s"inverted-index fold diverged at n=$n cut=$cut")
    }
  }

  test("advanced index state serves the full index alone (stage-and-swap update half)") {
    val next = Incremental.advanceIndexState(spark, sf)
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(keyed(graft.operators.TextOps.finishIndex(spark.read.parquet(next)))
      === keyed(graft.operators.TextOps.invertedIndex(spark, sf)))
  }

  test("re-folding an overlapping batch is idempotent: registers are a max-lattice") {
    // fold the delta registers in TWICE — a crash-retry / overlapping
    // refresh scenario; exact-partial incrementals would double-count,
    // the sketch must not move (max is idempotent)
    val (root, cut) = Incremental.stagedHllState(spark, sf)
    val delta = Tables(spark, sf, "lineitem").where(col("l_orderkey") >= cut)
    val deltaRegs = graft.operators.Relational.hllRegisters(delta)
    val twice = spark.read.parquet(s"$root/state")
      .unionByName(deltaRegs).unionByName(deltaRegs)
      .groupBy("l_returnflag", "bucket").agg(max("mj").as("mj"))
    val est = graft.operators.Relational.hllEstimate(twice).collect()
      .map(r => (r.getString(0), r.getLong(3))).toSet
    val once = Incremental.incrDistinct(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(3))).toSet
    assert(est === once)
  }

  test("merge plan is delta-bounded: state artifact scan + pushed-date orders scan only") {
    val plan = Incremental.incrAgg(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft-aggstate-"),
      s"expected the persisted state artifact in the plan:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("o_orderdate"),
      s"delta scan must push the date predicate to parquet:\n$plan")
    // exactly one orders scan (the delta); the base facts are never re-read
    val ordersScans = "orders\\.parquet".r.findAllIn(plan).length
    assert(ordersScans === 1,
      s"expected exactly one (delta) orders scan, found $ordersScans:\n$plan")
  }

  test("incremental join view ≡ the full aggregated join bit-for-bit") {
    import org.apache.spark.sql.functions._
    val got = graft.operators.Incremental.incrJoin(spark, sf).collect()
      .map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2)))).toMap
    val full = graft.sources.Tables(spark, sf, "orders")
      .join(graft.sources.Tables(spark, sf, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(to_date(date_trunc("month", col("o_orderdate"))).as("month"))
      .agg(sum(expr(
        "cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)"))
        .as("rc"), count(lit(1)).as("nl"))
      .collect().map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === full)
  }

  test("join-view delta expansion: all three cross terms are genuinely non-empty") {
    import org.apache.spark.sql.functions._
    // the two clocks are independent — an old order shipping late and a
    // new order shipping at once must both exist, or the three-term
    // identity degenerates to a one-sided append
    val o = graft.sources.Tables(spark, sf, "orders")
    val l = graft.sources.Tables(spark, sf, "lineitem")
    // the same 90-day arrival convention the operators use
    val cutO = java.sql.Timestamp.valueOf(
      o.agg(max("o_orderdate")).head().getTimestamp(0)
        .toLocalDateTime.minusDays(graft.operators.Incremental.DeltaDays.toLong))
    val cutL = graft.operators.Incremental.lineitemDeltaCut(spark, sf)
    def cnt(ords: org.apache.spark.sql.DataFrame,
            lines: org.apache.spark.sql.DataFrame): Long =
      ords.join(lines, col("o_orderkey") === col("l_orderkey")).count()
    val dAB = cnt(o.where(col("o_orderdate") >= lit(cutO)),
      l.where(col("l_shipdate") < lit(cutL)))
    val AdB = cnt(o.where(col("o_orderdate") < lit(cutO)),
      l.where(col("l_shipdate") >= lit(cutL)))
    val dAdB = cnt(o.where(col("o_orderdate") >= lit(cutO)),
      l.where(col("l_shipdate") >= lit(cutL)))
    assert(dAB > 0L, "new orders with already-shipped lines")
    assert(AdB > 0L, "old orders with late-shipping lines")
    assert(dAdB > 0L, "new orders shipping within the window")
  }

  test("incremental join view: base facts broadcast-join the deltas, never a base⋈base shuffle") {
    val plan = graft.operators.Incremental.incrJoin(spark, sf)
      .queryExecution.executedPlan.toString
    // three delta terms → three broadcast joins; no sort-merge join
    // (a base⋈base join would be one at these sizes)
    assert("BroadcastHashJoin".r.findAllIn(plan).size === 3, plan.take(800))
    assert(!plan.contains("SortMergeJoin"), "base-sized join leaked in")
    // both base scans carry their pushed date predicates
    assert(plan.contains("o_orderdate") && plan.contains("l_shipdate"))
    assert(plan.contains("PushedFilters"))
  }
}
