package graft

import java.sql.Timestamp
import graft.operators.Joins

class JoinsSpec extends SparkSuiteBase {

  test("broadcast join plans a BroadcastHashJoin (no shuffle of customer)") {
    val plan = Joins.broadcastJoin(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"plan:\n$plan")
  }

  test("runtime bloom filter prunes the probe side of a shuffle join") {
    // The 100 TB shuffle-reduction path: when a selective dim filter
    // feeds a SHUFFLE join, Catalyst's InjectRuntimeFilter builds a
    // bloom filter from the dim keys and applies it to the fact scan
    // BEFORE the shuffle — rows that cannot join never leave the map
    // side. Size thresholds are production-tuned; they are lowered here
    // only to exercise the rule at test scale.
    import org.apache.spark.sql.functions._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force shuffle join
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = graft.sources.Tables(spark, sf, "lineitem")
        .select("l_suppkey", "l_quantity")
      val dim = graft.sources.Tables(spark, sf, "supplier")
        .where(col("s_acctbal") > 9000.0) // selective
        .select("s_suppkey")
      val joined = fact.join(dim, col("l_suppkey") === col("s_suppkey"))
      val opt = joined.queryExecution.optimizedPlan.toString
      assert(opt.contains("bloom_filter") || opt.contains("might_contain"),
        s"no runtime bloom filter injected:\n$opt")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("declared bloom join: filter injected into the frozen plan, confs restored, results exact") {
    import org.apache.spark.sql.functions._
    val before = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    val df = Joins.bloomJoin(spark, sf)
    assert(spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold") === before,
      "bloomJoin must restore session confs")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("bloom_filter") || opt.contains("might_contain"),
      s"no runtime bloom filter in declared plan:\n$opt")
    val want = graft.sources.Tables(spark, sf, "lineitem")
      .join(graft.sources.Tables(spark, sf, "supplier")
        .where(col("s_acctbal") > 5000.0),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey").cast("long"))
      .agg(round(sum("l_quantity"), 2), count(lit(1)))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val got = df.collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(got === want)
    assert(got.nonEmpty, "selective dim filter must still match some suppliers")
  }

  test("entity resolution: chained variants share one canonical id; singletons self-map") {
    import spark.implicits._
    val names = Seq(
      (3L, "smith"), (7L, "smyth"),   // dist 1 of each other
      (9L, "smiths"),                 // dist 1 of smith, dist 2 of smyth → chained
      (5L, "jones"))                  // singleton
      .toDF("id", "name")
    val got = Joins.entityResolve(names).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(3L) === 3L && got(7L) === 3L && got(9L) === 3L,
      s"transitive chain must collapse to min id: $got")
    assert(got(5L) === 5L, "singleton maps to itself")
  }

  test("fuzzy join: deletion index finds exactly the distance<=1 pairs") {
    import spark.implicits._
    val names = Seq(
      (1L, "smith"), (2L, "smyth"),   // substitution (dist 1)
      (3L, "smiths"),                 // insertion vs smith (dist 1)
      (4L, "jones"),                  // unrelated
      (5L, "smith"))                  // exact dup of 1 (dist 0)
      .toDF("id", "name")
    val got = Joins.fuzzyJoin(names, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // brute-force truth
    val all = names.collect().map(r => r.getLong(0) -> r.getString(1))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      (ia, na) <- all; (ib, nb) <- all
      if ia < ib && lev(na, nb) <= 1
    } yield (ia, ib) -> lev(na, nb).toLong).toMap
    assert(got === want)
    assert(got((1L, 2L)) === 1L && got((1L, 3L)) === 1L && got((1L, 5L)) === 0L)
    assert(!got.contains((2L, 3L))) // smyth↔smiths is distance 2
  }

  test("theta join keeps the equi key as the join key (no nested loop)") {
    val plan = Joins.thetaJoin(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin")
      && !plan.contains("CartesianProduct"), s"plan:\n$plan")
  }

  test("as-of join picks the latest order at-or-before each event") {
    val got = Joins.asofJoin(spark, sf).collect()
      .map(r => r.getLong(0) -> Option(r.get(2)).map(_.asInstanceOf[Long]))
      .toMap
    // hand-computed expectation over raw tables (o_orderdate is
    // TIMESTAMP_NTZ → LocalDateTime; events.ts is LTZ → Timestamp)
    def millis(v: Any): Long = v match {
      case t: java.sql.Timestamp => t.getTime
      case d: java.time.LocalDateTime =>
        d.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    }
    val orders = graft.sources.Tables(spark, sf, "orders")
      .select("o_custkey", "o_orderdate", "o_orderkey").collect()
      .map(r => (r.getLong(0), millis(r.get(1)), r.getLong(2)))
    val events = graft.sources.Tables(spark, sf, "events")
      .select("event_id", "user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), millis(r.get(2))))
    events.take(200).foreach { case (eid, uid, ts) =>
      val want = orders.filter(o => o._1 == uid && o._2 <= ts)
        .sortBy(o => (o._2, o._3)).lastOption.map(_._3)
      assert(got(eid) === want, s"event $eid user $uid at $ts")
    }
  }

  test("semi + anti partition the customer table") {
    val m = Joins.semiAntiJoin(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = graft.sources.Tables(spark, sf, "customer").count()
    assert(m("semi") + m("anti") === n)
  }

  test("interval join: window inclusive at ±w; bin-boundary pairs found; no dups") {
    import spark.implicits._
    val t0 = 1700000000000000L // μs, deliberately NOT bin-aligned
    val ev = Seq(
      (1L, t0, "purchase"),
      (10L, t0 + 60000000L, "click"),  // exactly +60 s → included
      (11L, t0 - 60000000L, "click"),  // exactly −60 s → included
      (12L, t0 + 60000001L, "click"),  // 1 μs past → excluded
      (13L, t0 + 1L, "click"),         // same bin as the purchase
      // second purchase, its click just under +60 s across a bin edge
      (2L, t0 + 3600000000L, "purchase"),
      (20L, t0 + 3600000000L + 59999999L, "click"))
      .toDF("event_id", "us", "event_type")
      // timestamp_micros keeps exact μs (a java.sql.Timestamp literal
      // would round-trip through ms and lose the +1 μs case)
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(us)"))
      .drop("us")
    val got = Joins.intervalJoin(ev, 60000000L).collect()
    assert(got.map(_.getAs[Long]("n_pairs")).sum === 4L) // 10,11,13 + 20
    assert(got.map(_.getAs[Long]("n_purchases")).sum === 2L)
  }

  test("interval join ≡ naive theta join on seeded random event times") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val w = 7000000L // 7 s window/bin, deliberately odd vs event spacing
    for (seed <- Seq(3, 19)) {
      val rnd = new scala.util.Random(seed)
      val t0 = 1700000000000000L
      // cluster times so bin-boundary and exact-edge pairs occur
      val ev = (1 to 300).map { i =>
        val ty = if (rnd.nextBoolean()) "purchase" else "click"
        (i.toLong, t0 + rnd.nextInt(600) * 1000000L + rnd.nextInt(3), ty)
      }.toDF("event_id", "us", "event_type")
        .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
      val key = (r: org.apache.spark.sql.Row) =>
        (r.get(0).toString, r.getLong(1), r.getLong(2), r.getLong(3))
      val got = Joins.intervalJoin(ev, w).collect().map(key).sortBy(identity).toSeq
      val p = ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("ts").as("p_ts"),
          unix_micros(col("ts")).as("p_us"))
      val c = ev.where(col("event_type") === "click")
        .select(col("event_id").as("c_id"), unix_micros(col("ts")).as("c_us"))
      val naive = p.join(c, abs(col("p_us") - col("c_us")) <= w)
        .groupBy(to_date(col("p_ts")).as("day"))
        .agg(count(lit(1)).as("n_pairs"), countDistinct("p_id").as("n_purchases"),
          countDistinct("c_id").as("n_clicks"))
        .collect().map(key).sortBy(identity).toSeq
      assert(got === naive, s"seed=$seed")
    }
  }

  test("interval join ≡ naive theta join on the fixture; plans an equi-join, not a nested loop") {
    val events = graft.sources.Tables(spark, sf, "events")
    val decl = Joins.intervalJoin(events, 60000000L)
    import org.apache.spark.sql.functions._
    val p = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("ts").as("p_ts"),
        unix_micros(col("ts")).as("p_us"))
    val c = events.where(col("event_type") === "click")
      .select(col("event_id").as("c_id"), unix_micros(col("ts")).as("c_us"))
    val naive = p.join(c, abs(col("p_us") - col("c_us")) <= 60000000L)
      .groupBy(to_date(col("p_ts")).as("day"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct("p_id").as("n_purchases"),
        countDistinct("c_id").as("n_clicks"))
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getLong(3))
    assert(decl.collect().map(key).sortBy(identity).toSeq ===
      naive.collect().map(key).sortBy(identity).toSeq)
    val plan = decl.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"plan:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"), s"plan:\n$plan")
  }
}
