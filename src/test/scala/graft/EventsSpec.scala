package graft

import graft.operators.Events

/** Event-log analytics: ordered-funnel gating and cohort week
  * arithmetic on crafted sequences. */
class EventsSpec extends SparkSuiteBase {

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  test("funnel: steps gate on order — earlier-step events after the gate don't count") {
    import spark.implicits._
    val events = Seq(
      // user 1 converts fully in order
      (1L, "view", ts(10)), (1L, "click", ts(20)), (1L, "purchase", ts(30)),
      // user 2: click BEFORE the first view → click step not reached
      (2L, "click", ts(5)), (2L, "view", ts(10)), (2L, "purchase", ts(15)),
      // user 3: view only
      (3L, "view", ts(10)),
      // user 4: purchase at the SAME instant as the click → counts (>=)
      (4L, "view", ts(1)), (4L, "click", ts(2)), (4L, "purchase", ts(2)),
      // user 5: never views → appears in no step
      (5L, "purchase", ts(50)))
      .toDF("user_id", "event_type", "ts")
    val got = Events.funnel(events, Seq("view", "click", "purchase")).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(got === Map("view" -> 4L, "click" -> 2L, "purchase" -> 2L))
  }

  test("funnel counts are monotone non-increasing on real data") {
    val rows = Events.funnel(spark, sf).collect()
      .sortBy(_.getLong(0)).map(_.getLong(2))
    assert(rows.length === 3)
    assert(rows.sliding(2).forall(p => p(0) >= p(1)), rows.mkString(","))
  }

  test("cohort: week offsets are user-relative; week 0 holds the first event") {
    import spark.implicits._
    def day(d: Int) = ts(d * 86400L)
    val events = Seq(
      // user 1 first seen day 0; active again day 8 (age week 1)
      (1L, day(0)), (1L, day(8)),
      // user 2 first seen day 20 (cohort week 2); active day 20 only
      (2L, day(20)))
      .toDF("user_id", "ts")
    val got = Events.cohort(events).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      (0L, 0L) -> ((1L, 1L)),   // user 1 week 0
      (0L, 1L) -> ((1L, 1L)),   // user 1 back in their week 1
      (2L, 0L) -> ((1L, 1L)))) // user 2's own week 0
  }

  test("transitions: per-user adjacency with (ts, event_id) tie-break; no cross-user pairs") {
    import spark.implicits._
    val events = Seq(
      // user 1: view → click → view  (two transitions)
      (1L, 10L, "view", ts(0L)), (1L, 11L, "click", ts(60L)),
      (1L, 12L, "view", ts(120L)),
      // user 2: two same-instant events — event_id orders them
      (2L, 20L, "view", ts(0L)), (2L, 21L, "purchase", ts(0L)),
      // user 3: single event — no transition
      (3L, 30L, "click", ts(0L)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val got = Events.transitions(events).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      ("view", "click") -> ((1L, 1L)),
      ("click", "view") -> ((1L, 1L)),
      ("view", "purchase") -> ((1L, 1L)))) // user 2's tie resolved by id
  }

  test("ohlc: open/close follow the (ts, event_id) total order per bar") {
    import spark.implicits._
    // one 5-min bar (ts 0..299), one later bar; same-instant open tie
    // at ts=0 broken by event_id
    val events = Seq(
      (1L, ts(0L), 7L, "x", 5.0), (2L, ts(0L), 7L, "x", 9.0),
      (3L, ts(100L), 7L, "x", 1.0), (4L, ts(299L), 7L, "x", 7.0),
      (5L, ts(300L), 7L, "x", 2.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .select("ts", "event_id", "event_type", "value")
    val got = graft.operators.Events.ohlcBars(events).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getLong(6)))).toMap
    // bar 0: open = value of (ts 0, id 1) = 5.0, high 9, low 1, close = 7.0
    assert(got(0L) === ((5.0, 9.0, 1.0, 7.0, 4L)))
    // bar 300s: the single tick is open=high=low=close
    assert(got(300000000L) === ((2.0, 2.0, 2.0, 2.0, 1L)))
  }

  test("ohlcBars equals a plain-Scala reference on seeded random ticks") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val ticks = (1 to 500).map { i =>
      (new java.sql.Timestamp(rnd.nextInt(40 * 60) * 1000L), i.toLong,
        s"t${rnd.nextInt(3)}", math.round(rnd.nextDouble() * 1000) / 10.0)
    }
    val got = graft.operators.Events.ohlcBars(
      ticks.toDF("ts", "event_id", "event_type", "value")).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6)))).toMap
    val want = ticks.groupBy(t =>
      (t._1.getTime / 300000L * 300000000L, t._3)).map { case (k, ts) =>
      val ord = ts.sortBy(t => (t._1.getTime, t._2))
      k -> ((ord.head._4, ts.map(_._4).max, ts.map(_._4).min, ord.last._4,
        ts.size.toLong))
    }
    assert(got.keySet === want.keySet)
    got.foreach { case (k, (o, h, l, c, n)) =>
      val w = want(k)
      assert((o, h, l, c, n) === w, s"bar $k")
    }
  }

  test("expectation checks count violations exactly on a crafted frame") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, 10.0), (2L, -3.0), (3L, 0.0), (4L, 99.0))
      .toDF("id", "v")
    val got = graft.operators.Relational.checkViolations(df, Seq(
      "v_positive" -> (col("v") <= 0),
      "v_under_50" -> (col("v") > 50)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("v_positive" -> 2L, "v_under_50" -> 1L))
    val orphans = graft.operators.Relational.orphanCount("fk",
      Seq(1L, 2L, 5L).toDF("a"), "a", Seq(1L, 2L, 3L).toDF("b"), "b")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(orphans === Map("fk" -> 1L))
  }

  test("anomalies: a level spike after a calm history flags; early spikes are guarded") {
    import spark.implicits._
    def ts(i: Int) = new java.sql.Timestamp(1700000000000L + i * 1000L)
    // 40 calm ticks at 10.00 +- 0.02, then one 15.00 spike, then calm.
    // Prior variance is tiny -> the spike's z^2 >> 9. The same 15.00 at
    // position 3 (n_prior < 30) must NOT flag (the small-sample guard).
    val rows =
      (0 until 3).map(i => (i.toLong, ts(i), "a", 10.0 + 0.01 * (i % 3))) ++
      Seq((3L, ts(3), "a", 15.0)) ++
      (4 until 45).map(i => (i.toLong, ts(i), "a", 10.0 + 0.01 * (i % 3))) ++
      Seq((45L, ts(45), "a", 15.0), (46L, ts(46), "a", 10.01))
    val out = Events.anomalies(rows.toDF("event_id", "ts", "event_type", "value"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(out(3L) === false, "guarded: only 3 priors")
    assert(out(45L) === true, "spike after 45 calm priors must flag")
    assert(out(46L) === false, "calm tick after the spike stays quiet")
    assert((0 until 3).forall(i => !out(i.toLong)))
  }

  test("anomalies: strictly-prior semantics — a level shift flags at the shift, not before") {
    import spark.implicits._
    def ts(i: Int) = new java.sql.Timestamp(1700000000000L + i * 1000L)
    // 40 ticks at 10.00 then 40 at 50.00: judged prospectively, the
    // FIRST shifted tick flags; judged against full-corpus stats
    // (the leaky formulation) the calm prefix would flag instead.
    val rows = (0 until 40).map(i => (i.toLong, ts(i), "s", 10.0)) ++
      (40 until 80).map(i => (i.toLong, ts(i), "s", 50.0))
    val out = Events.anomalies(rows.toDF("event_id", "ts", "event_type", "value"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(out(40L) === true, "first shifted tick")
    assert((0 until 40).forall(i => !out(i.toLong)), "calm prefix never flags")
  }

  test("anomalies: all-constant history never divides by zero or flags") {
    import spark.implicits._
    def ts(i: Int) = new java.sql.Timestamp(1700000000000L + i * 1000L)
    val rows = (0 until 50).map(i => (i.toLong, ts(i), "c", 7.0))
    val out = Events.anomalies(rows.toDF("event_id", "ts", "event_type", "value"))
      .collect()
    assert(out.length === 50)
    assert(out.forall(!_.getBoolean(4)))
  }

  test("q_anomaly declared form: every event judged, flags only past the guard") {
    val out = Events.anomalies(spark, sf).collect()
    val n = graft.sources.Tables(spark, sf, "events")
      .where(org.apache.spark.sql.functions.col("value").isNotNull).count()
    assert(out.length.toLong === n)
    out.foreach { r =>
      if (r.getLong(3) < Events.AnomMinPrior) assert(!r.getBoolean(4))
    }
    assert(out.exists(_.getBoolean(4)), "heavy-tailed fixture should flag some")
  }
}
