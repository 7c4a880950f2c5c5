package graft

import graft.operators.Pipeline

class PipelineSpec extends SparkSuiteBase {

  test("two-pass packTokens ≡ single-window form, for any bucket count") {
    val docs = graft.sources.Tables(spark, sf, "documents")
    val want = Pipeline.packTokensWindow(docs, 2000L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(want.nonEmpty)
    // degenerate single bucket, uneven odd split, more buckets than rows
    for (buckets <- Seq(1, 7, 100000)) {
      val got = Pipeline.packTokens(docs, 2000L, buckets).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got === want, s"buckets=$buckets diverges from the window form")
    }
  }

  test("packTokens keeps null-lang docs, matching the window form") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "a b c", "en"), (2L, "d e", null), (3L, "f g h i", null),
      (4L, "j", "en"), (5L, "k l m", "de"))
      .toDF("doc_id", "text", "lang")
    val want = Pipeline.packTokensWindow(docs, 3L).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2))).toSet
    val got = Pipeline.packTokens(docs, 3L, 2).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2))).toSet
    assert(got === want)
    assert(got.size === 5, "null-lang docs must not be dropped")
  }

  test("curateWeb: every state fires on its crafted doc; counts partition the corpus") {
    import spark.implicits._
    // 24 words/line, terminal '.', ≥2 Gopher stopwords, all-alpha —
    // passes C4 line keep and every Gopher rule when repeated 3×
    val good = "the quick brown fox jumps over the lazy dog and then " +
      "runs back to the old barn where it sleeps with great care today."
    val digits = "42 73 19 84 65 91 27 53 38 76 12 94 81 47 29 63 55 17 88 31 70 44 26 99." // C4-kept, Gopher alpha/stops fail
    val shared = "every benchmark suite holds the same twenty shared " +
      "words that have to flag the training overlap with care here now."
    val fUniq = "winter harbors keep the oldest boats and their long " +
      "patient crews that have sailed with every tide for years on end."
    val gUniq = "summer meadows grow the tallest grass and the loudest " +
      "crickets that have sung with every dusk for seasons beyond count."
    val d = Seq(
      (1L, Seq(good, good, good).mkString("\n"), "en"),   // kept (canonical of {1,4,5})
      (2L, s"curly {brace} content\n$good\n$good\n$good", "en"), // c4_dropped
      (3L, Seq(digits, digits, digits).mkString("\n"), "en"),    // gopher_dropped
      (4L, Seq(good, good, good).mkString("\n"), "en"),   // dup of 1
      (5L, Seq(good, good, good).mkString("\n"), "de"),   // dup of 1
      (6L, Seq(shared, gUniq, gUniq).mkString("\n"), "de"), // contaminated (shares shingles with 97)
      (97L, Seq(shared, fUniq, fUniq).mkString("\n"), "en")) // bench (97 % 97 == 0)
      .toDF("doc_id", "text", "lang")
    val got = Pipeline.curateWeb(d).collect()
      .map(r => r.getString(0) -> r).toMap
    def n(lang: String, c: String): Long = got(lang).getLong(got(lang).fieldIndex(c))
    assert(n("en", "n_docs") === 5L && n("de", "n_docs") === 2L)
    assert(n("en", "n_c4_dropped") === 1L)     // doc 2
    assert(n("en", "n_gopher_dropped") === 1L) // doc 3
    assert(n("en", "n_dup") === 1L && n("de", "n_dup") === 1L) // docs 4, 5
    assert(n("en", "n_bench") === 1L)          // doc 97
    assert(n("de", "n_contaminated") === 1L)   // doc 6
    assert(n("en", "n_kept") === 1L && n("de", "n_kept") === 0L) // doc 1
    assert(n("en", "kept_tokens") > 0L && n("de", "kept_tokens") === 0L)
    // conservation: states partition every language's corpus
    for (lang <- Seq("en", "de"))
      assert(n(lang, "n_docs") === n(lang, "n_c4_dropped") + n(lang, "n_gopher_dropped") +
        n(lang, "n_dup") + n(lang, "n_bench") + n(lang, "n_contaminated") + n(lang, "n_kept"))
  }

  test("curateWeb on the enriched fixture: states partition n_docs and EVERY state fires") {
    val docs = graft.sources.Tables(spark, sf, "documents")
    val rows = Pipeline.curateWeb(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(r => r.getLong(r.fieldIndex("n_docs"))).sum
    assert(total === docs.count() + graft.sources.WebCorpus.SliceN)
    rows.foreach { r =>
      def g(c: String) = r.getLong(r.fieldIndex(c))
      assert(g("n_docs") === g("n_c4_dropped") + g("n_gopher_dropped") +
        g("n_dup") + g("n_bench") + g("n_contaminated") + g("n_kept"),
        s"states must partition lang ${r.getString(0)}")
    }
    // VERDICT r14 #1 done-bar: the web slice makes every ledger state
    // non-zero on the REAL oracle-gated corpus (no empty stage frames)
    def tot(c: String) = rows.map(r => r.getLong(r.fieldIndex(c))).sum
    assert(tot("n_c4_dropped") > 0L, "fixture word salad still drops")
    assert(tot("n_gopher_dropped") === 7L, "slice docs 4-9, 35")
    assert(tot("n_dup") === 2L, "slice docs 3, 31 (identical to doc 2)")
    assert(tot("n_bench") === 1L, "slice doc 0 (id % 97 == 0)")
    assert(tot("n_contaminated") === 2L, "slice docs 1, 33 (copied line)")
    assert(tot("n_kept") === 28L, "slice docs 2, 10-39 minus 31/33/35")
    assert(tot("kept_tokens") > 0L)
  }

  test("curateWebAppend ≡ one-shot curateWeb on the enriched fixture (staged index path)") {
    graft.operators.Pipeline.clearWebStateCache()
    val inc = Pipeline.curateWebAppend(spark, sf).orderBy("lang").collect()
    val one = Pipeline.curateWeb(spark, sf).orderBy("lang").collect()
    assert(inc.toSeq === one.toSeq,
      "append-maintained ledger must equal the one-shot chain on base ∪ delta")
    // the cross-increment states really crossed the boundary: doc 31
    // (delta) dups base docs 2/3, doc 33 (delta) is contaminated by
    // base bench doc 0 — visible as both counts exceeding the
    // base-only structure
    def tot(c: String) = inc.map(r => r.getLong(r.fieldIndex(c))).sum
    assert(tot("n_dup") === 2L && tot("n_contaminated") === 2L)
  }

  test("splitTag partitions the corpus exactly like trainValSplit") {
    val docs = graft.sources.Tables(spark, sf, "documents")
    val (train, va) = Pipeline.trainValSplit(docs)
    val trainIds = train.select("doc_id").collect().map(_.getLong(0)).toSet
    val valIds = va.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(trainIds.nonEmpty && valIds.nonEmpty, "both sides populated")
    assert((trainIds & valIds).isEmpty, "split sides must be disjoint")
    val tagged = Pipeline.splitTag(docs, 10).select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(tagged.keySet === trainIds ++ valIds, "tag form covers the corpus")
    assert(trainIds.forall(tagged(_) == "train") && valIds.forall(tagged(_) == "val"))
  }

  test("splitByCluster: clusters land whole on one side; singletons match splitTag; per-doc hashing WOULD leak") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // doc ids chosen so that within some cluster the per-doc FNV rule
    // assigns BOTH sides (asserted below — the leak this operator
    // exists to prevent), while the cluster key assigns one.
    val docs = (1L to 60L).map(i => (i, "en")).toDF("doc_id", "lang")
    // clusters: {1..10} labeled 1, {11..15} labeled 11; 16..60 singletons
    val comp = ((1L to 10L).map(i => (i, 1L)) ++ (11L to 15L).map(i => (i, 11L)))
      .toDF("doc_id", "comp")
    val got = Pipeline.splitByCluster(docs, comp, 10).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(got.length === 60)
    // cluster-atomic: one split side per cluster key
    got.groupBy(_._2).foreach { case (c, rows) =>
      assert(rows.map(_._3).toSet.size === 1, s"cluster $c split across sides")
    }
    // singletons keep the exact per-doc assignment of q_split — the
    // two operators agree wherever leaking is impossible
    val perDoc = Pipeline.splitTag(docs, 10).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    got.filter(r => r._1 == r._2 && r._1 > 15L).foreach { case (id, _, s) =>
      assert(s === perDoc(id), s"singleton $id diverges from splitTag")
    }
    // and the per-doc rule demonstrably leaks on these clusters: some
    // cluster's members straddle train and val under splitTag
    val leaked = got.filter(_._1 <= 15L)
      .groupBy(_._2).exists { case (_, rows) =>
        rows.map(r => perDoc(r._1)).toSet.size > 1
      }
    assert(leaked, "fixture must exhibit the per-doc leak being prevented")
  }

  test("two-phase groupSample ≡ single-window form; exactly min(k, |group|) per stratum") {
    val docs = graft.sources.Tables(spark, sf, "documents")
    for (k <- Seq(1, 5, 100000)) {
      val want = Pipeline.groupSampleWindow(docs, k)
        .select("doc_id", "lang", "h", "rk").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      val got = Pipeline.groupSample(docs, k).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(got === want, s"k=$k diverges from the window form")
    }
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got5 = Pipeline.groupSample(docs, 5).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got5 === sizes.map { case (l, n) => l -> math.min(5L, n) })
  }

  test("packTokens never sorts a whole language in one partition") {
    // the window must be keyed by (lang, bkt), not lang alone
    val plan = Pipeline.packTokens(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("bkt"),
      s"expected range-bucketed window partitioning in plan:\n$plan")
  }

  test("globalRowIds ≡ single global window, for any bucket count; no SinglePartition sort") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables(spark, sf, "documents").select("doc_id")
    val want = docs
      .withColumn("rid", row_number().over(Window.orderBy("doc_id")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (buckets <- Seq(1, 7, 100000)) {
      val got = Pipeline.globalRowIds(docs, "doc_id", buckets).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === want, s"buckets=$buckets")
    }
    val plan = Pipeline.globalRowIds(docs, "doc_id", 32)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"two-pass form must not funnel into one partition:\n$plan")
  }

  test("q_shuffle: a total deterministic permutation that scatters id locality; no SinglePartition sort") {
    val rows = Pipeline.shuffle(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = graft.sources.Tables(spark, sf, "documents").count()
    // a permutation: every doc exactly once, positions exactly 1..n
    assert(rows.length.toLong === n)
    assert(rows.map(_._3).sorted.toSeq === (1L to n))
    assert(rows.map(_._1).distinct.length.toLong === n)
    // deterministic across runs
    val again = Pipeline.shuffle(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
    // locality scattering: consecutive doc_ids almost never stay
    // adjacent after the hash ordering (they would ALL be adjacent in
    // an id-ordered "shuffle")
    val pos = rows.map(r => r._1 -> r._3).toMap
    val adjacent = (0L until n - 1).count(i =>
      pos.contains(i) && pos.contains(i + 1) && math.abs(pos(i) - pos(i + 1)) == 1L)
    assert(adjacent.toDouble / n < 0.02,
      s"$adjacent/$n consecutive ids stayed adjacent — not shuffled")
    // rank must ride the two-pass decomposition, never one sorted task
    val plan = Pipeline.shuffle(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"shuffle must not funnel into one partition:\n$plan")
  }

  test("decontaminate: shared 4-gram removes a train doc; benchmark docs excluded") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (0L, "alpha beta gamma delta tail0"),      // benchmark (0 % 97 == 0)
      (1L, "x alpha beta gamma delta y"),        // shares the 4-gram → dropped
      (2L, "alpha beta gamma X delta"),          // no shared 4-gram → kept
      (3L, "zig zag")                            // too short for a 4-gram → kept
    ).toDF("doc_id", "text").withColumn("lang", lit("en"))
    val kept = graft.operators.Pipeline.decontaminate(docs, 97, 4)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L, 3L))
  }

  test("decontaminate: benchmark shingle side is broadcast (no corpus-shingle shuffle)") {
    val plan = graft.operators.Pipeline.decontaminate(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"plan:\n$plan")
  }

  test("weightedSample: matches the exponential-key reference; k ≥ n keeps all") {
    import spark.implicits._
    val n = 200
    val weight = (i: Long) => ((i % 7) + 1).toDouble * 10.0
    val rows = (1L to n.toLong).map(i => (i, weight(i))).toDF("id", "w")
    val got = Pipeline.weightedSample(rows, 20).collect().map(_.getLong(0)).toSet
    // driver-side Efraimidis–Spirakis with the identical derandomized key
    val ref = (1L to n.toLong).map { i =>
      val h = graft.functions.Fnv32a.hash(i.toString.getBytes("UTF-8"))
      (math.log((h + 0.5) / 4294967296.0) / weight(i), i)
    }.sortBy { case (k, i) => (-k, i) }.take(20).map(_._2).toSet
    assert(got === ref)
    assert(Pipeline.weightedSample(rows, 1000).count() === n.toLong)
    // stable under repartitioning (TakeOrderedAndProject is global)
    val again = Pipeline.weightedSample(rows.repartition(13), 20)
      .collect().map(_.getLong(0)).toSet
    assert(again === ref)
  }

  test("chunk: coverage, overlap, short tail, empty-doc exclusion") {
    import spark.implicits._
    // 12 tokens, size 5, overlap 2 → stride 3 → starts 1,4,7,10
    val docs = Seq(
      (1L, (1 to 12).map(i => s"t$i").mkString(" ")),
      (2L, "a b c"),   // single short chunk
      (3L, "   "))     // whitespace-only → no chunks
      .toDF("doc_id", "text")
    val got = Pipeline.chunk(docs, 5, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.keys.count(_._1 == 1L) === 4)
    assert(got((1L, 0L)) === 5L && got((1L, 1L)) === 5L && got((1L, 2L)) === 5L)
    assert(got((1L, 3L)) === 3L, "tail chunk runs short")
    assert(got((2L, 0L)) === 3L)
    assert(!got.keys.exists(_._1 == 3L), "zero-token doc yields no chunks")
    // every token covered: with stride 3 and len 5, union of [s, s+4]
    // for s = 1,4,7,10 is 1..12
    val starts = Seq(1, 4, 7, 10)
    assert(starts.flatMap(s => s until (s + 5)).toSet.intersect((1 to 12).toSet)
      === (1 to 12).toSet)
    // chunk content is the exact slice: md5 equals a driver recomputation
    val md5s = Pipeline.chunk(docs, 5, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(3)).toMap
    val toks = (1 to 12).map(i => s"t$i")
    def ref(s: Int) = {
      val js = toks.slice(s - 1, math.min(s - 1 + 5, 12)).mkString(" ")
      java.security.MessageDigest.getInstance("MD5")
        .digest(js.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    starts.zipWithIndex.foreach { case (s, i) =>
      assert(md5s((1L, i.toLong)) === ref(s), s"chunk $i")
    }
  }

  test("weightedSample ≡ reference on seeded random weights; heavy weights dominate") {
    import spark.implicits._
    for (seed <- Seq(13, 31)) {
      val rnd = new scala.util.Random(seed)
      val rows = (1L to 500L).map(i =>
        (i, if (i <= 50) 1000.0 * (1 + rnd.nextDouble()) else 0.5 + rnd.nextDouble()))
      val got = Pipeline.weightedSample(rows.toDF("id", "w"), 25)
        .collect().map(_.getLong(0)).toSet
      val ref = rows.map { case (i, w) =>
        val h = graft.functions.Fnv32a.hash(i.toString.getBytes("UTF-8"))
        (math.log((h + 0.5) / 4294967296.0) / w, i)
      }.sortBy { case (k, i) => (-k, i) }.take(25).map(_._2).toSet
      assert(got === ref, s"seed=$seed")
      // the 50 thousand-fold-heavier ids should dominate the sample
      assert(got.count(_ <= 50L) >= 20, s"seed=$seed: ${got.count(_ <= 50L)}")
    }
  }

  test("weightedSample plans a TakeOrderedAndProject, not a global sort") {
    val plan = Pipeline.weightedSample(spark, sf, 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
  }

  test("curation states partition the corpus; kept docs carry tokens") {
    val rows = Pipeline.curate(spark, sf).collect()
    val total = rows.map(r => r.getLong(1) + r.getLong(2) + r.getLong(3)).sum
    val nDocs = graft.sources.Tables(spark, sf, "documents").count()
    assert(total === nDocs)
    assert(rows.map(_.getLong(4)).sum > 0)
    rows.foreach(r => assert(r.getLong(1) >= 0 && r.getLong(4) >= 0))
  }

  test("mixTemperature rebalances toward low-resource languages, deterministically") {
    // (lang, tokens_before, rate_ppm, docs_kept, tokens_kept)
    val rows = Pipeline.mixTemperature(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, before, ppm, kept, keptTok) =>
      assert(ppm >= 0L && ppm <= 1000000L)
      assert(keptTok <= before, "a language cannot keep more tokens than it has")
      assert(kept >= 1L)
    }
    // α = 0.5 gives smaller languages a HIGHER sampling rate than the
    // dominant one (the whole point of temperature rebalancing)
    val byTokens = rows.sortBy(_._2)
    assert(byTokens.last._3 <= byTokens.head._3,
      s"largest language must not out-rate the smallest: $rows")
    // total kept token mass lands at ~MixBudgetFrac of the corpus
    // (floor/ppm realization error is per-language, so allow slack)
    val t = rows.map(_._2).sum.toDouble
    val keptShare = rows.map(_._5).sum / t
    assert(keptShare > 0.3 && keptShare < 0.7, f"kept share $keptShare%.2f")
    // deterministic across runs
    val again = Pipeline.mixTemperature(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(again.sortBy(_._1).toSeq === rows.sortBy(_._1).toSeq)
  }
}
