package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Crafted-corpus checks for the round-4 text-analysis additions
  * (repetition signals, TF-IDF top terms). */
class TextAnalysisSpec extends SparkSuiteBase {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text").withColumn("lang", lit("en"))
  }

  test("repetition: known ratios, zero-token doc kept with 0.0 ratios") {
    val d = docs(
      1L -> "a a a b",        // 4 tokens, 2 types, dup 0.5, top 0.75
      2L -> "x y z w",        // all distinct: dup 0.0, top 0.25
      3L -> "   ",            // whitespace-only: zero tokens
      4L -> "q q q q")        // one type: dup 0.75, top 1.0
    val got = TextOps.repetition(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got(1L) === ((4L, 2L, 0.5, 0.75)))
    assert(got(2L) === ((4L, 4L, 0.0, 0.25)))
    assert(got(3L) === ((0L, 0L, 0.0, 0.0)))
    assert(got(4L) === ((4L, 1L, 0.75, 1.0)))
    assert(got.size === 4) // the degenerate doc is NOT dropped
  }

  test("tfidf: rare terms outrank common terms; ranks deterministic") {
    // 'rare' appears in 1 of 4 docs, 'common' in all 4: for doc 1 with
    // equal tf, score(rare) = 1*4/1 = 4 > score(common) = 1*4/4 = 1
    val d = docs(
      1L -> "rare common",
      2L -> "common filler2",
      3L -> "common filler3",
      4L -> "common filler4")
    val got = TextOps.tfidfTopTerms(d, 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))
    val doc1 = got.filter(_._1 == 1L).sortBy(_._6)
    assert(doc1.map(_._2).toSeq === Seq("rare", "common"))
    assert(doc1.head._5 === 4.0)
    assert(doc1.last._5 === 1.0)
    // every doc emits at most k rows, ranks are 1..k without gaps
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._6).sorted.toSeq === (1L to rows.length).toSeq)
    }
  }

  test("topk sketch, lossy regime: heavy hitters survive with bounded undercount") {
    import spark.implicits._
    // counts: a=50 b=30 c=20 + 10 singletons → N=110; capacity 4 →
    // guarantee line N/(cap+1) = 22: a and b MUST survive
    val words = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c") ++
      (1 to 10).map(i => s"junk$i")
    val docs = new scala.util.Random(42).shuffle(words).grouped(12).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
      .toDF("doc_id", "text").repartition(5)
    val got = graft.operators.TextOps.approxTopTokens(docs, 4, 4).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = 110L
    val bound = n / 5L
    assert(got.contains("a") && got.contains("b"),
      s"items above N/(cap+1) must survive: $got")
    for ((tok, est) <- got; truth = Map("a" -> 50L, "b" -> 30L, "c" -> 20L).getOrElse(tok, 1L)) {
      assert(est <= truth, s"$tok overcounted: $est > $truth")
      assert(est >= truth - bound, s"$tok undercut past the bound: $est < $truth - $bound")
    }
  }

  test("topk sketch, exact regime: capacity ≥ vocabulary reproduces exact counts") {
    val docs = graft.sources.Tables(spark, sf, "documents")
    val got = graft.operators.TextOps.approxTopTokens(docs, 64, 10).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val want = TextOps.wordCount(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .sortBy { case (t, c) => (-c, t) }.take(10)
    assert(got.toSeq === want.toSeq)
  }

  test("lm score: common-word prose outranks rare-token junk; empty doc scores 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat"),   // words shared with doc 2
      (2L, "the dog sat on the rug"),
      (3L, "zxqv flurb gnarp"),         // singletons only
      (4L, ""))                          // zero tokens
      .toDF("doc_id", "text")
    val got = TextOps.lmScore(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(4L) === ((0L, 0L, 0.0)))
    // junk doc: every token has corpus frequency 1 → num = n_tok
    assert(got(3L)._1 === 3L && got(3L)._2 === 3L)
    assert(got(1L)._3 > got(3L)._3, s"prose ${got(1L)} must outscore junk ${got(3L)}")
    // numerator is the exact sum of corpus tfs: doc 1 = the(4)+cat(1)+sat(2)+on(2)+the(4)+mat(1)
    assert(got(1L)._2 === 14L)
  }

  test("langMix: mixed doc flagged with exact passage shares; monolingual stays clean; zero-token doc absent") {
    import spark.implicits._
    import graft.operators.TextOps
    // doc 1: 10 en-profile tokens then 10 de-profile tokens → exactly
    // 2 passages, one each → mixed, dominant by lang-asc tie = de, 50%
    val en10 = "the a of and to is the a of and"
    val de10 = "der die und das ist ein der die und das"
    // doc 2: 15 en tokens → 2 passages (10 + 5), both en → not mixed
    val en15 = "the a of and to is the a of and the a of and to"
    val docs = Seq((1L, en10 + " " + de10), (2L, en15), (3L, "   "))
      .toDF("doc_id", "text")
    val got = TextOps.langMix(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toMap
    assert(got(1L) === ((2L, "de", 500000L, 2L, true)),
      s"mixed doc: ${got(1L)}")
    assert(got(2L) === ((2L, "en", 1000000L, 1L, false)),
      s"monolingual doc: ${got(2L)}")
    assert(!got.contains(3L), "zero-token doc has no passages")
    // fixture accounting: Σ passages = Σ ceil(n_tok/10) over non-empty docs
    val fx = TextOps.langMix(spark, sf)
    val nPass = fx.agg(org.apache.spark.sql.functions.sum("n_passages"))
      .head().getLong(0)
    val expected = graft.sources.Tables(spark, sf, "documents")
      .selectExpr(s"size(${TextOps.TokensSql}) as n")
      .where(col("n") >= 1)
      .selectExpr("sum((n - 1) div 10 + 1)").head().getLong(0)
    assert(nPass === expected, "passage accounting")
  }

  test("redact masks every digit run and counts them") {
    val got = graft.operators.Scalars.redact(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val masked = r.getString(1)
      assert(!masked.exists(_.isDigit), s"unmasked digits in: $masked")
      assert(r.getLong(2) === "<ID>".r.findAllIn(masked).length,
        s"mask count mismatch for: $masked")
    }
    // the fixture's customer names actually exercise the pattern
    assert(got.exists(_.getLong(2) > 0))
  }

  test("feature hash: buckets bounded, mass conserved, collisions additive") {
    import org.apache.spark.sql.functions._
    val fh = TextOps.featureHash(spark, sf, 64)
    val rows = fh.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.forall { case (_, b, _) => b >= 0L && b < 64L })
    // mass conservation: per-doc feature counts sum to the doc's tokens
    val tokTotal = TextOps.wordCount(spark, sf)
      .agg(sum("cnt")).head().getLong(0)
    assert(rows.map(_._3).sum === tokTotal)
    // dimensionality actually bounded below the vocabulary when buckets
    // are few: 2 buckets over a multi-word vocab must collide
    val tiny = TextOps.featureHash(docs(1L -> "a b c d e f g h"), 2)
    assert(tiny.select("bucket").distinct().count() <= 2)
    assert(tiny.agg(sum("cnt")).head().getLong(0) === 8L)
  }

  test("tfidf: higher tf wins at equal df; term breaks exact score ties") {
    val d = docs(
      1L -> "b b a",   // within doc 1: tf(b)=2 > tf(a)=1, both df=2
      2L -> "a b")     // doc 2: tf equal, df equal → term order a < b
    val got = TextOps.tfidfTopTerms(d, 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(5)))
    assert(got.filter(_._1 == 1L).sortBy(_._3).map(_._2).toSeq === Seq("b", "a"))
    assert(got.filter(_._1 == 2L).sortBy(_._3).map(_._2).toSeq === Seq("a", "b"))
  }

  test("collocations: lift matches a driver-side reference; min-count prunes the tail") {
    val d = docs(
      1L -> "new york new york new york city",
      2L -> "a new day in new york begins",
      3L -> "a a a a")
    val got = TextOps.collocations(d, 2L).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    // driver-side reference with the SAME fixed evaluation order
    val toks = Seq("new york new york new york city",
      "a new day in new york begins", "a a a a")
      .map(_.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq)
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bis = toks.flatMap(t => t.zip(t.tail).map { case (x, y) => s"$x $y" })
    val bcnt = bis.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val totU = toks.map(_.size).sum.toLong
    val totB = bis.size.toLong
    val ref = bcnt.filter(_._2 >= 2L).map { case (bg, cxy) =>
      val Array(x, y) = bg.split(" ")
      bg -> (cxy, uni(x), uni(y),
        cxy.toDouble * totU / totB * totU / uni(x) / uni(y))
    }
    assert(got === ref)
    assert(got.contains("new york") && got.contains("a a"))
    assert(!got.contains("york city"), "count-1 bigram must be pruned")
    // "new york" is a true collocation (lift ≫ 1); "a a" is just frequency
    assert(got("new york")._4 > got("a a")._4)
  }

  test("ngram doc frequency: cross-doc boilerplate found; self-repeats count once") {
    val d = docs(
      1L -> "page one text all rights reserved worldwide",
      2L -> "other page here all rights reserved worldwide",
      3L -> "all rights reserved worldwide all rights reserved worldwide",
      4L -> "completely unrelated content lives here")
    val got = TextOps.ngramDocFreq(d, 3L).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the two 3-grams inside the shared 4-token blurb appear in docs 1,2,3
    // — doc 3's self-repeat contributes ONE, not two
    assert(got === Map("all rights reserved" -> 3L, "rights reserved worldwide" -> 3L))
  }

  test("bpe: replays the published worked example and a plain-Scala reference") {
    import spark.implicits._
    // Sennrich et al. 2016 §3.2 vocabulary: low·5 lower·2 newest·6 widest·3
    val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val d = docs(1L -> corpus.mkString(" "))
    val got = TextOps.bpeLearn(spark, d, 6).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

    // driver-side reference BPE: same greedy merge, same total order
    var vocab: Seq[(Long, Seq[String])] =
      corpus.groupBy(identity).view.mapValues(_.size.toLong).toMap
        .map { case (w, c) => (c, w.map(_.toString).toSeq :+ "</w>") }.toSeq
    val ref = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    for (r <- 1 to 6) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      vocab.foreach { case (c, syms) =>
        syms.zip(syms.tail).foreach(p => counts(p) += c)
      }
      val ((l, rr), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
      ref += ((r.toLong, l, rr, c))
      vocab = vocab.map { case (cnt, syms) =>
        (cnt, TextOps.mergePair(syms, l, rr))
      }
    }
    assert(got === ref.toSeq)
    // the worked example's famous outcome: 'es' → 'est' → 'est</w>' early
    // (count 9 = newest·6 + widest·3), before any 'lo' merge (count 7)
    assert(got.take(3).map(m => (m._2, m._3)) ===
      Seq(("e", "s"), ("es", "t"), ("est", "</w>")))
    assert(got.take(3).forall(_._4 === 9L))
    // max-pair counts never increase round over round
    assert(got.map(_._4).sliding(2).forall { case Seq(a, b) => a >= b; case _ => true })
  }

  test("batched bpe learns the IDENTICAL merge sequence in fewer driver rounds") {
    import spark.implicits._
    // the worked-example fixture (conflict-heavy: e/es/est chain) plus
    // the real sf corpus — batch=4 must replay batch=1's sequence
    // exactly, pair counts included, in strictly fewer rounds
    val fixture = docs(1L -> (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
    val sfDocs = graft.sources.Tables(spark, sf, "documents")
    // the worked example is the conservative rule's WORST case — its
    // merges form one chain (e→es→est→est</w>), every round's runner-up
    // conflicts with the winner, so the batch degenerates to 1/round
    // (correctness over speed); the real corpus is where disjoint top
    // pairs exist and rounds must strictly shrink
    for ((d, nm, name, mustSave, bw) <- Seq(
        (fixture, 6, "fixture", false, 4), (sfDocs, 8, "sf", true, 4),
        (sfDocs, 40, "sf40", true, 64), (sfDocs, 64, "sf64", true, 64))) {
      def run(batch: Int) = {
        val (df, rounds) = TextOps.bpeLearnBatched(spark, d, nm, batch)
        (df.collect().map(r => (r.getLong(0), r.getString(1),
          r.getString(2), r.getLong(3))).toSeq, rounds)
      }
      val (classic, roundsClassic) = run(1)
      val (batched, roundsBatched) = run(bw)
      assert(batched === classic, s"$name: batched sequence diverged")
      assert(roundsClassic === classic.size,
        s"$name: classic loop must pay one round per merge")
      assert(roundsBatched <= roundsClassic,
        s"$name: batching must never cost extra rounds")
      if (mustSave) assert(roundsBatched < roundsClassic,
        s"$name: batching saved nothing ($roundsBatched vs $roundsClassic rounds)")
      // the vocab-scale claim (VERDICT r9 #3): at width 64 a 64-merge
      // vocab must compress to a handful of driver rounds, not ~64 —
      // the multiplier that turns a 32k vocab into O(hundreds) of
      // rounds. ≥4× is the conservative floor; the sf corpus measures
      // far better (info'd).
      if (bw >= 64 && nm >= 64)
        assert(roundsBatched * 4 <= roundsClassic,
          s"$name: width-$bw batching only saved $roundsClassic→$roundsBatched rounds")
      info(s"$name: ${classic.size} merges in $roundsBatched rounds (classic $roundsClassic, width $bw)")
    }
  }

  test("batched bpe ≡ classic on seeded RANDOM corpora (hazard-validation property)") {
    import spark.implicits._
    // tiny alphabets force dense pair-count ties and symbol conflicts —
    // exactly the regime where an unsound batching rule would diverge
    // (equal-count minted pairs tie-breaking into the sequence). Three
    // seeds × two alphabet sizes, 12 merges, batch 3 vs 1.
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 3; alpha <- Seq("ab", "abcd")) {
      val words = (1 to 120).map { _ =>
        (1 to (1 + rnd.nextInt(6))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      }
      val d = docs(1L -> words.take(60).mkString(" "),
        2L -> words.drop(60).mkString(" "))
      def seq(batch: Int) =
        TextOps.bpeLearnBatched(spark, d, 12, batch)._1.collect()
          .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      assert(seq(3) === seq(1), s"trial $trial alpha=$alpha diverged")
    }
  }

  test("bpeEncode: matches a driver-side reference tokenizer, reconciles with tokenCounts") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val d = docs(
      1L -> "low low low low low lower lower newest newest newest newest newest newest widest widest widest",
      2L -> "lowest newest low",
      3L -> "")
    val nMerges = 6
    val got = TextOps.bpeEncode(spark, d, nMerges).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getSeq[Int](3)))).toMap

    // reference: learn merges with the already-spec'd bpeLearn, apply
    // them per word on the driver, flatten in word order, id = rank in
    // the sorted final symbol set
    val merges = TextOps.bpeLearn(spark, d, nMerges).orderBy("rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    def encodeWord(w: String): Seq[String] = {
      var syms: Seq[String] = w.map(_.toString) :+ "</w>"
      merges.foreach { case (l, r) => syms = TextOps.mergePair(syms, l, r) }
      syms
    }
    val texts = Map(
      1L -> "low low low low low lower lower newest newest newest newest newest newest widest widest widest",
      2L -> "lowest newest low", 3L -> "")
    val wordsOf = texts.view.mapValues(
      _.toLowerCase.split("[ \t\n\r\f]+").filter(_.nonEmpty).toSeq).toMap
    val symSeqs = wordsOf.view.mapValues(_.flatMap(encodeWord)).toMap
    val vocab = symSeqs.values.flatten.toSeq.distinct.sorted.zipWithIndex.toMap
    val want = wordsOf.map { case (id, ws) =>
      id -> ((ws.size.toLong, symSeqs(id).size.toLong,
        symSeqs(id).map(vocab): Seq[Int]))
    }
    assert(got === want)
    // zero-token doc keeps a row with an empty encode
    assert(got(3L) === ((0L, 0L, Seq.empty[Int])))

    // reconciliation with q_token_count: every word emits ≥ 1 and
    // ≤ len+1 subword tokens, so per doc ws_tokens ≤ n_tokens ≤
    // Σ(len(word)+1)
    val tc = TextOps.tokenCounts(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (id, (nw, nt, _)) =>
      assert(nw === tc(id), s"doc $id word count")
      assert(nt >= tc(id), s"doc $id: n_tokens < ws_tokens")
      val ceil = wordsOf(id).map(_.length + 1L).sum
      assert(nt <= ceil, s"doc $id: n_tokens > char ceiling")
    }
  }

  test("bpeEncode with zero merges: every word is chars + </w>, ids cover the alphabet") {
    import org.apache.spark.sql.functions.col
    val d = docs(1L -> "ab ba abba", 2L -> "b")
    val got = TextOps.bpeEncode(spark, d, Seq.empty).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getSeq[Int](3)))).toMap
    // n_tokens = Σ (len(word) + 1) exactly when nothing merges
    assert(got(1L)._1 === 3L && got(1L)._2 === (3 + 3 + 5).toLong)
    assert(got(2L)._1 === 1L && got(2L)._2 === 2L)
    // vocab is {</w>, a, b} sorted → ids 0, 1, 2
    assert(got(2L)._3 === Seq(2, 0))             // "b" → b, </w>
    assert(got(1L)._3.take(3) === Seq(1, 2, 0))  // "ab" → a, b, </w>
  }

  test("fingerprint: rolling window hash matches a per-window driver reference") {
    import spark.implicits._
    val p = 1000000007L
    def hash(cs: Seq[Long]): Long = cs.foldLeft(0L)((a, c) => (a * 31 + c) % p)
    def reference(text: String): (Long, Long) = {
      // fold over CODEPOINTS, not UTF-16 chars (ADVICE r7): the
      // Expression iterates codePointAt, so a supplementary-plane char
      // is ONE hash step — a char-wise reference would silently agree
      // on BMP-only inputs and diverge beyond them
      val codes = text.toLowerCase.codePoints().toArray.toSeq.map(_.toLong)
      val full = hash(codes)
      val win =
        if (codes.length >= 8) codes.sliding(8).map(hash).min else full
      (full, win)
    }
    val rnd = new scala.util.Random(7)
    val texts =
      Seq("", "a", "abcdefg", "abcdefgh", "abcdefghi", "AbC dEf GhIj",
        "zzzzzzzzzzzz",
        // supplementary-plane coverage: emoji (no case mapping),
        // musical symbol, math fraktur, Deseret capital (HAS a
        // lowercase mapping in the supplementary plane), and mixes
        // that put the window boundary astride surrogate pairs
        "🦀🦀 crab 𝄞 music",
        "𝕳𝖊𝖑𝖑𝖔",
        "𐐀𐐁 deseret CAPS 𐐂xyz",
        "a😀b😁c😂d😃e") ++
        (1 to 40).map(_ => rnd.alphanumeric.take(rnd.nextInt(30)).mkString) ++
        (1 to 10).map(_ => (1 to 64).map(_ => (32 + rnd.nextInt(95)).toChar).mkString) ++
        // random mixed BMP + supplementary streams (emoji block)
        (1 to 10).map(_ => (1 to 24).map(_ =>
          if (rnd.nextBoolean()) new String(Character.toChars(0x1F600 + rnd.nextInt(80)))
          else ('a' + rnd.nextInt(26)).toChar.toString).mkString)
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = TextOps.fingerprint(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) === reference(t), s"text '$t'")
    }
  }

  test("q_bpe_encode declared surface: sortable columns, string form mirrors the array") {
    import org.apache.spark.sql.types.{ArrayType, MapType}
    val declared = SparkEntry.queries("q_bpe_encode")(spark, sf)
    // the correctness harness normalizes every column with a pandas
    // sort — list/map columns crash it (the round-6 red row), so the
    // declared surface must stay atomic-typed
    declared.schema.fields.foreach { f =>
      assert(!f.dataType.isInstanceOf[ArrayType] &&
        !f.dataType.isInstanceOf[MapType],
        s"declared q_bpe_encode column '${f.name}' is not pandas-sortable")
    }
    val rows = declared.limit(50).collect()
    assert(rows.nonEmpty)
    // the flattened string is the space-joined id sequence, nothing else
    rows.foreach { r =>
      val s = r.getAs[String]("token_ids")
      assert(s.matches("""(\d+( \d+)*)?"""), s"malformed token_ids: '$s'")
      val n = if (s.isEmpty) 0L else s.split(" ").length.toLong
      assert(n === r.getAs[Long]("n_tokens"))
    }
  }

  test("mergePair: greedy left-to-right, non-overlapping") {
    assert(TextOps.mergePair(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
    assert(TextOps.mergePair(Seq("a", "b", "a", "b"), "a", "b") === Seq("ab", "ab"))
    assert(TextOps.mergePair(Seq("x"), "a", "b") === Seq("x"))
    assert(TextOps.mergePair(Nil, "a", "b") === Nil)
  }

  test("inverted index: df/tf exact, postings = ascending first-cap, stopword capped") {
    val cap = TextOps.PostingsCap
    // "the" in cap+9 docs (exercises the cap); "rare" in two with tf 3
    val d = docs(
      ((1L to (cap + 8).toLong).map(i => i -> "the") :+
        (100L -> "rare rare") :+ (50L -> "rare the")): _*)
    val got = TextOps.invertedIndex(d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got("rare") === ((2L, 3L, "50,100")))
    val (dfThe, tfThe, postThe) = got("the")
    assert(dfThe === (cap + 9).toLong && tfThe === (cap + 9).toLong)
    // capped postings: the cap SMALLEST doc ids, ascending
    assert(postThe === (1L to cap.toLong).mkString(","))
    assert(got.size === 2)
  }

  test("index lookup ≡ direct corpus filter; plan never touches the documents table") {
    val (t1, t2) = TextOps.LookupTerms
    val direct = TextOps.invertedIndexDirectProbe(spark, sf, t1, t2)
    val got = TextOps.indexLookup(spark, sf).collect().map(_.toSeq).toSeq
    assert(got === direct.collect().map(_.toSeq).toSeq)
    assert(got.nonEmpty, "fixture terms must co-occur")
    val plan = TextOps.indexLookup(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet"),
      s"the lookup must be served from the postings artifact alone:\n$plan")
    assert(plan.contains("graft-postings-"), s"postings artifact missing:\n$plan")
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"term buckets must prune as partition filters:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("word"),
      s"the word predicate must reach the parquet scan:\n$plan")
  }

  test("index search ≡ direct corpus scoring; plan stays on the artifact") {
    val (t1, t2) = TextOps.LookupTerms
    val nDocs = graft.sources.Tables(spark, sf, "documents").count()
    val w = org.apache.spark.sql.expressions.Window.partitionBy("word")
    val direct = graft.sources.Tables(spark, sf, "documents")
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("word"))
      .where(col("word").isin(t1, t2))
      .groupBy("word", "doc_id").agg(count(lit(1)).as("tf"))
      .withColumn("df", count(lit(1)).over(w))
      .withColumn("weight",
        col("tf").cast("double") * lit(nDocs.toDouble) / col("df").cast("double"))
      .groupBy("doc_id")
      .agg(sum("weight").as("score"), count(lit(1)).as("terms_hit"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(TextOps.SearchK)
    val got = TextOps.indexSearch(spark, sf)
    assert(got.collect().map(_.toSeq).toSeq === direct.collect().map(_.toSeq).toSeq)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet"),
      s"ranked search must be served from the postings artifact:\n$plan")
    assert(plan.contains("TakeOrdered"),
      s"top-k must be a TakeOrderedAndProject, not a full sort:\n$plan")
  }

  test("appended postings artifact serves the full-corpus lookup; increment lands as extra files") {
    val got = TextOps.indexLookupAppended(spark, sf).collect().map(_.toSeq).toSeq
    val full = TextOps.indexLookup(spark, sf).collect().map(_.toSeq).toSeq
    assert(got === full, "append-built artifact must hold exactly the full posting rows")
    val plan = TextOps.indexLookupAppended(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"bucket pruning must survive the append:\n$plan")
    assert(!plan.contains("documents.parquet"), s"no corpus scan at serve time:\n$plan")
    // the increment is append-only: probed buckets hold files from BOTH
    // write batches (base + delta), base files never rewritten
    val (root, _) = TextOps.stagedAppendedPostings(spark, sf)
    val (t1, t2) = TextOps.LookupTerms
    Seq(TextOps.termBucket(t1), TextOps.termBucket(t2)).distinct.foreach { b =>
      val files = new java.io.File(s"$root/bucket=$b")
        .listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length >= 2,
        s"bucket $b should hold base + appended files, found ${files.length}")
    }
  }

  test("term bucket routing: driver-side scalar ≡ the artifact's column expression") {
    import spark.implicits._
    val words = ((1 to 200).map(i => s"term$i") ++ Seq("scan", "merge", "naïve-ü"))
    val colSide = words.toDF("word")
      .select(col("word"),
        graft.functions.Fnv32a.mix32(graft.functions.Fnv32a.fnv32a(col("word")))
          .bitwiseAND(TextOps.PostingsBuckets - 1).cast("int").as("b"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    words.foreach { w =>
      assert(TextOps.termBucket(w) === colSide(w), s"bucket mismatch for $w")
    }
  }

  test("count-min: estimates never undercount; collisions overcount only (vocab >> width)") {
    import spark.implicits._
    // 2000 distinct words over 512 cells per row: collisions are
    // guaranteed by pigeonhole; frequencies 1..5 cycle
    val d = (0 until 2000).map(i => (i.toLong, Seq.fill(i % 5 + 1)(s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextOps.cmsTopTokens(d, 3000).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length === 2000)
    got.foreach { case (w, cnt, est) =>
      assert(est >= cnt, s"CMS must never undercount: $w est=$est true=$cnt")
    }
    assert(got.exists { case (_, cnt, est) => est > cnt },
      "2000 words over 512 cells must collide somewhere — overestimates expected")
    // the d-row min must beat any single row's estimate quality:
    // total overestimate is finite and bounded by the collision mass
    val over = got.map { case (_, cnt, est) => est - cnt }.sum
    val n = got.map(_._2).sum
    assert(over <= TextOps.CmsDepth * n,
      "aggregate overestimate cannot exceed the total sketched mass per row")
  }

  test("count-min: partition sketches merge by addition to the corpus sketch") {
    import spark.implicits._
    val rows = (0 until 300).map(i => (i.toLong, s"w${i % 40} w${i % 7}"))
    val all = rows.toDF("doc_id", "text")
    val (a, b) = (rows.take(150).toDF("doc_id", "text"),
      rows.drop(150).toDF("doc_id", "text"))
    def wc(df: org.apache.spark.sql.DataFrame) =
      df.select(explode(TextOps.tokens(col("text"))).as("word"))
        .where(length(col("word")) > 0)
        .groupBy("word").agg(count(lit(1)).as("cnt"))
    def counters(df: org.apache.spark.sql.DataFrame) =
      TextOps.cmsCells(wc(df)).groupBy("j", "cell").agg(sum("cnt").as("c"))
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = (counters(a).toSeq ++ counters(b).toSeq)
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    assert(merged === counters(all),
      "CMS counters are sums — partition sketches must add to the corpus sketch")
  }

  test("inverted index plan: bounded partial/final aggregate, no Window, no collect_list") {
    val plan = TextOps.invertedIndex(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"postings must ride the bounded partial/final aggregator:\n$plan")
    assert(!plan.contains("Window"), s"no window rank in the index build:\n$plan")
    assert(!plan.contains("collect_list"),
      s"unbounded list agg must not appear:\n$plan")
  }

  test("qualityGopher: each rule fires on its crafted violator, clean doc keeps") {
    val goodText = (("the quick brown fox jumps over the lazy dog and then " +
      "runs back to the old barn where it sleeps with care ") * 3).trim // 66 words, all alpha
    val d = docs(
      1L -> goodText,                                   // passes all 7 rules
      2L -> "too short to pass the word count rule",    // 8 words < 50
      3L -> (goodText + " " + Seq.fill(60)("## ##").mkString(" ")), // symbol-heavy
      4L -> (Seq.fill(30)("- bullet line\n").mkString + goodText),  // >90% bullet lines? 30 of 31 lines
      5L -> (goodText + " " + (1 to 60).map(_ => "42").mkString(" "))) // digit words: alpha frac low
    val got = TextOps.qualityGopher(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    def flag(id: Long, c: String) = got(id).getBoolean(got(id).fieldIndex(c))
    assert(flag(1L, "keep"), "clean 66-word doc must pass every rule")
    assert(!flag(2L, "g_words") && !flag(2L, "keep"))
    assert(!flag(3L, "g_symbol") && !flag(3L, "keep"))
    assert(!flag(4L, "g_bullets") && !flag(4L, "keep"))
    assert(!flag(5L, "g_alpha") && !flag(5L, "keep"))
    // signals are exact integers/divisions: doc 2 has 8 words
    assert(got(2L).getLong(got(2L).fieldIndex("n_words")) === 8L)
    // bullet fraction of doc 4: 30 bullet lines of 31 total
    assert(got(4L).getDouble(got(4L).fieldIndex("bullet_frac")) === 30.0 / 31.0)
  }

  test("qualityGopher: zero-token and ellipsis-line edge cases") {
    val d = docs(
      1L -> "   ",                                   // whitespace-only
      2L -> "one...\ntwo...\nthree...\nfour here")   // 3 of 4 lines end ...
    val got = TextOps.qualityGopher(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    val z = got(1L)
    assert(z.getLong(z.fieldIndex("n_words")) === 0L)
    assert(z.getDouble(z.fieldIndex("mean_word_len")) === 0.0)
    assert(z.getDouble(z.fieldIndex("alpha_frac")) === 0.0)
    assert(!z.getBoolean(z.fieldIndex("keep")))
    val e = got(2L)
    assert(e.getDouble(e.fieldIndex("ellipsis_frac")) === 0.75)
    assert(!e.getBoolean(e.fieldIndex("g_ellipsis")))
  }

  test("c4Clean: line keep rules, drop-reason precedence, rewrite content") {
    val goodLine = "Here is a sentence with plenty of words in it."
    val d = docs(
      // 3 good lines + 2 bad (short / no terminal punct): kept, cleaned
      1L -> s"$goodLine\nshort one.\n$goodLine\nno terminal punct here at all\n$goodLine",
      // javascript line is cut even with punctuation; < 3 kept → dropped
      2L -> s"$goodLine\nPlease enable Javascript to view this page today.\n$goodLine",
      // lorem beats brace beats too_few_lines in reason precedence
      3L -> s"Lorem Ipsum dolor { $goodLine",
      4L -> s"some curly {brace} content\n$goodLine\n$goodLine\n$goodLine")
    val got = TextOps.c4Clean(d).collect().map(r => r.getLong(0) -> r).toMap
    def s(id: Long, c: String) = got(id).getString(got(id).fieldIndex(c))
    def b(id: Long, c: String) = got(id).getBoolean(got(id).fieldIndex(c))
    def l(id: Long, c: String) = got(id).getLong(got(id).fieldIndex(c))
    assert(!b(1L, "dropped") && l(1L, "n_kept") === 3L && l(1L, "n_lines") === 5L)
    assert(s(1L, "clean_text") === Seq(goodLine, goodLine, goodLine).mkString("\n"))
    assert(b(2L, "dropped") && s(2L, "drop_reason") === "too_few_lines")
    assert(s(3L, "drop_reason") === "lorem_ipsum") // lorem wins over brace
    assert(s(4L, "drop_reason") === "brace" && s(4L, "clean_text") === "")
  }

  test("repetitionGopher: each repetition class fires on its crafted violator") {
    // 60 distinct 3-char tokens over 3 distinct lines: every unit and
    // every n-gram is a singleton, and no singleton gram carries > a
    // few % of the 180-char word mass (short docs legitimately trip
    // the top-gram rules — the published thresholds assume the ≥50-word
    // Gopher doc-rule population)
    val cleanText = (1 to 60).map(i => f"w$i%02d")
      .grouped(20).map(_.mkString(" ")).mkString("\n")
    val d = docs(
      1L -> cleanText,
      // 4 copies of one line + 1 unique: dup_line_frac = 3/5
      2L -> "same line here\nsame line here\nsame line here\nsame line here\nunique tail",
      // one dominating repeated 2-gram: top-gram char mass ≈ whole doc
      3L -> Seq.fill(10)("ab cd").mkString(" "),
      // a 5-token phrase occurring twice across distinct filler
      4L -> "one two three four five gap1 gap2 gap3 one two three four five",
      // most-frequent 2-gram ("aa bb" x3, 4 chars) is NOT the
      // count*chars maximizer ("ccccc ddddd" x2, 10 chars): the
      // published rule takes the argmax-by-count gram's mass
      5L -> "aa bb aa bb aa bb ccccc ddddd ccccc ddddd")
    val got = TextOps.repetitionGopher(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    def f(id: Long, c: String) = got(id).getDouble(got(id).fieldIndex(c))
    def keep(id: Long) = got(id).getBoolean(got(id).fieldIndex("keep"))
    assert(keep(1L), "distinct-unit doc must keep")
    assert(f(1L, "dup_line_frac") === 0.0 && f(1L, "dup5_char_frac") === 0.0)
    // every 2-gram is a singleton: top mass = one gram's 6 word chars
    assert(f(1L, "top2_char_frac") === 6.0 / 180.0)
    assert(f(2L, "dup_line_frac") === 3.0 / 5.0 && !keep(2L))
    // line char mass: 4 copies x 14 chars + 11 = 67; dups beyond first = 42
    assert(f(2L, "dup_line_char_frac") === 42.0 / 67.0)
    assert(f(3L, "top2_char_frac") > 0.2 && !keep(3L))
    // "one two three four five" = 19 word chars, occurs 2x; M = 19+12+19
    assert(f(4L, "dup5_char_frac") === (2.0 * 19.0) / 50.0 && !keep(4L))
    // the 5-gram repeat does NOT fire the line/paragraph rules
    assert(f(4L, "dup_line_frac") === 0.0 && f(4L, "dup_para_frac") === 0.0)
    // argmax-by-count (ADVICE r14): "aa bb" (c=3, 4 chars → mass 12)
    // wins over "ccccc ddddd" (c=2, 10 chars → mass 20); word mass 32
    assert(f(5L, "top2_char_frac") === 12.0 / 32.0)
  }

  test("repetitionGopher: compiled kernel ≡ keyed-aggregation baseline (crafted + fixture)") {
    val crafted = docs(
      1L -> "same line here\nsame line here\nsame line here\nunique tail",
      2L -> "aa bb aa bb aa bb ccccc ddddd ccccc ddddd",
      3L -> "one two three four five gap1 gap2 gap3 one two three four five",
      4L -> "   ",
      5L -> "para one text\n\npara one text\n\npara two text")
    for (d <- Seq(crafted, graft.sources.Tables(spark, sf, "documents"))) {
      val kernel = TextOps.repetitionGopher(d).orderBy("doc_id").collect()
      val keyed = TextOps.repetitionGopherKeyed(d).orderBy("doc_id").collect()
      assert(kernel.toSeq === keyed.toSeq)
    }
  }

  test("CRLF documents: \\z line anchors are end-of-string in both engines (ADVICE r13)") {
    // a CRLF doc split on \n leaves a trailing \r on every line: Java
    // regex '$' would still match before it while the oracle's RE2 '$'
    // would not — the operators anchor with \z, so a \r-terminated
    // line is NOT ellipsis-ending / terminal-punctuated in EITHER
    // engine. Pinned on the Spark side here (DuckDB replays \z too).
    val goodLine = "Here is a sentence with plenty of words in it."
    val crlf = docs(
      1L -> s"one...\r\ntwo...\r\nthree here\r\nfour here",
      2L -> s"$goodLine\r\n$goodLine\r\n$goodLine\r\n$goodLine")
    val g = TextOps.qualityGopher(crlf).collect()
      .map(r => r.getLong(0) -> r).toMap
    // lines 1-2 end "...\r" — with '$' they would count as ellipsis ends
    assert(g(1L).getDouble(g(1L).fieldIndex("ellipsis_frac")) === 0.0)
    val c = TextOps.c4Clean(crlf).collect().map(r => r.getLong(0) -> r).toMap
    // the first three lines end ".\r" — terminal punct not at
    // end-of-string, so only the final (\r-less) line is kept and the
    // page drops ('$' would have kept all four and the page)
    assert(c(2L).getLong(c(2L).fieldIndex("n_kept")) === 1L)
    assert(c(2L).getString(c(2L).fieldIndex("drop_reason")) === "too_few_lines")
  }
}
