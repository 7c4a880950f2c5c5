package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSuiteBase {

  test("feature extraction: byte stats on a known payload") {
    import spark.implicits._
    val ds = Seq(Multimodal.MediaItem(7L, "image", "abc".getBytes("UTF-8")))
      .toDS()
    val f = Multimodal.extractFeatures(ds).collect()(0)
    assert(f.n_bytes === 3L)
    assert(f.checksum === (97 + 98 + 99).toLong)
    assert(f.digest === "900150983cd24fb0d6963f7d28e17f72") // md5("abc")
    assert(math.abs(f.hist.sum - 1.0) < 1e-12)
    assert(f.hist(97 >> 5) === 1.0) // all three bytes in bin 3
  }

  test("image decode: PNG round-trip yields exact dims and channel means") {
    import spark.implicits._
    val docs = Seq(0L, 7L, 123L, 255L).toDF("doc_id")
    val out = Multimodal.decodeImages(Multimodal.imageTable(docs))
      .collect().map(d => d.doc_id -> d).toMap
    for (id <- Seq(0L, 7L, 123L, 255L)) {
      val d = out(id)
      val (w, h) = (Multimodal.imgWidth(id), Multimodal.imgHeight(id))
      assert(d.width === w && d.height === h)
      val (tr, _, _) = Multimodal.topRgb(id)
      val (br, _, _) = Multimodal.botRgb(id)
      val expR = (w.toLong * (h / 2) * tr + w.toLong * (h - h / 2) * br).toDouble / (w * h)
      assert(d.mean_r === expR, s"doc $id mean_r")
    }
  }

  test("image resize: real bilinear scale changes dims, keeps flat color") {
    import spark.implicits._
    val docs = Seq(5L, 200L).toDF("doc_id")
    val out = Multimodal.decodeImages(
      Multimodal.resizeImages(Multimodal.flatImageTable(docs), 24, 16))
      .collect().map(d => d.doc_id -> d).toMap
    for (id <- Seq(5L, 200L)) {
      val d = out(id)
      assert(d.width === 24 && d.height === 16)
      val (r, g, b) = Multimodal.topRgb(id)
      assert(d.mean_r === r.toDouble && d.mean_g === g.toDouble &&
        d.mean_b === b.toDouble, s"doc $id flat color must survive bilinear")
    }
  }

  test("image resize: two-band content resamples within the band range") {
    import spark.implicits._
    val docs = Seq(37L).toDF("doc_id")
    val d = Multimodal.decodeImages(
      Multimodal.resizeImages(Multimodal.imageTable(docs), 40, 30))
      .collect()(0)
    assert(d.width === 40 && d.height === 30)
    val lo = math.min(Multimodal.topRgb(37L)._1, Multimodal.botRgb(37L)._1)
    val hi = math.max(Multimodal.topRgb(37L)._1, Multimodal.botRgb(37L)._1)
    assert(d.mean_r >= lo && d.mean_r <= hi,
      "bilinear mean must stay inside the source band range")
    // both bands must still be present after upscale: the mean cannot
    // collapse to either extreme (h=30 leaves >= 10 rows per band)
    assert(d.mean_r > lo + 1e-9 && d.mean_r < hi - 1e-9)
  }

  test("audio decode: WAV round-trip recovers header fields and exact sample stats") {
    import spark.implicits._
    val docs = Seq(0L, 123L, 499L).toDF("doc_id")
    val out = Multimodal.decodeAudio(Multimodal.audioTable(docs))
      .collect().map(a => a.doc_id -> a).toMap
    for (id <- Seq(0L, 123L, 499L)) {
      val a = out(id)
      val samples = Multimodal.audioSamples(id)
      // header-parsed metadata, not synth-side pass-through
      assert(a.sample_rate === 8000 && a.channels === 1)
      assert(a.n_samples === samples.length.toLong)
      assert(a.sum_amp === samples.map(_.toLong).sum, s"doc $id sum")
      assert(a.peak === samples.map(s => math.abs(s.toInt)).max, s"doc $id peak")
    }
    // the payload is a genuine WAV container (RIFF....WAVE magic)
    val wav = Multimodal.audioTable(docs).collect().head.payload
    assert(new String(wav.take(4), "US-ASCII") === "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") === "WAVE")
  }

  test("video decode: animated-GIF frame extraction recovers exact frames") {
    import spark.implicits._
    val docs = Seq(5L, 123L).toDF("doc_id")
    val frames = Multimodal.sampleVideoFrames(Multimodal.videoTable(docs))
      .collect().groupBy(_.doc_id)
    for (id <- Seq(5L, 123L)) {
      val n = Multimodal.videoFrameCount(id)
      val fs = frames(id).sortBy(_.frame_idx)
      assert(fs.map(_.frame_idx).toSeq === (0L until n.toLong by 2).toSeq,
        s"doc $id must sample every 2nd of its $n frames")
      fs.foreach { f =>
        assert(f.width === 20 && f.height === 12)
        val (r, g, b) = Multimodal.frameRgb(id, f.frame_idx)
        assert((f.mean_r, f.mean_g, f.mean_b) ===
          ((r.toDouble, g.toDouble, b.toDouble)),
          s"doc $id frame ${f.frame_idx} color survived the GIF palette")
      }
    }
    // the payload is a genuine GIF container
    val gif = Multimodal.videoTable(docs).collect().head.payload
    assert(new String(gif.take(6), "US-ASCII") === "GIF89a")
  }

  test("frame sampling: one row explodes to every-Nth fixed-size frames") {
    import spark.implicits._
    val ds = Seq(Multimodal.MediaItem(7L, "video",
      Array.tabulate(1024)(_.toByte))).toDS()
    val frames = Multimodal.frameSampleStub(ds, frameBytes = 256, everyNth = 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq === Seq(0L, 2L)) // frames 0,2 of 0..3
    assert(frames.forall(_.payload.length === 256))
  }

  test("embed stub: unit-norm, deterministic, identical payloads coincide") {
    import spark.implicits._
    val ds = Seq(
      Multimodal.MediaItem(1L, "image", "the quick brown fox".getBytes("UTF-8")),
      Multimodal.MediaItem(2L, "image", "the quick brown fox".getBytes("UTF-8")),
      Multimodal.MediaItem(3L, "audio", "completely different bytes here".getBytes("UTF-8")))
      .toDS()
    val e = Multimodal.embedStub(ds).collect().map(m => m.doc_id -> m.embedding).toMap
    e.values.foreach { v =>
      assert(math.abs(v.map(x => x.toDouble * x).sum - 1.0) < 1e-6)
    }
    assert(e(1L).sameElements(e(2L)), "identical payloads must embed identically")
    assert(!e(1L).sameElements(e(3L)))
    // determinism across runs
    val e2 = Multimodal.embedStub(ds).collect().map(m => m.doc_id -> m.embedding).toMap
    assert(e(3L).sameElements(e2(3L)))
  }

  test("decoded-pixel features: identical images coincide, colors separate") {
    import spark.implicits._
    // ids 1 and 257 render IDENTICAL two-band images (geometry is
    // mod-16/8, band colors mod-256 arithmetic), id 128 differs
    // (id 0 would be pure black — a legitimate zero vector)
    val docs = Seq(1L, 257L, 128L).toDF("doc_id")
    val f = Multimodal.imageFeatures(Multimodal.imageTable(docs))
      .collect().map(e => e.doc_id -> e.embedding).toMap
    assert(f(1L).sameElements(f(257L)),
      "byte-identical renders must produce identical features")
    assert(!f(1L).sameElements(f(128L)))
    f.values.foreach { v =>
      assert(math.abs(v.map(x => x.toDouble * x).sum - 1.0) < 1e-5, "unit norm")
    }
    // full decoded-pixel ANN composition runs end-to-end
    val nn = Multimodal.imageNeighbors(spark, sf, k = 3).collect()
    assert(nn.nonEmpty)
    nn.foreach(r => assert(r.getLong(0) != r.getLong(1)))
  }

  test("multimodal -> similarity composition returns k neighbors per query") {
    val out = Multimodal.mediaNeighbors(spark, sf, k = 3)
    val perQuery = out.collect().groupBy(_.getLong(0))
    assert(perQuery.nonEmpty)
    perQuery.foreach { case (_, rows) => assert(rows.length === 3) }
    // the identical-payload twin (if any) ranks with sim ~ 1; at minimum
    // similarities are within valid cosine range
    out.collect().foreach { r =>
      val s = r.getDouble(2)
      assert(s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9)
    }
  }

  test("media table types cycle deterministically and payload is binary") {
    val rows = Multimodal.mediaTable(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.take(30).foreach { m =>
      val want = (m.doc_id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      assert(m.media_type === want)
      assert(m.payload.nonEmpty)
    }
  }
}
