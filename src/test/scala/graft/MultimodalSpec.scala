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

  test("resize stub: fixed output shape, deterministic downsampling") {
    import spark.implicits._
    val ds = Seq(Multimodal.MediaItem(1L, "image",
      Array.tabulate(100)(_.toByte))).toDS()
    val out = Multimodal.resizeStub(ds, 4, 4).collect()(0)
    assert(out.width === 4 && out.height === 4)
    assert(out.payload.length === 16)
    assert(out.payload(0) === 0.toByte && out.payload(15) === 93.toByte)
    // idempotent determinism
    val again = Multimodal.resizeStub(ds, 4, 4).collect()(0)
    assert(out.payload.toSeq === again.payload.toSeq)
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
