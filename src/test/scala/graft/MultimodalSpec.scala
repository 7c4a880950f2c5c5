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
