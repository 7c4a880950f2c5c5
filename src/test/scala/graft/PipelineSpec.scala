package graft

import graft.operators.Pipeline

class PipelineSpec extends SparkSuiteBase {

  test("curation states partition the corpus; kept docs carry tokens") {
    val rows = Pipeline.curate(spark, sf).collect()
    val total = rows.map(r => r.getLong(1) + r.getLong(2) + r.getLong(3)).sum
    val nDocs = graft.sources.Tables(spark, sf, "documents").count()
    assert(total === nDocs)
    assert(rows.map(_.getLong(4)).sum > 0)
    rows.foreach(r => assert(r.getLong(1) >= 0 && r.getLong(4) >= 0))
  }
}
