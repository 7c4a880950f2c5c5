package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-proof data generator: synthesizes an sf1-shaped corpus (10× the
  * bench's sf0.1) from the read-only driver fixture, WITHOUT touching
  * `/root/testdata` — the output lives under the repo (gitignored).
  *
  * Method: `Copies` key-offset replicas of every fact table, with the
  * two similarity-bearing columns DECORRELATED across replicas so the
  * scaled corpus doesn't degenerate into 10-way duplicate groups (which
  * would measure a different problem — dup-group quadratics — instead
  * of 10× honest data):
  *
  *  - `documents.text`: every whitespace token of replica `cp > 0` gets
  *    a `_cp` suffix, so EVERY shingle differs across replicas (cross-
  *    replica Jaccard = 0) while the intra-replica near-dup structure
  *    the dedup fixtures were built around is preserved verbatim;
  *  - `embeddings.embedding`: replica `cp` rotates the 64 dims by
  *    `7·cp mod 64` positions (7 coprime to 64 ⇒ distinct rotations).
  *    A rotation is an isometry — norms and all INTRA-replica cosines
  *    are bit-preserved, so per-replica ANN geometry matches sf0.1
  *    exactly — while CROSS-replica cosines decorrelate like random
  *    vectors (the fixture's embeddings carry no axis alignment).
  *
  * All key spaces shift by `cp · KeyOff` (larger than any fixture key),
  * so joins stay consistent within a replica and never cross replicas.
  * `region`/`nation` are dimension tables and copy verbatim — exactly
  * how a real 10× corpus shares its small dims. Timestamps are kept, so
  * per-window/streaming volumes scale 10× (the load shape of interest).
  *
  * Big tables are repartitioned to [[OutFiles]] files so the sf1 layout
  * has real scan parallelism instead of 10×-bloated sf0.1 files.
  *
  * Usage: `graft.GenSf1 [srcDir] [outDir] [copies] [tables]` — defaults
  * `/root/testdata/sf0.1` → `testdata-sf1` × 10, all tables; `tables`
  * is a comma list for partial corpora (e.g. `embeddings` alone for
  * the sf10 ANN-serve datapoint — the other tables aren't needed and
  * at 100× would be pure waste).
  */
object GenSf1 {

  val KeyOff = 100000000L
  val OutFiles = 32

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "testdata-sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val KnownTables = Set("region", "nation", "customer", "supplier",
      "part", "orders", "lineitem", "events", "documents", "embeddings")
    val only: Set[String] =
      if (args.length > 3) args(3).split(",").map(_.trim).toSet else Set.empty
    require(only.subsetOf(KnownTables),
      s"unknown table(s) ${(only -- KnownTables).mkString(",")}; " +
        s"known: ${KnownTables.toSeq.sorted.mkString(",")}")
    require(copies <= 128,
      "copies > 128 would repeat (rotation, sign) embedding transforms — " +
        "cross-replica duplicates, no longer '10x the same shape'")
    val spark = Engine.session()

    def rd(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    // df is BY-NAME: a partial corpus (`tables=embeddings` against a dir
    // holding only embeddings.parquet) must not even rd() the excluded
    // tables — the read would fail on paths the user explicitly excluded.
    def wr(df: => DataFrame, t: String, files: Int): Unit =
      if (only.isEmpty || only(t))
        df.repartition(files).write.mode("overwrite").parquet(s"$out/$t.parquet")

    // replicate: one row per (source row, cp), cp in [0, copies)
    def rep(df: DataFrame): DataFrame =
      df.withColumn("cp", explode(lit((0L until copies.toLong).toArray)))
    def off(c: String) = (col(c) + col("cp") * KeyOff).as(c)

    wr(rd("region"), "region", 1)
    wr(rd("nation"), "nation", 1)

    wr(rep(rd("customer")).select(off("c_custkey"), col("c_name"),
      col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")),
      "customer", 4)
    wr(rep(rd("supplier")).select(off("s_suppkey"), col("s_name"),
      col("s_nationkey"), col("s_acctbal")), "supplier", 2)
    wr(rep(rd("part")).select(off("p_partkey"), col("p_name"),
      col("p_brand"), col("p_type"), col("p_size"), col("p_retailprice")),
      "part", 4)
    wr(rep(rd("orders")).select(off("o_orderkey"), off("o_custkey"),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
      col("o_orderpriority")), "orders", OutFiles)
    wr(rep(rd("lineitem")).select(off("l_orderkey"), off("l_partkey"),
      off("l_suppkey"), col("l_linenumber"), col("l_quantity"),
      col("l_extendedprice"), col("l_discount"), col("l_tax"),
      col("l_returnflag"), col("l_linestatus"), col("l_shipdate")),
      "lineitem", OutFiles)
    wr(rep(rd("events")).select(off("event_id"), col("ts"), off("user_id"),
      col("event_type"), col("value"), col("props")), "events", OutFiles)

    // replica tokenization mirrors the tokens() convention (split on any
    // whitespace run, drop empties) so multi-space documents don't grow
    // bare "_cp" tokens; replica cp>0 whitespace normalizes to single
    // spaces (replica 0 is verbatim) — ADVICE r11.
    wr(rep(rd("documents"))
      .withColumn("text", when(col("cp") === 0L, col("text")).otherwise(
        concat_ws(" ", expr(
          "transform(filter(split(text, '\\\\s+'), w -> w != ''), w -> concat(w, '_', cp))"))))
      .select(off("doc_id"), col("text"), col("lang"), col("source"),
        length(col("text")).cast("long").as("n_chars")),
      "documents", OutFiles)

    // past cp 63 the 64 rotations recycle; negating the whole vector
    // (also an isometry — intra-replica cosines unchanged) keeps
    // cross-replica vectors distinct up to 128 copies (cosine −1, not
    // the silent exact duplicate a repeated rotation alone would make)
    wr(rep(rd("embeddings"))
      .withColumn("embedding", expr(
        """transform(sequence(0, 63), j ->
          |  CASE WHEN cp >= 64
          |    THEN -element_at(embedding, cast(pmod(j + cp * 7, 64) + 1 as int))
          |    ELSE element_at(embedding, cast(pmod(j + cp * 7, 64) + 1 as int)) END)""".stripMargin))
      .select(off("vec_id"), col("embedding"), col("label")),
      "embeddings", 8)

    println(s"""{"generated":"$out","copies":$copies,"src":"$src"}""")
    spark.stop()
  }
}
