package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.sources.Tables

/** Scalar-function surface (SURVEY §2 B15–B17).
  *
  * Reference grounding: the reference's entire scalar repertoire is
  * string formatting/splitting/casting inside the word-count UDFs
  * (`/root/reference/test.go:34,61-62,73-75`); here that generalizes to
  * the builtin string/date/math/array/JSON expression families — all
  * codegen'd Catalyst expressions, zero UDFs, so every query below stays
  * inside WholeStageCodegen and the projected columns prune at the scan.
  *
  * Oracle parity notes: regex patterns avoid Java-vs-RE2 dialect gaps
  * (explicit character classes only), dates are emitted as formatted
  * strings (pandas renders Spark DATE and DuckDB DATE differently), and
  * float outputs are rounded.
  */
object Scalars {

  /** q_scalar_null: null-handling semantics — coalesce, nullif,
    * null-safe equality, and null detection over a derived nullable
    * column (priority nulled for one status). Pure per-row expressions;
    * pins that three-valued logic matches the oracle. */
  def nullOps(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .withColumn("prio_n",
        when(col("o_orderstatus") === "P", lit(null: String))
          .otherwise(col("o_orderpriority")))
      .select(
        col("o_orderkey"),
        coalesce(col("prio_n"), lit("none")).as("prio_or_none"),
        nullif(col("o_orderstatus"), lit("P")).as("status_or_null"),
        (col("prio_n") <=> col("o_orderpriority")).as("same_prio"),
        col("prio_n").isNull.as("prio_missing"))

  /** q_agg_strings: ordered string aggregation per group —
    * `collect_list` sorted then joined, the deterministic form of
    * listagg/string_agg (set + list collection with an explicit total
    * order, so the concatenation is reproducible across partitionings). */
  def stringAgg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "nation")
      .join(Tables(spark, dir, "region"),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(
        array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"),
        size(collect_set(col("n_nationkey"))).cast("long").as("n_distinct"))

  /** B15 q_scalar_string: lower/substring/length/concat_ws/regexp_extract
    * over documents. */
  def stringOps(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(
        col("doc_id"),
        substring(lower(col("text")), 1, 20).as("head"),
        length(col("text")).cast(LongType).as("len"),
        concat_ws("|", col("lang"), col("source")).as("tag"),
        regexp_extract(col("text"), "([a-z]+)", 1).as("first_word"),
        reverse(col("source")).as("rsource"))

  /** B16 q_scalar_datemath: date/math expression family over orders. */
  def dateMath(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast(LongType).as("yr"),
        month(col("o_orderdate")).cast(LongType).as("mo"),
        dayofmonth(col("o_orderdate")).cast(LongType).as("dom"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
          .as("month_start"),
        datediff(col("o_orderdate"), to_date(lit("2024-01-01")))
          .cast(LongType).as("days_since"),
        round(col("o_totalprice"), 2).as("price_r"),
        floor(abs(col("o_totalprice") - 1000.0)).cast(LongType).as("absdiff"),
        (col("o_orderkey") % 7).as("k7"),
        round(sqrt(col("o_totalprice")), 3).as("price_sqrt"))

  /** B17a q_scalar_array: array functions over embeddings. Element math is
    * widened to double before any arithmetic so Spark and the oracle round
    * the same IEEE value; `aggregate` folds left-to-right, matching the
    * oracle's sequential list reduction order. */
  def arrayOps(spark: SparkSession, dir: String): DataFrame = {
    val emb = col("embedding").cast("array<double>")
    Tables(spark, dir, "embeddings")
      .select(
        col("vec_id"),
        size(col("embedding")).cast(LongType).as("dim"),
        // + 0.0 normalizes IEEE negative zero: round() of a tiny
        // negative gives -0.0 on one engine and 0.0 on the other —
        // value-equal, but the driver's exact hash would diverge
        (round(element_at(emb, 1), 4) + lit(0.0)).as("first_val"),
        (round(aggregate(emb, lit(0.0), (acc, x) => acc + x), 4) + lit(0.0))
          .as("vsum"),
        (round(sqrt(aggregate(emb, lit(0.0), (acc, x) => acc + x * x)), 4) + lit(0.0))
          .as("norm"))
  }

  /** q_redact: identifier masking — the anonymization/scrub transform
    * of a curation pipeline (PII redaction is this exact shape with
    * email/phone/ip patterns in place of digit runs; the synthetic
    * corpus only carries numeric identifiers, so digit runs are the
    * pattern the fixture actually exercises). Pure per-row codegen'd
    * regex — embarrassingly parallel, no shuffle at any scale. The
    * pattern uses explicit character classes so the Java regex engine
    * and the oracle's RE2 agree ('\\d' differs on Unicode digits). */
  def redact(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer")
      .select(
        col("c_custkey"),
        regexp_replace(col("c_name"), "[0-9]+", "<ID>").as("masked_name"),
        regexp_count(col("c_name"), lit("[0-9]+")).cast(LongType).as("n_masked"))

  /** B17b q_scalar_json: JSON path extraction over events.props. */
  def jsonOps(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k"))
}
