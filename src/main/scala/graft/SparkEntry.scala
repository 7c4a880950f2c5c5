package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 has one entry in
  * `queries`; the DuckDB-oracle SQL (when expressible) lives in
  * `oracleSql` under the same key with identical output column names.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * B3 q_wordcount — the reference's proven workload end-to-end. */
  def entry(spark: SparkSession): DataFrame =
    TextOps.wordCount(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_wordcount"       -> ((s, d) => TextOps.wordCount(s, d)),
    "q_scan_project"    -> ((s, d) => Relational.scanProject(s, d)),
    "q_filter"          -> ((s, d) => Relational.filterQuery(s, d)),
    "q_group_sum"       -> ((s, d) => Relational.groupSum(s, d)),
    "q_distinct"        -> ((s, d) => Relational.distinctCount(s, d)),
    "q_rollup"          -> ((s, d) => Relational.rollupSales(s, d)),
    "q_sort_limit"      -> ((s, d) => Relational.sortLimit(s, d)),
    "q_setops"          -> ((s, d) => Relational.setOps(s, d)),
    "q_scalar_string"   -> ((s, d) => Scalars.stringOps(s, d)),
    "q_scalar_datemath" -> ((s, d) => Scalars.dateMath(s, d)),
    "q_scalar_array"    -> ((s, d) => Scalars.arrayOps(s, d)),
    "q_scalar_json"     -> ((s, d) => Scalars.jsonOps(s, d)),
    "q_join_inner"      -> ((s, d) => Joins.innerJoin(s, d)),
    "q_join_broadcast"  -> ((s, d) => Joins.broadcastJoin(s, d)),
    "q_join_semi_anti"  -> ((s, d) => Joins.semiAntiJoin(s, d)),
    "q_join_theta"      -> ((s, d) => Joins.thetaJoin(s, d)),
    "q_join_asof"       -> ((s, d) => Joins.asofJoin(s, d)),
    "q_window_rank"     -> ((s, d) => Windows.rankTopN(s, d)),
    "q_window_running"  -> ((s, d) => Windows.runningTotal(s, d))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver rows-only check. */
  def oracleSql: Map[String, String] = Map(
    "q_wordcount" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(string_split_regex(lower(text), '[ \t\n\r\f\x0B]+')) AS word
        |      FROM documents)
        |WHERE length(word) > 0
        |GROUP BY word
        |ORDER BY word""".stripMargin,
    "q_scan_project" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",
    "q_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem WHERE l_quantity > 30 AND l_returnflag = 'R'""".stripMargin,
    "q_group_sum" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_price,
        |       round(avg(l_discount), 4) AS avg_disc,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q_distinct" ->
      """SELECT o_orderstatus,
        |       count(DISTINCT o_custkey) AS uniq_custs,
        |       count(*) AS cnt
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |       coalesce(l_linestatus, 'ALL') AS status,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q_sort_limit" ->
      """SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
        |FROM lineitem
        |ORDER BY price DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin,
    "q_setops" ->
      """WITH a AS (SELECT DISTINCT o_custkey AS custkey FROM orders),
        |     b AS (SELECT c_custkey AS custkey FROM customer
        |           WHERE c_mktsegment = 'BUILDING')
        |SELECT 'union' AS op, count(*) AS cnt
        |  FROM (SELECT custkey FROM a UNION SELECT custkey FROM b)
        |UNION ALL
        |SELECT 'intersect' AS op, count(*) AS cnt
        |  FROM (SELECT custkey FROM a INTERSECT SELECT custkey FROM b)
        |UNION ALL
        |SELECT 'except' AS op, count(*) AS cnt
        |  FROM (SELECT custkey FROM a EXCEPT SELECT custkey FROM b)""".stripMargin,
    "q_scalar_string" ->
      """SELECT doc_id,
        |       substring(lower(text), 1, 20) AS head,
        |       length(text) AS len,
        |       concat_ws('|', lang, source) AS tag,
        |       regexp_extract(text, '([a-z]+)', 1) AS first_word,
        |       reverse(source) AS rsource
        |FROM documents""".stripMargin,
    "q_scalar_datemath" ->
      """SELECT o_orderkey,
        |       year(o_orderdate) AS yr,
        |       month(o_orderdate) AS mo,
        |       day(o_orderdate) AS dom,
        |       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |       date_diff('day', DATE '2024-01-01', CAST(o_orderdate AS DATE)) AS days_since,
        |       round(o_totalprice, 2) AS price_r,
        |       CAST(floor(abs(o_totalprice - 1000.0)) AS BIGINT) AS absdiff,
        |       o_orderkey % 7 AS k7,
        |       round(sqrt(o_totalprice), 3) AS price_sqrt
        |FROM orders""".stripMargin,
    "q_scalar_array" ->
      """SELECT vec_id,
        |       len(embedding) AS dim,
        |       round(CAST(embedding[1] AS DOUBLE), 4) AS first_val,
        |       round(list_reduce(
        |         list_prepend(0.0, list_transform(embedding, x -> CAST(x AS DOUBLE))),
        |         (acc, x) -> acc + x), 4) AS vsum,
        |       round(sqrt(list_reduce(
        |         list_prepend(0.0, list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
        |         (acc, x) -> acc + x)), 4) AS norm
        |FROM embeddings""".stripMargin,
    "q_scalar_json" ->
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events""".stripMargin,
    "q_join_inner" ->
      """SELECT o_orderkey, c_custkey, c_name, round(o_totalprice, 2) AS price
        |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "q_join_broadcast" ->
      """SELECT r_name, n_name, count(*) AS cnt, round(sum(c_acctbal), 2) AS bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q_join_semi_anti" ->
      """SELECT 'semi' AS op, count(*) AS cnt FROM customer
        |  WHERE c_custkey IN (SELECT o_custkey FROM orders)
        |UNION ALL
        |SELECT 'anti' AS op, count(*) AS cnt FROM customer
        |  WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""".stripMargin,
    "q_join_theta" ->
      """SELECT l_returnflag, count(*) AS cnt
        |FROM orders JOIN lineitem
        |  ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate
        |GROUP BY l_returnflag""".stripMargin,
    "q_join_asof" ->
      """SELECT e.event_id, e.user_id, o.o_orderkey
        |FROM events e
        |ASOF LEFT JOIN orders o
        |  ON e.user_id = o.o_custkey
        | AND date_trunc('microseconds', e.ts) >= o.o_orderdate""".stripMargin,
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, rn
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |             row_number() OVER (PARTITION BY o_custkey
        |               ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders)
        |WHERE rn <= 3""".stripMargin,
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |         ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_rev,
        |       round(lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
        |         ORDER BY o_orderdate, o_orderkey), 2) AS prev_price
        |FROM orders""".stripMargin
  )
}
