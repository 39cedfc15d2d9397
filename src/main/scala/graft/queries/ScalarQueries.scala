package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.KvOps

/** SURVEY.md §2.3/§2.7/§2.8 — projections, casts, scalar functions, set
  * operations, and the differential-comparison join, each with a DuckDB
  * oracle. Engine-vs-oracle dialect notes are inline where semantics
  * differ (cast rounding, 1-based list indexing, strftime patterns).
  */
object ScalarQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // P1/P2: literal enrichment — the trigger-metadata constants pattern
    "enrich_lit" -> ((s, dir) => {
      Tables(s, dir, "customer")
        .withColumn("source", lit("mds"))
        .withColumn("load_ww", lit(202532))
        .select(col("c_custkey"), col("source"), col("load_ww"))
        .orderBy(col("c_custkey"))
    }),

    // P5: cast (string/double → int). Spark cast truncates toward zero;
    // oracle uses floor() to match on the (positive) domain.
    "cast_int" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("int").as("qty_int"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // P6: struct build + field projection
    "struct_access" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .select(struct(col("o_orderkey").as("k"), col("o_orderstatus").as("st")).as("s"))
        .select(col("s.k").as("okey"), col("s.st").as("status"))
        .orderBy(col("okey"))
    }),

    // P7: array index (split + element 0)
    "array_index" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .select(col("o_orderkey"),
          split(col("o_orderpriority"), "-").getItem(0).as("prio_num"))
        .orderBy(col("o_orderkey"))
    }),

    // F1: row-key assembly via concat_ws
    "rowkey_assembly" -> ((s, dir) => {
      Tables(s, dir, "customer")
        .select(col("c_custkey"),
          concat_ws("|", col("c_custkey"), col("c_nationkey"), col("c_mktsegment"))
            .as("rowKey"))
        .orderBy(col("c_custkey"))
    }),

    // F2+F9: MUCR-style qualifier = flag ++ hex(len(id)) ++ id
    "qualifier_concat" -> ((s, dir) => {
      Tables(s, dir, "part")
        .select(col("p_partkey"),
          concat(col("p_brand"), lower(hex(length(col("p_type")))), col("p_type"))
            .as("qualifier"))
        .orderBy(col("p_partkey"))
    }),

    // F9: hex of a length
    "hex_len" -> ((s, dir) => {
      Tables(s, dir, "part")
        .select(col("p_partkey"), hex(length(col("p_name"))).as("hex_len"))
        .orderBy(col("p_partkey"))
    }),

    // F11: regex first-match extraction. No-match yields '' in BOTH
    // engines, and ''::int is an error under ANSI/DuckDB — null it out.
    "regex_extract" -> ((s, dir) => {
      val m = regexp_extract(col("props"), "\"k\": ([0-9]+)", 1)
      Tables(s, dir, "events")
        .select(col("event_id"),
          when(m =!= "", m.cast("int")).as("k"))
        .orderBy(col("event_id"))
    }),

    // F12: trailing-empty-preserving split
    "split_keep_trailing" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .select(col("o_orderkey"),
          KvOps.splitKeepTrailing(concat(col("o_orderpriority"), lit("--")), "-")
            .as("toks"))
        .select(col("o_orderkey"),
          size(col("toks")).as("n_toks"),
          array_join(col("toks"), "/").as("joined"))
        .orderBy(col("o_orderkey"))
    }),

    // F13: delimiter translate
    "translate_delim" -> ((s, dir) => {
      Tables(s, dir, "customer")
        .select(col("c_custkey"),
          translate(col("c_name"), "#0", "_x").as("tname"))
        .orderBy(col("c_custkey"))
    }),

    // F15: date formatting + month rollup
    "date_format_q" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("total"))
        .orderBy(col("month"))
    }),

    // F6: k=v detail parsing through a map (pure expressions, no UDF)
    "kv_parse" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .select(col("o_orderkey"),
          KvOps.kvParse(array(
            concat(lit("col1="), col("o_orderstatus")),
            concat(lit("col2="), col("o_orderpriority")))).as("m"))
        .select(col("o_orderkey"),
          element_at(col("m"), "col1").as("status"),
          element_at(col("m"), "col2").as("priority"))
        .orderBy(col("o_orderkey"))
    }),

    // F7: SQL-fragment builder accepted by selectExpr
    "expr_string" -> ((s, dir) => {
      Tables(s, dir, "nation")
        .selectExpr("n_nationkey",
          KvOps.exprWs("|", "n_name", "n_regionkey") + " as joined")
        .orderBy(col("n_nationkey"))
    }),

    // Extension (modern F6 analogue): JSON extraction over events.props.
    // try_cast keeps one malformed/non-numeric row from killing the
    // query (get_json_object nulls on bad JSON; the cast must too).
    "json_extract" -> ((s, dir) => {
      Tables(s, dir, "events")
        .select(col("event_type"),
          expr("try_cast(get_json_object(props, '$.k') AS int)").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
        .orderBy(col("event_type"))
    }),

    // the same extraction through Spark 4's native VARIANT type: parse
    // once into the binary variant encoding, typed path extraction after
    // — at scale the parse cost is paid once per row however many paths
    // are read, where get_json_object re-parses the string per path.
    // Extraction goes variant → STRING → try_cast int, NOT
    // variant_get(..., 'int') (which coerces booleans and truncates
    // doubles). Cross-engine cast parity is subtle — Spark's
    // try_cast('3.7' AS int) is NULL while DuckDB's ROUNDS to 4 — so
    // the ORACLE guards with an integer-pattern regex to reproduce
    // Spark's accept-integers-only semantics for every k type.
    "variant_extract" -> ((s, dir) => {
      Tables(s, dir, "events")
        .select(col("event_type"),
          expr("try_cast(try_variant_get(try_parse_json(props), " +
            "'$.k', 'string') AS int)").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
        .orderBy(col("event_type"))
    }),

    // F4: explode of a computed array
    "explode_group" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .select(col("o_orderkey"),
          explode(split(col("o_orderpriority"), "-")).as("tok"))
        .orderBy(col("o_orderkey"), col("tok"))
    }),

    // §2.7: union of same-schema batches (the 2000-file batch concept)
    "union_all" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      o.filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderstatus"))
        .unionByName(
          o.filter(col("o_orderstatus") === "O")
            .select(col("o_orderkey"), col("o_orderstatus")))
        .orderBy(col("o_orderkey"))
    }),

    // §2.7: except (distinct) — set-difference flavor of the diff
    "except_diff" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      o.filter(col("o_totalprice") > 100000).select(col("o_orderkey"))
        .except(o.filter(col("o_orderstatus") === "F").select(col("o_orderkey")))
        .orderBy(col("o_orderkey"))
    }),

    // J3: full differential comparison — file-side vs table-side values
    // with mismatch flags (the reference's file*/table* naming contract)
    "diff_compare" -> ((s, dir) => {
      val file = Tables(s, dir, "orders").select(
        col("o_orderkey").as("fileRowKey"),
        col("o_totalprice").cast("decimal(12,2)").as("fileValue"))
      val table = Tables(s, dir, "lineitem")
        .groupBy(col("l_orderkey").as("tableRowKey"))
        .agg(sum(col("l_extendedprice").cast("decimal(12,2)")).cast("decimal(18,2)")
          .as("tableValue"))
      file.join(table, col("fileRowKey") === col("tableRowKey"), "full_outer")
        .select(
          coalesce(col("fileRowKey"), col("tableRowKey")).as("rowKey"),
          col("fileValue").cast("double").as("fileValue"),
          col("tableValue").cast("double").as("tableValue"),
          coalesce(col("fileValue") === col("tableValue"), lit(false)).as("matched"))
        .orderBy(col("rowKey"))
    }),

    // §2.11: whole-query SQL surface over registered temp views
    "sql_api" -> ((s, dir) => {
      graft.Tables.registerAll(s, dir)
      s.sql(
        """SELECT o_orderstatus, count(*) AS n,
          |  cast(sum(cast(o_totalprice AS decimal(12,2))) AS double) AS total
          |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    }),

    // A5: per-load operational counters (result_metric shape)
    "load_metrics" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .agg(
          count(lit(1)).as("row_count"),
          countDistinct(col("o_custkey")).as("unit_count"),
          min(col("o_orderdate")).as("start_date"),
          max(col("o_orderdate")).as("end_date"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "enrich_lit" ->
      """SELECT c_custkey, 'mds' AS source, 202532 AS load_ww
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "cast_int" ->
      """SELECT l_orderkey, l_linenumber,
        |  cast(floor(l_quantity) AS integer) AS qty_int
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "struct_access" ->
      """SELECT o_orderkey AS okey, o_orderstatus AS status
        |FROM orders ORDER BY okey""".stripMargin,

    "array_index" ->
      """SELECT o_orderkey, string_split(o_orderpriority, '-')[1] AS prio_num
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "rowkey_assembly" ->
      """SELECT c_custkey,
        |  concat_ws('|', c_custkey, c_nationkey, c_mktsegment) AS rowKey
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "qualifier_concat" ->
      """SELECT p_partkey,
        |  p_brand || lower(hex(length(p_type))) || p_type AS qualifier
        |FROM part ORDER BY p_partkey""".stripMargin,

    "hex_len" ->
      """SELECT p_partkey, hex(length(p_name)) AS hex_len
        |FROM part ORDER BY p_partkey""".stripMargin,

    "regex_extract" ->
      """SELECT event_id,
        |  cast(nullif(regexp_extract(props, '"k": ([0-9]+)', 1), '') AS integer) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "split_keep_trailing" ->
      """SELECT o_orderkey,
        |  len(string_split(o_orderpriority || '--', '-')) AS n_toks,
        |  array_to_string(string_split(o_orderpriority || '--', '-'), '/') AS joined
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "translate_delim" ->
      """SELECT c_custkey, translate(c_name, '#0', '_x') AS tname
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "date_format_q" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n,
        |  cast(sum(cast(o_totalprice AS decimal(12,2))) AS double) AS total
        |FROM orders GROUP BY 1 ORDER BY month""".stripMargin,

    "kv_parse" ->
      """SELECT o_orderkey, o_orderstatus AS status, o_orderpriority AS priority
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "expr_string" ->
      """SELECT n_nationkey, concat_ws('|', n_name, n_regionkey) AS joined
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    // DuckDB sum(int) widens to HUGEINT (int128), which the driver's
    // fetch path renders as float — cast to bigint to match Spark's sum.
    // the SAME integer-pattern guard as variant_extract: DuckDB's bare
    // try_cast ROUNDS '3.7' to 4 (and parses '1e3' to 1000) where Spark
    // nulls both — an unguarded oracle diverges the day a non-integer k
    // lands in the fixture. The edge trim mirrors Spark's cast EXACTLY:
    // UTF8String.trimAll strips every char <= 0x20 (probe-verified:
    // \f, \v, NUL all trim to 42; NEL 0x85 does NOT), so a char-set
    // trim of just space/tab/CR/LF would diverge on a form-feed-padded k.
    "json_extract" ->
      """WITH x AS (
        |  SELECT event_type,
        |    CASE WHEN json_valid(props)
        |         THEN json_extract_string(props, '$.k') END AS ks
        |  FROM events),
        |t AS (SELECT event_type,
        |        regexp_replace(ks, '^[\x00-\x20]+|[\x00-\x20]+$', '', 'g') AS ks
        |      FROM x)
        |SELECT event_type, count(*) AS n,
        |  cast(sum(CASE WHEN regexp_matches(ks, '^[-+]?[0-9]+$')
        |      THEN try_cast(ks AS integer) END) AS bigint) AS sum_k
        |FROM t GROUP BY event_type ORDER BY event_type""".stripMargin,

    // variant extraction: the integer-pattern regex reproduces Spark's
    // try_cast(string AS int) semantics — DuckDB's bare try_cast ROUNDS
    // '3.7' to 4 where Spark nulls it, so an unguarded cast would
    // silently diverge the day a non-integer k appears in the fixture;
    // edge trim = [\x00-\x20] for the json_extract trimAll-parity reason
    "variant_extract" ->
      """WITH x AS (
        |  SELECT event_type,
        |    CASE WHEN json_valid(props)
        |         THEN json_extract_string(props, '$.k') END AS ks
        |  FROM events),
        |t AS (SELECT event_type,
        |        regexp_replace(ks, '^[\x00-\x20]+|[\x00-\x20]+$', '', 'g') AS ks
        |      FROM x)
        |SELECT event_type, count(*) AS n,
        |  cast(sum(CASE WHEN regexp_matches(ks, '^[-+]?[0-9]+$')
        |      THEN try_cast(ks AS integer) END) AS bigint) AS sum_k
        |FROM t GROUP BY event_type ORDER BY event_type""".stripMargin,

    "explode_group" ->
      """SELECT o_orderkey, unnest(string_split(o_orderpriority, '-')) AS tok
        |FROM orders ORDER BY o_orderkey, tok""".stripMargin,

    "union_all" ->
      """SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_orderkey""".stripMargin,

    "except_diff" ->
      """SELECT o_orderkey FROM orders WHERE o_totalprice > 100000
        |EXCEPT
        |SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_orderkey""".stripMargin,

    "diff_compare" ->
      """SELECT coalesce(f.o_orderkey, t.l_orderkey) AS rowKey,
        |  cast(f.v AS double) AS fileValue,
        |  cast(t.v AS double) AS tableValue,
        |  coalesce(f.v = t.v, false) AS matched
        |FROM (SELECT o_orderkey, cast(o_totalprice AS decimal(12,2)) AS v FROM orders) f
        |FULL OUTER JOIN (
        |  SELECT l_orderkey,
        |    cast(sum(cast(l_extendedprice AS decimal(12,2))) AS decimal(18,2)) AS v
        |  FROM lineitem GROUP BY l_orderkey) t
        |ON f.o_orderkey = t.l_orderkey
        |ORDER BY rowKey""".stripMargin,

    "sql_api" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  cast(sum(cast(o_totalprice AS decimal(12,2))) AS double) AS total
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "load_metrics" ->
      """SELECT count(*) AS row_count, count(DISTINCT o_custkey) AS unit_count,
        |  min(o_orderdate) AS start_date, max(o_orderdate) AS end_date
        |FROM orders""".stripMargin,
  )
}
