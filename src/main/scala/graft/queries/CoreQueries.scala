package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.model.Tables
import graft.ops.{Aggregates, Cdc, Events, Relational, Scalars, Skew, Temporal, Windows}

/** SURVEY.md §2.12 core inventory: scans, projections/filters, joins,
  * aggregations, windows, sorts, set ops, scalar functions, event windows.
  * Each query cites its reference semantics; oracle SQL is hand-written
  * DuckDB dialect (SURVEY.md §7.6 — no SQL generation).
  */
object CoreQueries {

  private def t(s: SparkSession, d: String, name: String): DataFrame =
    Tables.load(s, d, name)

  // ---------------------------------------------------------------- scans

  /** S1 parquet scan (datasets_parquet.py:124-131). Full-width scan with a
    * canonical ordering (exporter.py:90-92 sort-before-write policy).
    * NOTE: (l_orderkey, l_linenumber) is NOT unique in this synthetic
    * data — the ORDER BY spans enough columns to be total.
    */
  private val qScan = Q("q_scan",
    (s, d) => t(s, d, "lineitem").orderBy(
      col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
      col("l_suppkey"), col("l_quantity"), col("l_extendedprice")),
    Some("SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber, " +
      "l_partkey, l_suppkey, l_quantity, l_extendedprice"))

  /** S2 column-pruned scan (export_dp1.py:122-123 reads only
    * ["instrument","id"]). Catalyst pushes the projection into the
    * parquet reader — ReadSchema carries only these three columns.
    */
  private val qScanPrune = Q("q_scan_prune",
    (s, d) => t(s, d, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber", "l_quantity"),
    Some("SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem " +
      "ORDER BY l_orderkey, l_linenumber, l_quantity"))

  // --------------------------------------------- projections / predicates

  /** P1 projection (datasets_parquet.py:68-72 ref -> row columns). */
  private val qProject = Q("q_project",
    (s, d) => t(s, d, "orders").select(
      col("o_orderkey"),
      col("o_totalprice"),
      round(col("o_totalprice") * lit(0.1), 4).as("tax_amt"),
      upper(col("o_orderstatus")).as("status"))
      .orderBy("o_orderkey"),
    Some("SELECT o_orderkey, o_totalprice, " +
      "round(o_totalprice * CAST(0.1 AS DOUBLE), 4) AS tax_amt, " +
      "upper(o_orderstatus) AS status FROM orders ORDER BY o_orderkey"))

  /** P2 equality predicate (export_dp1.py:106-108 where instrument=...). */
  private val qFilterEq = Q("q_filter_eq",
    (s, d) => t(s, d, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .orderBy("c_custkey"),
    Some("SELECT * FROM customer WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey"))

  /** P3 suffix/glob predicate (export_dp1.py:81-94: endswith + fnmatch). */
  private val qFilterLike = Q("q_filter_like",
    (s, d) => t(s, d, "part")
      .filter(col("p_name").endsWith("bolt") || col("p_name").like("red%"))
      .select("p_partkey", "p_name", "p_brand")
      .orderBy("p_partkey"),
    Some("SELECT p_partkey, p_name, p_brand FROM part " +
      "WHERE p_name LIKE '%bolt' OR p_name LIKE 'red%' ORDER BY p_partkey"))

  /** P5 regex validation predicate (paths.py:20-23; import_dp1.py:92-93). */
  private val qFilterRlike = Q("q_filter_rlike",
    (s, d) => t(s, d, "documents")
      .filter(col("text").rlike("^(the|a) "))
      .select("doc_id", "lang", "n_chars")
      .orderBy("doc_id"),
    Some("SELECT doc_id, lang, n_chars FROM documents " +
      "WHERE regexp_matches(text, '^(the|a) ') ORDER BY doc_id"))

  // ---------------------------------------------------------------- joins

  /** J1 equi-join (exporter.py:124-132 dataset x collection search). */
  private val qJoinInner = Q("q_join_inner",
    (s, d) => t(s, d, "orders")
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_name", "o_totalprice")
      .orderBy("o_orderkey"),
    Some("SELECT o_orderkey, c_name, o_totalprice FROM orders " +
      "JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey"))

  /** J2 join against a literal key batch (export_dp1.py:110-116
    * join_data_coordinates). The key side is tiny and always broadcast.
    */
  private val qJoinBroadcast = Q("q_join_broadcast",
    (s, d) => {
      val keys = s.createDataFrame(Seq(
        (0, "BUILDING"), (1, "AUTOMOBILE"), (2, "MACHINERY")))
        .toDF("c_nationkey", "c_mktsegment")
      Relational.literalKeyJoin(
        t(s, d, "customer"), keys, Seq("c_nationkey", "c_mktsegment"))
        .select("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
        .orderBy("c_custkey")
    },
    Some("SELECT c_custkey, c_name, c_nationkey, c_mktsegment FROM customer " +
      "JOIN (VALUES (0,'BUILDING'),(1,'AUTOMOBILE'),(2,'MACHINERY')) AS k(nk, seg) " +
      "ON c_nationkey = k.nk AND c_mktsegment = k.seg ORDER BY c_custkey"))

  /** J3 star-schema expansion (exporter.py:85-87 with_dimension_records):
    * fact joined through the dimension chain. Small dims broadcast so the
    * only shuffle is the final aggregation.
    */
  private val qJoinStar = Q("q_join_star",
    (s, d) => t(s, d, "lineitem")
      .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        Scalars.sumCents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue_cents"),
        count(lit(1)).as("n"))
      .orderBy("r_name", "n_name"),
    Some("SELECT r_name, n_name, " +
      "CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents, " +
      "count(*) AS n FROM lineitem " +
      "JOIN orders ON l_orderkey = o_orderkey " +
      "JOIN customer ON o_custkey = c_custkey " +
      "JOIN nation ON c_nationkey = n_nationkey " +
      "JOIN region ON n_regionkey = r_regionkey " +
      "GROUP BY r_name, n_name ORDER BY r_name, n_name"))

  /** Left outer join (capability row, SURVEY.md §2.3 note). */
  private val qJoinLeft = Q("q_join_left",
    (s, d) => {
      val rich = t(s, d, "customer")
        .filter(col("c_acctbal") > 9000)
        .select("c_custkey", "c_name")
      t(s, d, "orders")
        .join(rich, col("o_custkey") === col("c_custkey"), "left")
        .select("o_orderkey", "c_name")
        .orderBy("o_orderkey")
    },
    Some("SELECT o_orderkey, c_name FROM orders LEFT JOIN " +
      "(SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 9000) " +
      "ON o_custkey = c_custkey ORDER BY o_orderkey"))

  /** J4 semi-join (exporter.py:136; importer.py:124). */
  private val qSemiJoin = Q("q_semi_join",
    (s, d) => Relational.semiJoin(
      t(s, d, "nation"),
      t(s, d, "supplier").select(col("s_nationkey").as("n_nationkey")),
      Seq("n_nationkey"))
      .select("n_nationkey", "n_name")
      .orderBy("n_nationkey"),
    Some("SELECT n_nationkey, n_name FROM nation " +
      "WHERE EXISTS (SELECT 1 FROM supplier WHERE s_nationkey = n_nationkey) " +
      "ORDER BY n_nationkey"))

  /** J5 anti-join (importer.py:71 skip_existing idempotent insert). */
  private val qAntiJoin = Q("q_anti_join",
    (s, d) => Relational.antiJoin(
      t(s, d, "nation"),
      t(s, d, "supplier").select(col("s_nationkey").as("n_nationkey")),
      Seq("n_nationkey"))
      .select("n_nationkey", "n_name")
      .orderBy("n_nationkey"),
    Some("SELECT n_nationkey, n_name FROM nation " +
      "WHERE NOT EXISTS (SELECT 1 FROM supplier WHERE s_nationkey = n_nationkey) " +
      "ORDER BY n_nationkey"))

  /** J6 find_first (exporter.py:75-87): per data ID (customer), the order
    * from the highest-priority collection (priority = parsed
    * o_orderpriority rank), deterministic tiebreak on o_orderkey.
    */
  private val qFindFirst = Q("q_find_first",
    (s, d) => Windows.findFirst(
      t(s, d, "orders"),
      keys = Seq(col("o_custkey")),
      priority = Seq(
        // an order with UNKNOWN priority must not outrank a ranked one
        // — nulls last, made explicit on BOTH engines (their defaults
        // disagree; null-fixture class)
        substring(col("o_orderpriority"), 1, 1).cast("int").asc_nulls_last,
        col("o_orderkey")))
      .select("o_custkey", "o_orderkey", "o_orderpriority")
      .orderBy("o_custkey"),
    Some("SELECT o_custkey, o_orderkey, o_orderpriority FROM (" +
      "SELECT o_custkey, o_orderkey, o_orderpriority, row_number() OVER (" +
      "PARTITION BY o_custkey " +
      "ORDER BY CAST(substr(o_orderpriority, 1, 1) AS INT) NULLS LAST, o_orderkey) AS rn " +
      "FROM orders) WHERE rn = 1 ORDER BY o_custkey"))

  /** J7 interval/range join (calibration validity, exporter.py:81-84,129):
    * probe timestamps against [begin, end) validity windows. Interval side
    * is broadcast -> BroadcastNestedLoopJoin, no shuffle of the fact side.
    */
  private val qRangeJoin = Q("q_range_join",
    (s, d) => {
      val iv = t(s, d, "orders")
        .filter(col("o_orderkey") % 1499 === 0)
        .select(
          col("o_orderkey").as("iv_id"),
          col("o_orderdate").as("begin"),
          (col("o_orderdate") + expr("INTERVAL 30 DAY")).as("end"))
      Relational.rangeJoin(
        t(s, d, "lineitem"), iv, col("l_shipdate"), col("begin"), col("end"))
        .groupBy("iv_id")
        .agg(count(lit(1)).as("n"),
          Scalars.sumCents(col("l_extendedprice")).as("price_cents"))
        .orderBy("iv_id")
    },
    Some("WITH iv AS (SELECT o_orderkey AS iv_id, o_orderdate AS b, " +
      "o_orderdate + INTERVAL 30 DAY AS e FROM orders WHERE o_orderkey % 1499 = 0) " +
      "SELECT iv_id, count(*) AS n, " +
      "CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS price_cents " +
      "FROM lineitem JOIN iv ON l_shipdate >= b AND l_shipdate < e " +
      "GROUP BY iv_id ORDER BY iv_id"))

  /** J7-at-scale twin: same semantics as q_range_join but through the
    * banded equi-join path for LARGE interval sides (shuffle join on a
    * coarse time band + exact post-filter; no broadcast, no nested
    * loop). The oracle is the plain interval-join SQL — green here
    * proves the band rewrite is exact, so the 100 TB lever isn't a
    * unit-test-only claim. Bands are 16-day buckets of epoch-day; each
    * 30-day interval explodes into 2-3 bands.
    */
  private val qRangeBanded = Q("q_range_banded",
    (s, d) => {
      val iv = t(s, d, "orders")
        .filter(col("o_orderkey") % 1499 === 0)
        .select(
          col("o_orderkey").as("iv_id"),
          col("o_orderdate").as("begin"),
          (col("o_orderdate") + expr("INTERVAL 30 DAY")).as("end"))
      Relational.bandedRangeJoin(
        t(s, d, "lineitem"), iv, col("l_shipdate"), col("begin"), col("end"),
        band = c => floor(unix_date(to_date(c)) / lit(16)).cast("long"))
        .groupBy("iv_id")
        .agg(count(lit(1)).as("n"),
          Scalars.sumCents(col("l_extendedprice")).as("price_cents"))
        .orderBy("iv_id")
    },
    Some("WITH iv AS (SELECT o_orderkey AS iv_id, o_orderdate AS b, " +
      "o_orderdate + INTERVAL 30 DAY AS e FROM orders WHERE o_orderkey % 1499 = 0) " +
      "SELECT iv_id, count(*) AS n, " +
      "CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS price_cents " +
      "FROM lineitem JOIN iv ON l_shipdate >= b AND l_shipdate < e " +
      "GROUP BY iv_id ORDER BY iv_id"))

  /** J1-under-skew twin: same output as q_join_inner through the salted
    * join (left rows scattered across salt replicas of the right side).
    * The oracle is the plain equi-join SQL — salting is an exact
    * rewrite; the salt key never changes the match set.
    */
  private val qJoinSalted = Q("q_join_salted",
    (s, d) => Skew.saltedJoin(
      t(s, d, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
      t(s, d, "customer").select(col("c_custkey").as("o_custkey"), col("c_name")),
      keys = Seq("o_custkey"), salt = 8)
      .select("o_orderkey", "c_name", "o_totalprice")
      .orderBy("o_orderkey"),
    Some("SELECT o_orderkey, c_name, o_totalprice FROM orders " +
      "JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey"))

  /** A5-under-skew twin: same output as q_group_collect through the
    * two-phase salted aggregation (partial collect per salt bucket,
    * flatten at the final group). The oracle is the plain group-collect
    * SQL — salting is an exact rewrite for any partial/merge pair that
    * composes associatively, and sort_array canonicalizes the
    * bucket-concatenation order.
    */
  private val qAggSalted = Q("q_agg_salted",
    (s, d) => Skew.saltedAgg(
      t(s, d, "nation"),
      keys = Seq(col("n_regionkey")), salt = 4,
      partial = collect_list,
      merge = p => array_join(sort_array(flatten(collect_list(p))), ","),
      valueCol = col("n_name"), as = "names")
      .orderBy("n_regionkey"),
    Some("SELECT n_regionkey, array_to_string(list_sort(list(n_name)), ',') AS names " +
      "FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"))

  // --------------------------------------------- aggregation / dedup

  /** A1 distinct key accumulation (exporter.py:73,89,106). */
  private val qDistinct = Q("q_distinct",
    (s, d) => Aggregates.distinctKeys(t(s, d, "orders"), Seq(col("o_custkey")))
      .orderBy("o_custkey"),
    Some("SELECT DISTINCT o_custkey FROM orders ORDER BY o_custkey"))

  /** A2 dedup on key subset (dimension_record_parquet.py:48-58), made
    * deterministic: survivor = min doc_id per (lang, source).
    */
  private val qDedupSubset = Q("q_dedup_subset",
    (s, d) => Relational.dedupBySubset(
      t(s, d, "documents"),
      keys = Seq(col("lang"), col("source")),
      order = Seq(col("doc_id")))
      .select("doc_id", "lang", "source")
      .orderBy("lang", "source"),
    Some("SELECT doc_id, lang, source FROM (" +
      "SELECT doc_id, lang, source, row_number() OVER (" +
      "PARTITION BY lang, source ORDER BY doc_id) AS rn FROM documents) " +
      "WHERE rn = 1 ORDER BY lang NULLS FIRST, source NULLS FIRST"))

  /** A3 first-wins by priority (datastore_parquet.py:66-76): per part, the
    * earliest shipped lineitem wins.
    */
  private val qFirstWins = Q("q_first_wins",
    (s, d) => Windows.firstWins(
      t(s, d, "lineitem"),
      keys = Seq(col("l_partkey")),
      // an UNKNOWN ship date must not win "earliest shipped" — nulls
      // last, explicit on both engines (null-fixture class)
      priority = Seq(col("l_shipdate").asc_nulls_last, col("l_orderkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice")))
      .select("l_partkey", "l_orderkey", "l_linenumber")
      .orderBy("l_partkey"),
    Some("SELECT l_partkey, l_orderkey, l_linenumber FROM (" +
      "SELECT l_partkey, l_orderkey, l_linenumber, row_number() OVER (" +
      "PARTITION BY l_partkey ORDER BY l_shipdate NULLS LAST, l_orderkey, l_linenumber, " +
      "l_quantity, l_extendedprice) AS rn " +
      "FROM lineitem) WHERE rn = 1 ORDER BY l_partkey"))

  /** A4 group-by-key (importer.py:79-97 chunk by run). */
  private val qGroupCount = Q("q_group_count",
    (s, d) => t(s, d, "orders")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), countDistinct(col("o_custkey")).as("nc"))
      .orderBy("o_orderstatus"),
    Some("SELECT o_orderstatus, count(*) AS n, count(DISTINCT o_custkey) AS nc " +
      "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"))

  /** A5 group -> nested collect (datastore_mapping.py:39-64), canonical
    * element order via sort_array (SURVEY.md §7.5e), flattened to a string
    * for dialect-proof comparison.
    */
  private val qGroupCollect = Q("q_group_collect",
    (s, d) => Aggregates.nestCollect(
      t(s, d, "nation"), Seq(col("n_regionkey")), col("n_name"), "names_arr")
      .withColumn("names", array_join(col("names_arr"), ","))
      .drop("names_arr")
      .orderBy("n_regionkey"),
    Some("SELECT n_regionkey, array_to_string(list_sort(list(n_name)), ',') AS names " +
      "FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"))

  /** A6 routed group dispatch (importer.py:106-117 TAGGED->associate,
    * CALIBRATION->certify).
    */
  private val qGroupRoute = Q("q_group_route",
    (s, d) => Aggregates.routeAndCount(
      t(s, d, "orders"),
      route = when(col("o_orderstatus") === "O", "open")
        .when(col("o_orderstatus") === "F", "finished")
        .otherwise("other"),
      aggs = Seq(count(lit(1)).as("n"),
        Scalars.sumCents(col("o_totalprice")).as("total_cents")))
      .orderBy("route"),
    Some("SELECT CASE WHEN o_orderstatus = 'O' THEN 'open' " +
      "WHEN o_orderstatus = 'F' THEN 'finished' ELSE 'other' END AS route, " +
      "count(*) AS n, CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents " +
      "FROM orders GROUP BY 1 ORDER BY route"))

  /** Rollup (capability row, SURVEY.md §2.4 note). */
  private val qRollup = Q("q_rollup",
    (s, d) => t(s, d, "customer")
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n"), Scalars.sumCents(col("c_acctbal")).as("bal_cents"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first),
    Some("SELECT r_name, n_name, count(*) AS n, " +
      "CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS bal_cents " +
      "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
      "JOIN region ON n_regionkey = r_regionkey " +
      "GROUP BY ROLLUP(r_name, n_name) " +
      "ORDER BY r_name NULLS FIRST, n_name NULLS FIRST"))

  /** Cube (capability row). */
  private val qCube = Q("q_cube",
    (s, d) => t(s, d, "orders")
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .cube(col("c_mktsegment"), col("o_orderpriority"))
      // gid disambiguates a DATA NULL group from a cube subtotal: with
      // nullable group keys the two print identically and (keys…) alone
      // is no longer a total order (null-fixture class)
      .agg(grouping_id(col("c_mktsegment"), col("o_orderpriority")).as("gid"),
        count(lit(1)).as("n"))
      .orderBy(col("gid"), col("c_mktsegment").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first),
    Some("SELECT c_mktsegment, o_orderpriority, " +
      "CAST(GROUPING(c_mktsegment, o_orderpriority) AS BIGINT) AS gid, " +
      "count(*) AS n FROM orders " +
      "JOIN customer ON o_custkey = c_custkey " +
      "GROUP BY CUBE(c_mktsegment, o_orderpriority) " +
      "ORDER BY gid, c_mktsegment NULLS FIRST, o_orderpriority NULLS FIRST"))

  /** grouping()/grouping_id() marker columns over a rollup: the only
    * way to distinguish a data NULL from a subtotal row — without them
    * rollup output is ambiguous whenever the grouped column is
    * nullable. Same single Expand + hash aggregate plan; the markers
    * ride the Expand's gid for free.
    */
  private val qGroupingId = Q("q_grouping_id",
    (s, d) => t(s, d, "customer")
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .rollup(col("n_name"), col("c_mktsegment"))
      .agg(
        grouping(col("n_name")).cast("long").as("g_nation"),
        grouping_id(col("n_name"), col("c_mktsegment")).as("gid"),
        count(lit(1)).as("n"))
      .orderBy(col("gid"), col("n_name").asc_nulls_first,
        col("c_mktsegment").asc_nulls_first),
    Some("SELECT n_name, c_mktsegment, " +
      "CAST(GROUPING(n_name) AS BIGINT) AS g_nation, " +
      "CAST(GROUPING(n_name, c_mktsegment) AS BIGINT) AS gid, count(*) AS n " +
      "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
      "GROUP BY ROLLUP(n_name, c_mktsegment) " +
      "ORDER BY gid, n_name NULLS FIRST, c_mktsegment NULLS FIRST"))

  /** Grouping sets (explicit set list — completes the rollup/cube family).
    * Dataset.groupingSets (Spark 4) plans the same single Expand +
    * HashAggregate as rollup/cube: each input row fans out once per set,
    * one hash exchange on the padded keys — no per-set rescan of the
    * source, which is what makes the family viable at 100 TB.
    * Sets here: (region, nation), (region), (mktsegment), () — a shape
    * rollup/cube cannot express (mixes two independent dimensions).
    */
  private val qGroupingSets = Q("q_grouping_sets",
    (s, d) => t(s, d, "customer")
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupingSets(
        Seq(
          Seq(col("r_name"), col("n_name")),
          Seq(col("r_name")),
          Seq(col("c_mktsegment")),
          Seq.empty[Column]),
        col("r_name"), col("n_name"), col("c_mktsegment"))
      // gid: same DATA-NULL-vs-subtotal disambiguation as q_cube — a
      // null c_mktsegment data group and the (r_name, n_name) sets'
      // padding print identically without it (null-fixture class)
      .agg(grouping_id(col("r_name"), col("n_name"), col("c_mktsegment")).as("gid"),
        count(lit(1)).as("n"), Scalars.sumCents(col("c_acctbal")).as("bal_cents"))
      .orderBy(col("gid"), col("r_name").asc_nulls_first,
        col("n_name").asc_nulls_first, col("c_mktsegment").asc_nulls_first),
    Some("SELECT r_name, n_name, c_mktsegment, " +
      "CAST(GROUPING(r_name, n_name, c_mktsegment) AS BIGINT) AS gid, count(*) AS n, " +
      "CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS bal_cents " +
      "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
      "JOIN region ON n_regionkey = r_regionkey " +
      "GROUP BY GROUPING SETS ((r_name, n_name), (r_name), (c_mktsegment), ()) " +
      "ORDER BY gid, r_name NULLS FIRST, n_name NULLS FIRST, c_mktsegment NULLS FIRST"))

  // ---------------------------------------------------------------- windows

  /** W2 running total over ordered frame. */
  private val qWindowRunning = Q("q_window_running",
    (s, d) => t(s, d, "orders").select(
      col("o_custkey"), col("o_orderkey"),
      round(Windows.running(
        sum(col("o_totalprice")),
        partition = Seq(col("o_custkey")),
        order = Seq(col("o_orderdate"), col("o_orderkey"))), 4).as("running"))
      .orderBy("o_custkey", "o_orderkey"),
    Some("SELECT o_custkey, o_orderkey, round(sum(o_totalprice) OVER (" +
      "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running " +
      "FROM orders ORDER BY o_custkey, o_orderkey"))

  /** W3 moving-frame aggregate (trailing 3-row moving average). The frame
    * ordering must be total over value-distinct rows (SURVEY.md §7.5a) —
    * (l_shipdate, l_orderkey, l_linenumber) alone ties in this data, so
    * l_quantity and l_extendedprice complete the order.
    */
  private val qWindowFrame = Q("q_window_frame",
    (s, d) => t(s, d, "lineitem").select(
      col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
      round(Windows.movingFrame(
        avg(col("l_quantity")),
        partition = Seq(col("l_suppkey")),
        order = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice")),
        preceding = 2), 4).as("mov_avg"))
      .orderBy("l_suppkey", "l_orderkey", "l_linenumber", "mov_avg"),
    // NULLS FIRST in the frame order = Spark's ASC default (l_shipdate
    // is nullable in the null fixture)
    Some("SELECT l_suppkey, l_orderkey, l_linenumber, round(avg(l_quantity) OVER (" +
      "PARTITION BY l_suppkey ORDER BY l_shipdate NULLS FIRST, l_orderkey, l_linenumber, " +
      "l_quantity, l_extendedprice " +
      "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mov_avg " +
      "FROM lineitem ORDER BY l_suppkey, l_orderkey, l_linenumber, mov_avg"))

  /** W4 ranking with ties. */
  private val qWindowRank = Q("q_window_rank",
    (s, d) => {
      val spec = Windows.rankSpec(
        Seq(col("p_brand")), Seq(col("p_retailprice").desc))
      t(s, d, "part").select(
        col("p_partkey"), col("p_brand"),
        rank().over(spec).as("rnk"),
        dense_rank().over(spec).as("drnk"))
        .orderBy("p_brand", "rnk", "p_partkey")
    },
    Some("SELECT p_partkey, p_brand, " +
      "rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS rnk, " +
      "dense_rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS drnk " +
      "FROM part ORDER BY p_brand NULLS FIRST, rnk, p_partkey"))

  /** W5 offset/navigation functions: lag/lead with defaults, ntile
    * bucketing, first_value — the per-customer order timeline view every
    * time-series user builds first. One window spec -> one Window exec
    * after a single hash exchange on the partition key; the engine's own
    * session oracle already leaned on lag (q_window_session), this makes
    * it product surface (graft.ops.Windows.lagOf/leadOf/ntileOf).
    */
  private val qWindowLag = Q("q_window_lag",
    (s, d) => {
      val part = Seq(col("o_custkey"))
      val ord = Seq(col("o_orderdate"), col("o_orderkey"))
      t(s, d, "orders").select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        Windows.lagOf(col("o_orderdate"), 1, null, part, ord).as("prev_date"),
        Windows.leadOf(col("o_orderdate"), 1, null, part, ord).as("next_date"),
        Windows.lagOf(col("o_totalprice"), 2, -1.0, part, ord).as("price_lag2"),
        Windows.ntileOf(4, part, ord).as("quartile"),
        first_value(col("o_orderkey"))
          .over(Windows.rankSpec(part, ord)).as("first_key"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    },
    Some("SELECT o_custkey, o_orderkey, o_orderdate, " +
      "lag(o_orderdate, 1) OVER w AS prev_date, " +
      "lead(o_orderdate, 1) OVER w AS next_date, " +
      "lag(o_totalprice, 2, -1.0) OVER w AS price_lag2, " +
      "ntile(4) OVER w AS quartile, " +
      "first_value(o_orderkey) OVER w AS first_key " +
      "FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) " +
      "ORDER BY o_custkey, o_orderdate, o_orderkey"))

  /** W6 RANGE-interval frame: trailing 30-day spend per customer. The
    * frame is value-based (all orders within 30 days, however many),
    * expressed by ordering on unix_date so Spark's long-offset
    * rangeBetween is exactly DuckDB's `RANGE BETWEEN INTERVAL 30 DAYS
    * PRECEDING` (graft.ops.Windows.rangeFrame scaladoc). Peers all enter
    * the frame, so the aggregate is deterministic without tiebreaks.
    */
  private val qWindowRange = Q("q_window_range",
    (s, d) => t(s, d, "orders").select(
      col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
      Windows.rangeFrame(
        Scalars.sumCents(col("o_totalprice")),
        partition = Seq(col("o_custkey")),
        // o_orderdate is a midnight-aligned TIMESTAMP_NTZ in this data, so
        // the day projection is exact (TESTDATA.md; verified no sub-day
        // components) — at day granularity the long-offset frame IS the
        // INTERVAL frame
        order = unix_date(to_date(col("o_orderdate"))),
        precedingUnits = 30).as("spend30_cents"))
      .orderBy("o_custkey", "o_orderdate", "o_orderkey"),
    Some("SELECT o_custkey, o_orderkey, o_orderdate, " +
      "CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) OVER (" +
      "PARTITION BY o_custkey ORDER BY o_orderdate " +
      "RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW) AS BIGINT) AS spend30_cents " +
      "FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey"))

  /** W6b RANGE-interval frame at timestamp granularity: trailing
    * 30-minute event count + value total per user. Ordered on
    * unix_micros(ts) so the long-offset frame is exactly DuckDB's
    * `RANGE BETWEEN INTERVAL 30 MINUTE PRECEDING` (events.ts is
    * micro-aligned — TESTDATA/FIXTURES; Tables.load truncates the nanos
    * column to the same micros DuckDB compares at). Integer cents keep
    * the frame sum bit-stable cross-engine (float addition order inside
    * a sliding frame is not).
    */
  private val qWindowRangeTs = Q("q_window_range_ts",
    (s, d) => {
      val micros30m = 30L * 60 * 1000 * 1000
      val ev = t(s, d, "events")
      ev.select(
        col("event_id"), col("user_id"), col("ts"),
        Windows.rangeFrame(count(lit(1)),
          partition = Seq(col("user_id")),
          order = unix_micros(col("ts")),
          precedingUnits = micros30m).as("w30_n"),
        Windows.rangeFrame(Scalars.sumCents(col("value")),
          partition = Seq(col("user_id")),
          order = unix_micros(col("ts")),
          precedingUnits = micros30m).as("w30_cents"))
        .orderBy("event_id")
    },
    Some("SELECT event_id, user_id, ts, " +
      "count(*) OVER w AS w30_n, " +
      "CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w AS BIGINT) AS w30_cents " +
      "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts " +
      "RANGE BETWEEN INTERVAL 30 MINUTE PRECEDING AND CURRENT ROW) " +
      "ORDER BY event_id"))

  /** W7 distribution functions: percent_rank / cume_dist / nth_value —
    * completes the analytic surface beside ranking (W4) and navigation
    * (W5). The ordering is total (orderkey tiebreak) so nth_value's
    * default running frame is identical across engines.
    */
  private val qWindowDist = Q("q_window_dist",
    (s, d) => {
      val spec = Windows.rankSpec(
        Seq(col("o_custkey")), Seq(col("o_orderdate"), col("o_orderkey")))
      t(s, d, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        round(percent_rank().over(spec), 6).as("pr"),
        round(cume_dist().over(spec), 6).as("cd"),
        nth_value(col("o_orderkey"), 2).over(spec).as("second_key"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("SELECT o_custkey, o_orderkey, " +
      "round(percent_rank() OVER w, 6) AS pr, " +
      "round(cume_dist() OVER w, 6) AS cd, " +
      "nth_value(o_orderkey, 2) OVER w AS second_key " +
      "FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) " +
      "ORDER BY o_custkey, o_orderkey"))

  // -------------------------------------------------------- sorts / top-k

  /** O1/O3 composite-key sort (exporter.py:90-92 compressibility policy). */
  private val qSort = Q("q_sort",
    (s, d) => t(s, d, "lineitem")
      .select("l_suppkey", "l_partkey", "l_orderkey", "l_linenumber")
      .orderBy("l_suppkey", "l_partkey", "l_orderkey", "l_linenumber"),
    Some("SELECT l_suppkey, l_partkey, l_orderkey, l_linenumber FROM lineitem " +
      "ORDER BY l_suppkey, l_partkey, l_orderkey, l_linenumber"))

  /** O2 (collection, data-ID) sort (exporter.py:137-140). */
  private val qSortMulti = Q("q_sort_multi",
    (s, d) => t(s, d, "orders")
      .select("o_orderpriority", "o_orderdate", "o_orderkey")
      .orderBy("o_orderpriority", "o_orderdate", "o_orderkey"),
    Some("SELECT o_orderpriority, o_orderdate, o_orderkey FROM orders " +
      // NULLS FIRST = Spark's ASC default (null fixture: priority is nullable)
      "ORDER BY o_orderpriority NULLS FIRST, o_orderdate, o_orderkey"))

  /** O6 top-k: Spark plans TakeOrderedAndProject (no global sort). */
  private val qTopk = Q("q_topk",
    (s, d) => t(s, d, "orders")
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
      .orderBy(col("o_totalprice").desc, col("o_orderkey")),
    Some("SELECT o_orderkey, o_totalprice FROM orders " +
      "ORDER BY o_totalprice DESC, o_orderkey LIMIT 20"))

  // ---------------------------------------------------------------- set ops

  /** E1 union-distinct (export_dp1.py:74; exporter.py:47,94). */
  private val qUnion = Q("q_union",
    (s, d) => t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
      .union(t(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
      .distinct()
      .orderBy("nationkey"),
    Some("SELECT c_nationkey AS nationkey FROM customer " +
      "UNION SELECT s_nationkey FROM supplier ORDER BY nationkey"))

  /** E2 difference for validation (importer.py:36-39). */
  private val qExcept = Q("q_except",
    (s, d) => Relational.validateSubset(
      t(s, d, "customer").select(col("c_nationkey").as("nationkey")),
      t(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey"),
    Some("SELECT c_nationkey AS nationkey FROM customer " +
      "EXCEPT SELECT s_nationkey FROM supplier ORDER BY nationkey"))

  /** E3 intersect (importer.py:46 membership check). */
  private val qIntersect = Q("q_intersect",
    (s, d) => t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
      .intersect(t(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey"),
    Some("SELECT c_nationkey AS nationkey FROM customer " +
      "INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey"))

  /** E2b multiset difference: EXCEPT ALL keeps multiplicity (a nation
    * with 30 customers and 4 suppliers survives 26 times) — the
    * reconciliation semantics "how many MORE rows does A have", which
    * set-EXCEPT collapses to membership. Catalyst plans exceptAll as a
    * counted anti-rewrite (aggregate + generate), one hash exchange —
    * not a row-by-row loop.
    */
  private val qExceptAll = Q("q_except_all",
    (s, d) => t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
      .exceptAll(t(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey"),
    Some("SELECT c_nationkey AS nationkey FROM customer " +
      "EXCEPT ALL SELECT s_nationkey FROM supplier ORDER BY nationkey"))

  /** E3b multiset intersection: INTERSECT ALL keeps min-multiplicity per
    * value — the overlap-volume semantics membership-INTERSECT drops.
    */
  private val qIntersectAll = Q("q_intersect_all",
    (s, d) => t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
      .intersectAll(t(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey"),
    Some("SELECT c_nationkey AS nationkey FROM customer " +
      "INTERSECT ALL SELECT s_nationkey FROM supplier ORDER BY nationkey"))

  // --------------------------------------------------------------- scalars

  /** F1/F4 prefix replace (import_dp1.py:83-90). */
  private val qStrReplace = Q("q_str_replace",
    (s, d) => t(s, d, "nation").select(
      col("n_nationkey"),
      Scalars.PathOps.replacePrefix(col("n_name"), "NATION_", "nation/").as("path"))
      .orderBy("n_nationkey"),
    Some("SELECT n_nationkey, regexp_replace(n_name, '^NATION_', 'nation/') AS path " +
      "FROM nation ORDER BY n_nationkey"))

  /** F2 multi-branch prefix routing (import_dp1.py:106-118). */
  private val qStrRoute = Q("q_str_route",
    (s, d) => t(s, d, "documents").select(
      col("doc_id"),
      Scalars.PathOps.route(col("source"),
        Seq("src1" -> "raw/", "src2" -> "refcat/"), "dp1/").as("routed"))
      .orderBy("doc_id"),
    Some("SELECT doc_id, CASE " +
      "WHEN starts_with(source, 'src1') THEN 'raw/' || source " +
      "WHEN starts_with(source, 'src2') THEN 'refcat/' || source " +
      "ELSE 'dp1/' || source END AS routed FROM documents ORDER BY doc_id"))

  /** F3 fragment strip (generate_dp1_file_tree.py:67-72). */
  private val qStrSplit = Q("q_str_split",
    (s, d) => {
      val path = concat(col("source"), lit("#unzip="), col("lang"))
      t(s, d, "documents").select(
        col("doc_id"),
        Scalars.PathOps.stripFragment(path).as("base"),
        Scalars.PathOps.fragment(path).as("frag"))
        .orderBy("doc_id")
    },
    // the null guard mirrors Spark's null-propagating concat: DuckDB's
    // split_part(NULL, …) returns '' rather than NULL
    Some("SELECT doc_id, CASE WHEN source IS NULL OR lang IS NULL THEN NULL " +
      "ELSE split_part(source || '#unzip=' || lang, '#', 1) END AS base, " +
      "CASE WHEN source IS NULL OR lang IS NULL THEN NULL " +
      "ELSE split_part(source || '#unzip=' || lang, '#', 2) END AS frag " +
      "FROM documents ORDER BY doc_id"))

  /** F7 binary <-> hex round trip (datasets_parquet.py:70; utils.py:24-26
    * UUID bytes). hex on both sides for BLOB-safe comparison
    * (SURVEY.md §7.6).
    */
  private val qBinHex = Q("q_bin_hex",
    (s, d) => t(s, d, "customer").select(
      col("c_custkey"),
      hex(col("c_name")).as("h"),
      hex(unhex(hex(col("c_name")))).as("rt"))
      .orderBy("c_custkey"),
    Some("SELECT c_custkey, hex(c_name) AS h, hex(unhex(hex(c_name))) AS rt " +
      "FROM customer ORDER BY c_custkey"))

  /** F9 date/timestamp handling; BIGINT epoch-micros keys for unit-drift-
    * proof comparison.
    */
  private val qDateTrunc = Q("q_date_trunc",
    (s, d) => t(s, d, "orders")
      .groupBy(
        unix_micros(date_trunc("month", col("o_orderdate"))).as("m_us"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"))
      .agg(count(lit(1)).as("n"),
        Scalars.sumCents(col("o_totalprice")).as("total_cents"))
      .orderBy("m_us"),
    Some("SELECT epoch_us(date_trunc('month', o_orderdate)) AS m_us, " +
      "year(o_orderdate) AS yr, month(o_orderdate) AS mo, count(*) AS n, " +
      "CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents " +
      "FROM orders GROUP BY 1, 2, 3 ORDER BY m_us"))

  /** F10 arithmetic aggregate (TPC-H Q1 shape), exact cents sums. */
  private val qMathExpr = Q("q_math_expr",
    (s, d) => t(s, d, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Scalars.sumCents(col("l_extendedprice")
          * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("rev_cents"),
        sum(Scalars.moneyCents(col("l_quantity"))).as("qty_cents"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus"),
    Some("SELECT l_returnflag, l_linestatus, " +
      "CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents, " +
      "CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS qty_cents, " +
      "count(*) AS n FROM lineitem GROUP BY l_returnflag, l_linestatus " +
      "ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"))

  /** Exact discrete percentiles (p50/p90) per group by explicit
    * window-rank selection — not percentile_disc/quantile_disc, whose
    * index conventions differ between engines: both sides compute
    * row_number over the value order and pick rank ceil(p*n), so the
    * selected VALUE is engine-independent even under ties (any
    * tie-order yields the same value at a given rank).
    */
  private val qPercentileDisc = Q("q_percentile_disc",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
      val ranked = t(s, d, "lineitem").select(
        col("l_returnflag"), col("l_extendedprice"),
        row_number().over(w).as("rn"),
        count(lit(1)).over(Window.partitionBy("l_returnflag")).as("cnt"))
      ranked.groupBy("l_returnflag")
        .agg(
          max(when(col("rn") === ceil(col("cnt") * 0.5), col("l_extendedprice")))
            .as("p50"),
          max(when(col("rn") === ceil(col("cnt") * 0.9), col("l_extendedprice")))
            .as("p90"))
        .orderBy("l_returnflag")
    },
    Some("WITH ranked AS (SELECT l_returnflag, l_extendedprice, " +
      "row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn, " +
      "count(*) OVER (PARTITION BY l_returnflag) AS cnt FROM lineitem) " +
      "SELECT l_returnflag, " +
      "max(CASE WHEN rn = ceil(cnt * 0.5) THEN l_extendedprice END) AS p50, " +
      "max(CASE WHEN rn = ceil(cnt * 0.9) THEN l_extendedprice END) AS p90 " +
      "FROM ranked GROUP BY l_returnflag ORDER BY l_returnflag NULLS FIRST"))

  /** Continuous (interpolated) percentile per group, from explicit
    * order statistics: target rank t = 1 + (n-1)p, value = v[floor(t)]
    * + frac(t) * (v[floor(t)+1] - v[floor(t)]). Built from the same
    * window-rank scaffold as q_percentile_disc rather than the built-in
    * `percentile`, so BOTH engines evaluate the identical interpolation
    * expression on integer cents — bit-stable, no FP-formula drift
    * between implementations. One window + one hash aggregate.
    */
  private val qPercentileCont = Q("q_percentile_cont",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val cents = Scalars.moneyCents(col("l_extendedprice"))
      val w = Window.partitionBy("l_returnflag")
        .orderBy("cents", "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      val ranked = t(s, d, "lineitem")
        .select(col("l_returnflag"), cents.as("cents"),
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
        .withColumn("rn", row_number().over(w))
        .withColumn("cnt", count(lit(1))
          .over(Window.partitionBy("l_returnflag")))
      def t50(p: Double) =
        lit(1.0) + (col("cnt") - 1).cast("double") * lit(p)
      val g = ranked.groupBy("l_returnflag").agg(
        max(col("cnt")).as("n"),
        max(when(col("rn") === floor(t50(0.5)).cast("long"), col("cents"))).as("l50"),
        max(when(col("rn") === floor(t50(0.5)).cast("long") + 1, col("cents"))).as("u50"),
        max(when(col("rn") === floor(t50(0.9)).cast("long"), col("cents"))).as("l90"),
        max(when(col("rn") === floor(t50(0.9)).cast("long") + 1, col("cents"))).as("u90"))
      def interp(p: Double, l: String, u: String) = {
        val tt = lit(1.0) + (col("n") - 1).cast("double") * lit(p)
        val frac = tt - floor(tt)
        round(col(l).cast("double") +
          frac * (coalesce(col(u), col(l)).cast("double") - col(l).cast("double")), 4)
      }
      g.select(col("l_returnflag"), col("n"),
        interp(0.5, "l50", "u50").as("p50"),
        interp(0.9, "l90", "u90").as("p90"))
        .orderBy("l_returnflag")
    },
    Some("WITH ranked AS (SELECT l_returnflag, " +
      "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents, " +
      "row_number() OVER (PARTITION BY l_returnflag ORDER BY " +
      "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT), l_orderkey, l_linenumber, l_partkey, l_suppkey) AS rn, " +
      "count(*) OVER (PARTITION BY l_returnflag) AS cnt FROM lineitem), " +
      "g AS (SELECT l_returnflag, max(cnt) AS n, " +
      "max(CASE WHEN rn = CAST(floor(1.0 + CAST(cnt - 1 AS DOUBLE) * 0.5) AS BIGINT) THEN cents END) AS l50, " +
      "max(CASE WHEN rn = CAST(floor(1.0 + CAST(cnt - 1 AS DOUBLE) * 0.5) AS BIGINT) + 1 THEN cents END) AS u50, " +
      "max(CASE WHEN rn = CAST(floor(1.0 + CAST(cnt - 1 AS DOUBLE) * 0.9) AS BIGINT) THEN cents END) AS l90, " +
      "max(CASE WHEN rn = CAST(floor(1.0 + CAST(cnt - 1 AS DOUBLE) * 0.9) AS BIGINT) + 1 THEN cents END) AS u90 " +
      "FROM ranked GROUP BY l_returnflag) " +
      "SELECT l_returnflag, n, " +
      "round(CAST(l50 AS DOUBLE) + ((1.0 + CAST(n - 1 AS DOUBLE) * 0.5) - floor(1.0 + CAST(n - 1 AS DOUBLE) * 0.5)) * " +
      "(CAST(coalesce(u50, l50) AS DOUBLE) - CAST(l50 AS DOUBLE)), 4) AS p50, " +
      "round(CAST(l90 AS DOUBLE) + ((1.0 + CAST(n - 1 AS DOUBLE) * 0.9) - floor(1.0 + CAST(n - 1 AS DOUBLE) * 0.9)) * " +
      "(CAST(coalesce(u90, l90) AS DOUBLE) - CAST(l90 AS DOUBLE)), 4) AS p90 " +
      "FROM g ORDER BY l_returnflag NULLS FIRST"))

  /** F12 deterministic least-squares fit + Pearson r per group
    * (graft.ops.Aggregates.linearFit): price-vs-quantity regression from
    * EXACT integer moments (quantity units x whole dollars), so the
    * estimates are bit-stable at any parallelism — unlike regr_slope /
    * corr, whose running double covariances depend on partition merge
    * order. One hash aggregate; the closed forms evaluate once per group.
    */
  private val qRegrFit = Q("q_regr_fit",
    (s, d) => Aggregates.linearFit(
      t(s, d, "lineitem"),
      groupKeys = Seq(col("l_returnflag")),
      x = col("l_quantity"),
      y = floor(col("l_extendedprice")))
      .orderBy("l_returnflag"),
    Some("WITH m AS (SELECT l_returnflag, count(*) AS n, " +
      "sum(CAST(l_quantity AS BIGINT)) AS sx, " +
      "sum(CAST(floor(l_extendedprice) AS BIGINT)) AS sy, " +
      "sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx, " +
      "sum(CAST(l_quantity AS BIGINT) * CAST(floor(l_extendedprice) AS BIGINT)) AS sxy, " +
      "sum(CAST(floor(l_extendedprice) AS BIGINT) * CAST(floor(l_extendedprice) AS BIGINT)) AS syy " +
      "FROM lineitem GROUP BY 1), " +
      "md AS (SELECT l_returnflag, n, CAST(n AS DOUBLE) AS nd, " +
      "CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd, " +
      "CAST(sxx AS DOUBLE) AS sxxd, CAST(sxy AS DOUBLE) AS sxyd, " +
      "CAST(syy AS DOUBLE) AS syyd FROM m) " +
      // NULLIF guards mirror linearFit's null-guarded divisors: a
      // constant-x group reports NULL slope/r, never a crash or ±inf
      "SELECT l_returnflag, n, " +
      "round((nd * sxyd - sxd * syd) / NULLIF(nd * sxxd - sxd * sxd, 0), 4) AS slope, " +
      "round((syd - ((nd * sxyd - sxd * syd) / NULLIF(nd * sxxd - sxd * sxd, 0)) * sxd) / NULLIF(nd, 0), 4) AS intercept, " +
      "round((nd * sxyd - sxd * syd) / NULLIF(sqrt(nd * sxxd - sxd * sxd) * sqrt(nd * syyd - syd * syd), 0), 4) AS r " +
      "FROM md ORDER BY l_returnflag NULLS FIRST"))

  /** F11 array function: dot product vs a query vector, via built-in
    * zip_with + aggregate (no UDF, stays in codegen).
    */
  private val qArrayDot = Q("q_array_dot",
    (s, d) => {
      val emb = t(s, d, "embeddings")
      val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
      emb.crossJoin(broadcast(qv)).select(
        col("vec_id"),
        // + 0.0 normalizes IEEE signed zero: Spark's round() goes
        // through BigDecimal and emits 0.0 where DuckDB's keeps -0.0
        // (skew-fixture class: a tiny negative dot rounding to zero
        // hashes differently without it)
        (round(aggregate(
          zip_with(col("embedding"), col("qe"),
            (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, x) => acc + x), 4) + lit(0.0)).as("dot"))
        .orderBy("vec_id")
    },
    // the guard mirrors zip_with's null-pad: a null/short/empty vector
    // dots to NULL in Spark, while DuckDB's list_dot_product ERRORS on
    // null elements (null-fixture class)
    Some("WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) " +
      "SELECT vec_id, CASE WHEN e.embedding IS NULL " +
      "OR len(e.embedding) <> len(q.qe) THEN NULL ELSE " +
      "round(list_dot_product(" +
      "CAST(e.embedding AS DOUBLE[]), CAST(q.qe AS DOUBLE[])), 4) + 0.0 END " +
      "AS dot FROM embeddings e, q ORDER BY vec_id"))

  /** F11 JSON extraction from the events props payload. */
  private val qJsonExtract = Q("q_json_extract",
    (s, d) => t(s, d, "events").select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("int").as("k"))
      .orderBy("event_id"),
    Some("SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k " +
      "FROM events ORDER BY event_id"))

  /** Generator/UDTF slot (SURVEY.md §2.11): tokenize -> explode -> count. */
  private val qExplodeTokens = Q("q_explode_tokens",
    (s, d) => t(s, d, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
      .orderBy("token"),
    Some("SELECT token, count(*) AS n FROM " +
      "(SELECT unnest(string_split(text, ' ')) AS token FROM documents) " +
      "GROUP BY token ORDER BY token"))

  // ----------------------------------------------------- event windows

  /** T1 tumbling window aggregate (batch twin; streaming twin in
    * graft.streaming).
    */
  private val qWindowTumbling = Q("q_window_tumbling",
    (s, d) => Events.windowBoundsMicros(
      Events.tumbling(t(s, d, "events"), col("ts"), "1 hour",
        extraKeys = Seq(col("event_type")),
        aggs = Seq(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sv"))))
      .select("ws", "event_type", "n", "sv")
      .orderBy("ws", "event_type"),
    // WHERE ts IS NOT NULL: Spark's TimeWindowing rule filters null
    // event times out of every time window (null-fixture class)
    Some("SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) * 3600000000 AS ws, " +
      "event_type, count(*) AS n, round(sum(value), 4) AS sv " +
      "FROM events WHERE ts IS NOT NULL GROUP BY 1, 2 ORDER BY ws, event_type"))

  /** T2 sliding window aggregate (1 hour window, 15 minute slide). */
  private val qWindowSliding = Q("q_window_sliding",
    (s, d) => Events.windowBoundsMicros(
      Events.sliding(t(s, d, "events"), col("ts"), "1 hour", "15 minutes",
        extraKeys = Seq.empty,
        aggs = Seq(count(lit(1)).as("n"))))
      .select("ws", "n")
      .orderBy("ws"),
    Some("SELECT ws, count(*) AS n FROM (" +
      "SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 900000000) * 900000000 " +
      "- CAST(k AS BIGINT) * 900000000 AS ws " +
      "FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) " +
      "WHERE ts IS NOT NULL) " + // Spark time windows drop null ts
      "GROUP BY ws ORDER BY ws"))

  /** T3 session window (30 minute gap) per user; oracle via
    * gaps-and-islands SQL (SURVEY.md §2.10).
    */
  private val qWindowSession = Q("q_window_session",
    (s, d) => Events.session(t(s, d, "events"), col("ts"), "30 minutes",
      keys = Seq(col("user_id")),
      aggs = Seq(count(lit(1)).as("n")))
      .select(
        col("user_id"),
        unix_micros(col("session_window.start")).as("s_start"),
        unix_micros(col("session_window.end")).as("s_end"),
        col("n"))
      .orderBy("user_id", "s_start"),
    // ts filter: Spark session windows drop null times; user_id NULLS
    // FIRST mirrors Spark's ASC output order (user_id is nullable)
    Some("WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events " +
      "WHERE ts IS NOT NULL), " +
      "m AS (SELECT user_id, ts, CASE WHEN lag(ts) OVER w IS NULL " +
      "OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS ns " +
      "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)), " +
      "s AS (SELECT user_id, ts, sum(ns) OVER (PARTITION BY user_id ORDER BY ts " +
      "ROWS UNBOUNDED PRECEDING) AS sid FROM m) " +
      "SELECT user_id, epoch_us(min(ts)) AS s_start, " +
      "epoch_us(max(ts) + INTERVAL 30 MINUTE) AS s_end, count(*) AS n " +
      "FROM s GROUP BY user_id, sid ORDER BY user_id NULLS FIRST, s_start"))

  // ------------------------------------------- temporal / CDC / reshape

  /** J8 backward as-of join (attribution: each click attached to the most
    * recent prior view by the same user). The temporal analogue of the
    * reference's validity-interval lookup (exporter.py:81-84) with the
    * interval end left implicit. Union-sort implementation — one hash
    * exchange, linear work (graft.ops.Temporal); oracle is DuckDB's
    * native ASOF LEFT JOIN, so the rewrite is proven exact. Views are
    * pre-aggregated per (user_id, ts) to make the match deterministic.
    */
  private val qAsofJoin = Q("q_asof_join",
    (s, d) => {
      val ev = t(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts", "value")
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts").as("view_ts"))
        .agg(max(col("event_id")).as("view_id"),
          max(col("value")).as("view_value"))
      Temporal.asofJoinBackward(clicks, views, Seq("user_id"),
        leftTs = "ts", rightTs = "view_ts")
        .select("event_id", "user_id", "ts", "view_ts", "view_id", "view_value")
        .orderBy("event_id")
    },
    // null-match contract mirrored: clicks with unknown user/time keep
    // left-outer NULLs (DuckDB's native ASOF would otherwise sort a
    // NULL c.ts last and hand it the final view — null-fixture class)
    Some("WITH v AS (SELECT user_id, ts AS view_ts, max(event_id) AS view_id, " +
      "max(value) AS view_value FROM events WHERE event_type = 'view' " +
      "AND ts IS NOT NULL AND user_id IS NOT NULL GROUP BY 1, 2), " +
      "c AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'), " +
      "m AS (SELECT cm.event_id, cm.user_id, cm.ts, v.view_ts, v.view_id, v.view_value " +
      "FROM (SELECT * FROM c WHERE ts IS NOT NULL AND user_id IS NOT NULL) cm " +
      "ASOF LEFT JOIN v ON cm.user_id = v.user_id AND cm.ts >= v.view_ts) " +
      "SELECT * FROM m UNION ALL " +
      "SELECT event_id, user_id, ts, NULL, NULL, NULL FROM c " +
      "WHERE ts IS NULL OR user_id IS NULL ORDER BY event_id"))

  /** J8b forward as-of join: each click attached to the NEXT view at or
    * after it — the mirror of q_asof_join ("what did the user do next"),
    * same union-sort shape reversed in time (graft.ops.Temporal). Oracle
    * is DuckDB's native forward ASOF (`ON c.ts <= v.view_ts`).
    */
  private val qAsofForward = Q("q_asof_forward",
    (s, d) => {
      val ev = t(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts", "value")
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts").as("view_ts"))
        .agg(max(col("event_id")).as("view_id"),
          max(col("value")).as("view_value"))
      Temporal.asofJoinForward(clicks, views, Seq("user_id"),
        leftTs = "ts", rightTs = "view_ts")
        .select("event_id", "user_id", "ts", "view_ts", "view_id", "view_value")
        .orderBy("event_id")
    },
    // same null-match mirror as q_asof_join, time-reversed
    Some("WITH v AS (SELECT user_id, ts AS view_ts, max(event_id) AS view_id, " +
      "max(value) AS view_value FROM events WHERE event_type = 'view' " +
      "AND ts IS NOT NULL AND user_id IS NOT NULL GROUP BY 1, 2), " +
      "c AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'), " +
      "m AS (SELECT cm.event_id, cm.user_id, cm.ts, v.view_ts, v.view_id, v.view_value " +
      "FROM (SELECT * FROM c WHERE ts IS NOT NULL AND user_id IS NOT NULL) cm " +
      "ASOF LEFT JOIN v ON cm.user_id = v.user_id AND cm.ts <= v.view_ts) " +
      "SELECT * FROM m UNION ALL " +
      "SELECT event_id, user_id, ts, NULL, NULL, NULL FROM c " +
      "WHERE ts IS NULL OR user_id IS NULL ORDER BY event_id"))

  /** J8c nearest as-of join: each click attached to the time-CLOSEST
    * view in either direction, backward winning ties — the attribution
    * rule when sessions have no inherent direction. DuckDB has no
    * native nearest ASOF, so the oracle is an independent explicit
    * min-distance election (per-user candidate join + row_number over
    * (distance, view_ts)) — structurally unlike the Spark union-sort
    * double-carry, which is what makes the cross-check strong.
    */
  private val qAsofNearest = Q("q_asof_nearest",
    (s, d) => {
      val ev = t(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts", "value")
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts").as("view_ts"))
        .agg(max(col("event_id")).as("view_id"),
          max(col("value")).as("view_value"))
      Temporal.asofJoinNearest(clicks, views, Seq("user_id"),
        leftTs = "ts", rightTs = "view_ts")
        .select("event_id", "user_id", "ts", "view_ts", "view_id", "view_value")
        .orderBy("event_id")
    },
    // null-match mirror: null-ts clicks produce no candidates (their
    // NULL distance would otherwise rank arbitrarily); null users die
    // in the join equality on both engines
    Some("WITH v AS (SELECT user_id, ts AS view_ts, max(event_id) AS view_id, " +
      "max(value) AS view_value FROM events WHERE event_type = 'view' " +
      "AND ts IS NOT NULL GROUP BY 1, 2), " +
      "c AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'), " +
      "cand AS (SELECT c.event_id AS ce, v.view_ts, v.view_id, v.view_value, " +
      "row_number() OVER (PARTITION BY c.event_id " +
      "ORDER BY abs(epoch_ns(c.ts) - epoch_ns(v.view_ts)), v.view_ts) AS rn " +
      "FROM c JOIN v ON c.user_id = v.user_id WHERE c.ts IS NOT NULL) " +
      "SELECT c.event_id, c.user_id, c.ts, cand.view_ts, cand.view_id, cand.view_value " +
      "FROM c LEFT JOIN cand ON c.event_id = cand.ce AND cand.rn = 1 " +
      "ORDER BY c.event_id"))

  /** Time-series resample: daily purchase series per user regularized
    * onto a dense per-key date spine with forward-filled spend
    * (graft.ops.Temporal.resampleDailyFfill). The spine is sequence() +
    * explode over per-key bounds — generated distributed, never on the
    * driver — and spine/observed/carry all share the (user, day) order:
    * one aggregate exchange, one join, one window sort.
    */
  private val qResampleFfill = Q("q_resample_ffill",
    (s, d) => {
      val daily = t(s, d, "events")
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_buys"),
          Scalars.sumCents(col("value")).as("spend_cents"))
      Temporal.resampleDailyFfill(daily, Seq("user_id"), "day",
        fill = Seq("spend_cents"))
        .orderBy("user_id", "day")
    },
    Some("WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day, " +
      "count(*) AS n_buys, " +
      "CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS spend_cents " +
      "FROM events WHERE event_type = 'purchase' GROUP BY 1, 2), " +
      "bounds AS (SELECT user_id, min(day) AS mn, max(day) AS mx FROM daily GROUP BY 1), " +
      "spine AS (SELECT user_id, CAST(unnest(generate_series(" +
      "CAST(mn AS TIMESTAMP), CAST(mx AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day " +
      "FROM bounds), " +
      "j AS (SELECT s.user_id, s.day, d.n_buys, d.spend_cents, " +
      "d.user_id IS NULL AS is_gap " +
      "FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day) " +
      "SELECT user_id, day, n_buys, " +
      "last_value(spend_cents IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS spend_cents, is_gap " +
      "FROM j ORDER BY user_id NULLS FIRST, day"))

  /** Time-series resample with LINEAR INTERPOLATION across gaps
    * (graft.ops.Temporal.resampleDailyInterp): the continuous-measure
    * variant of q_resample_ffill. The backward and forward neighbor
    * carries are two frames over the SAME (user, day) sort — still one
    * aggregate exchange, one join, one window sort. Integer cents in,
    * one shared double formula out (bit-stable; oracle evaluates the
    * identical expression).
    */
  private val qResampleInterp = Q("q_resample_interp",
    (s, d) => {
      val daily = t(s, d, "events")
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(Scalars.sumCents(col("value")).as("spend_cents"))
      Temporal.resampleDailyInterp(daily, Seq("user_id"), "day",
        valueCol = "spend_cents")
        .select("user_id", "day", "is_gap", "interp")
        .orderBy("user_id", "day")
    },
    Some("WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day, " +
      "CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS spend_cents " +
      "FROM events WHERE event_type = 'purchase' GROUP BY 1, 2), " +
      "bounds AS (SELECT user_id, min(day) AS mn, max(day) AS mx FROM daily GROUP BY 1), " +
      "spine AS (SELECT user_id, CAST(unnest(generate_series(" +
      "CAST(mn AS TIMESTAMP), CAST(mx AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day " +
      "FROM bounds), " +
      "j AS (SELECT s.user_id, s.day, d.spend_cents, " +
      "d.user_id IS NULL AS is_gap FROM spine s " +
      "LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day), " +
      "c AS (SELECT user_id, day, spend_cents, is_gap, " +
      "CAST(day - DATE '1970-01-01' AS DOUBLE) AS dd, " +
      "CAST(last_value(CASE WHEN NOT is_gap AND spend_cents IS NOT NULL THEN day - DATE '1970-01-01' END IGNORE NULLS) " +
      "OVER wb AS DOUBLE) AS pd, " +
      "CAST(last_value(CASE WHEN NOT is_gap AND spend_cents IS NOT NULL THEN spend_cents END IGNORE NULLS) " +
      "OVER wb AS DOUBLE) AS pv, " +
      "CAST(first_value(CASE WHEN NOT is_gap AND spend_cents IS NOT NULL THEN day - DATE '1970-01-01' END IGNORE NULLS) " +
      "OVER wf AS DOUBLE) AS nd, " +
      "CAST(first_value(CASE WHEN NOT is_gap AND spend_cents IS NOT NULL THEN spend_cents END IGNORE NULLS) " +
      "OVER wf AS DOUBLE) AS nv " +
      "FROM j WINDOW wb AS (PARTITION BY user_id ORDER BY day " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), " +
      "wf AS (PARTITION BY user_id ORDER BY day " +
      "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) " +
      "SELECT user_id, day, is_gap, " +
      // obsOk gate mirrored: an observed day with a NULL value
      // interpolates like a gap day (it contributed no point)
      "CASE WHEN NOT is_gap AND spend_cents IS NOT NULL " +
      "THEN round(CAST(spend_cents AS DOUBLE), 4) " +
      "ELSE round(pv + (nv - pv) * (dd - pd) / (nd - pd), 4) END AS interp " +
      "FROM c ORDER BY user_id NULLS FIRST, day"))

  /** CDC merge (MERGE INTO semantics): orders replayed as a changelog
    * over customer — latest order per customer wins; status P deletes,
    * anything else patches the account balance (graft.ops.Cdc).
    */
  private val qMergeUpsert = Q("q_merge_upsert",
    (s, d) => {
      val changes = t(s, d, "orders").select(
        col("o_custkey").as("c_custkey"),
        col("o_orderkey").as("chg_seq"),
        when(col("o_orderstatus") === "P", "D").otherwise("U").as("chg_op"),
        col("o_totalprice").as("new_bal"))
      Cdc.applyChangelog(t(s, d, "customer"), changes, "c_custkey",
        seq = "chg_seq", op = "chg_op", patch = Map("c_acctbal" -> "new_bal"))
        .select(col("c_custkey"), col("c_name"), col("c_acctbal").as("acctbal"))
        .orderBy("c_custkey")
    },
    Some("WITH latest AS (SELECT o_custkey, o_totalprice, " +
      "CASE WHEN o_orderstatus = 'P' THEN 'D' ELSE 'U' END AS chg_op FROM orders " +
      "QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey DESC) = 1) " +
      "SELECT COALESCE(c_custkey, o_custkey) AS c_custkey, c_name, " +
      "COALESCE(o_totalprice, c_acctbal) AS acctbal " +
      "FROM customer FULL OUTER JOIN latest ON c_custkey = o_custkey " +
      "WHERE chg_op IS NULL OR chg_op <> 'D' ORDER BY c_custkey"))

  /** SCD Type 2 history build: the event feed replayed as tier changes
    * per user — consecutive same-tier events collapse, each transition
    * opens a version with valid_from/valid_to/is_current
    * (graft.ops.Cdc.scdType2). Both the collapse lag and the versioning
    * lead share one (user, ts) window spec: ONE hash exchange, one sort.
    */
  private val qScd2 = Q("q_scd2",
    (s, d) => {
      val changes = t(s, d, "events")
        .filter(col("event_type").isin("purchase", "refund", "signup"))
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("tier"))
      Cdc.scdType2(changes, Seq("user_id"), "ts",
        order = Seq("ts", "event_id"), tracked = Seq("tier"))
        .select(col("user_id"), col("event_id"), col("tier"),
          col("valid_from"), col("valid_to"), col("is_current"))
        .orderBy("user_id", "valid_from", "event_id")
    },
    // ts/user_id are nullable in the null fixture: NULLS FIRST makes
    // DuckDB's window + output order match Spark's ASC default
    Some("WITH src AS (SELECT user_id, ts, event_id, event_type AS tier " +
      "FROM events WHERE event_type IN ('purchase', 'refund', 'signup')), " +
      "collapsed AS (SELECT user_id, ts, event_id, tier FROM (" +
      "SELECT src.*, lag(tier) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id) AS prev_tier " +
      "FROM src) WHERE prev_tier IS NULL OR prev_tier IS DISTINCT FROM tier) " +
      "SELECT user_id, event_id, tier, ts AS valid_from, " +
      "lead(ts) OVER w AS valid_to, " +
      "lead(ts) OVER w IS NULL AS is_current " +
      "FROM collapsed WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id) " +
      "ORDER BY user_id NULLS FIRST, valid_from NULLS FIRST, event_id"))

  /** Keyed snapshot diff (graft.ops.Cdc.snapshotDiff): two order-book
    * snapshots derived from the same table by deterministic key rules —
    * emits I/D/U rows with old_/new_ payload pairs via ONE
    * key-partitioned full-outer join and a null-safe change predicate.
    * Money compared as integer cents so "changed" is exact.
    */
  private val qTableDiff = Q("q_table_diff",
    (s, d) => {
      val base = t(s, d, "orders").select(
        col("o_orderkey"), col("o_orderstatus"),
        Scalars.moneyCents(col("o_totalprice")).as("price_cents"))
      val older = base.filter(col("o_orderkey") % 7 =!= 0)
      val newer = base.filter(col("o_orderkey") % 5 =!= 0)
        .withColumn("price_cents",
          when(col("o_orderkey") % 3 === 0, col("price_cents") + 100)
            .otherwise(col("price_cents")))
      Cdc.snapshotDiff(older, newer, Seq("o_orderkey"))
        .orderBy("o_orderkey")
    },
    Some("WITH base AS (SELECT o_orderkey, o_orderstatus, " +
      "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents FROM orders), " +
      "o AS (SELECT * FROM base WHERE o_orderkey % 7 <> 0), " +
      "n AS (SELECT o_orderkey, o_orderstatus, " +
      "CASE WHEN o_orderkey % 3 = 0 THEN price_cents + 100 ELSE price_cents END AS price_cents " +
      "FROM base WHERE o_orderkey % 5 <> 0) " +
      "SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey, " +
      "CASE WHEN o.o_orderkey IS NULL THEN 'I' " +
      "WHEN n.o_orderkey IS NULL THEN 'D' ELSE 'U' END AS change_type, " +
      "o.o_orderstatus AS old_o_orderstatus, o.price_cents AS old_price_cents, " +
      "n.o_orderstatus AS new_o_orderstatus, n.price_cents AS new_price_cents " +
      "FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey " +
      "WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL " +
      "OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus " +
      "OR o.price_cents IS DISTINCT FROM n.price_cents " +
      "ORDER BY o_orderkey"))

  /** A8 pivot (long -> wide conditional aggregation). Spark's
    * RelationalGroupedDataset.pivot with explicit values — no extra
    * distinct-scan job, and the plan is a single hash aggregate.
    */
  private val qPivot = Q("q_pivot",
    (s, d) => t(s, d, "lineitem")
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(Scalars.sumCents(col("l_quantity")))
      .withColumnRenamed("F", "qty_f")
      .withColumnRenamed("O", "qty_o")
      .orderBy("l_returnflag"),
    Some("SELECT l_returnflag, " +
      "CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) END) AS BIGINT) AS qty_f, " +
      "CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) END) AS BIGINT) AS qty_o " +
      "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag NULLS FIRST"))

  /** A9 unpivot/melt (wide -> long). Per-order measure totals melted to
    * (order, measure, value) rows via Dataset.unpivot — a projection +
    * generate, no shuffle beyond the feeding aggregate.
    */
  private val qUnpivot = Q("q_unpivot",
    (s, d) => t(s, d, "lineitem")
      .groupBy("l_orderkey")
      .agg(
        Scalars.sumCents(col("l_quantity")).as("qty_cents"),
        Scalars.sumCents(col("l_extendedprice")).as("price_cents"),
        Scalars.sumCents(col("l_discount")).as("disc_cents"))
      .unpivot(Array(col("l_orderkey")),
        Array(col("qty_cents"), col("price_cents"), col("disc_cents")),
        "measure", "cents")
      .orderBy("l_orderkey", "measure"),
    Some("WITH w AS (SELECT l_orderkey, " +
      "CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS qty_cents, " +
      "CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS price_cents, " +
      "CAST(sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT) AS disc_cents " +
      "FROM lineitem GROUP BY 1) " +
      "SELECT l_orderkey, 'qty_cents' AS measure, qty_cents AS cents FROM w " +
      "UNION ALL SELECT l_orderkey, 'price_cents', price_cents FROM w " +
      "UNION ALL SELECT l_orderkey, 'disc_cents', disc_cents FROM w " +
      "ORDER BY l_orderkey, measure"))

  /** W8 gaps-and-islands: per-user runs of CONSECUTIVE purchase days
    * (the streak/retention analytic). The island key is
    * `day - row_number() days` — constant within a consecutive run,
    * jumping at every gap — so streaks fall out of one ranking window
    * plus one hash aggregate; no self-join, no iteration. Same shape
    * the engine's own session oracle uses for time-gap islands
    * (q_window_session), here on the calendar axis.
    */
  private val qStreaks = Q("q_streaks",
    (s, d) => {
      val days = t(s, d, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("day")
      days
        .withColumn("island", date_sub(col("day"), row_number().over(w)))
        .groupBy("user_id", "island")
        .agg(count(lit(1)).as("len"),
          min(col("day")).as("streak_start"),
          max(col("day")).as("streak_end"))
        .select("user_id", "streak_start", "streak_end", "len")
        .orderBy("user_id", "streak_start")
    },
    Some("WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day " +
      "FROM events WHERE event_type = 'purchase'), " +
      "isl AS (SELECT user_id, day, " +
      "day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INTEGER) AS island " +
      "FROM days) " +
      "SELECT user_id, min(day) AS streak_start, max(day) AS streak_end, " +
      "count(*) AS len FROM isl GROUP BY user_id, island " +
      "ORDER BY user_id NULLS FIRST, streak_start NULLS FIRST"))

  /** W10 moving z-score anomaly flags: each event scored against the
    * trailing 20-event mean/std of ITS OWN history (current row
    * excluded — self-inclusion dampens the very anomaly being tested).
    * The window moments are EXACT integer sums of cents and
    * cents-squared over a ROWS frame, and mean/std/z are one shared
    * double formula over those integers — bit-stable at any
    * parallelism, same contract as q_regr_fit. One user-key exchange;
    * both moment sums share the single Window exec.
    */
  private val qMovingZscore = Q("q_moving_zscore",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val cents = Scalars.moneyCents(col("value"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-20, -1)
      val m = t(s, d, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), cents.as("cents"))
        // pre-project the square: window sums over plain columns keep
        // all three moments in ONE Window exec (a derived input would
        // split a second Window node off)
        .withColumn("cents2", col("cents") * col("cents"))
        // count(cents), not count(*): a null-value purchase must not
        // inflate n while the moment sums skip it (null-fixture class)
        .withColumn("n", count(col("cents")).over(w))
        .withColumn("sx", sum(col("cents")).over(w))
        .withColumn("sxx", sum(col("cents2")).over(w))
      val nD = col("n").cast("double")
      val sx = col("sx").cast("double")
      val sxx = col("sxx").cast("double")
      // ANSI mode errors on /0 even when a later `when` discards the
      // row, so every divisor is null-guarded (null divides to null)
      val mean = sx / when(col("n") >= 1, nD)
      val varS = (nD * sxx - sx * sx) / when(col("n") >= 2, nD * (nD - lit(1.0)))
      val z = (col("cents").cast("double") - mean) / when(varS > 0, sqrt(varS))
      m.select(col("user_id"), col("ts"), col("event_id"), col("cents"),
        when(col("n") >= 3 && varS > 0, round(z, 4)).as("zscore"),
        // a row with no observable value cannot be flagged — false,
        // not three-valued NULL (the oracle's coalesce mirrors this)
        coalesce(col("n") >= 3 && varS > 0 && abs(z) > 2.0, lit(false))
          .as("is_anomaly"))
        .orderBy("user_id", "ts", "event_id")
    },
    Some("WITH p AS (SELECT user_id, ts, event_id, " +
      "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents " +
      "FROM events WHERE event_type = 'purchase'), " +
      "m AS (SELECT user_id, ts, event_id, cents, " +
      "count(cents) OVER w AS n, sum(cents) OVER w AS sx, " +
      "sum(cents * cents) OVER w AS sxx " +
      "FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id " +
      "ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)), " +
      "z AS (SELECT user_id, ts, event_id, cents, n, " +
      "(CAST(cents AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) / " +
      "sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / " +
      "(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) AS zraw, " +
      "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / " +
      "(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS vars FROM m) " +
      "SELECT user_id, ts, event_id, cents, " +
      "CASE WHEN n >= 3 AND vars > 0 THEN round(zraw, 4) END AS zscore, " +
      "coalesce(n >= 3 AND vars > 0 AND abs(zraw) > 2.0, FALSE) AS is_anomaly " +
      "FROM z ORDER BY user_id NULLS FIRST, ts NULLS FIRST, event_id"))

  /** W9 ordered funnel: per user, the earliest view -> first click
    * AFTER that view -> first purchase AFTER that click, then the
    * per-user stage reached (0-3). Stage timestamps are conditional
    * mins — one hash aggregate per stage riding the SAME user-key
    * exchange (AQE reuses it), with the sequence constraint expressed
    * as "min ts strictly after the previous stage's min ts" — never an
    * events self-join. The conversion analytic every product pipeline
    * runs.
    */
  /** W12 session path mining ([[graft.ops.Events.sessionTransitions]]):
    * event-type transition frequencies within 30-minute sessions — the
    * "what do users do next" table behind journey analysis. The session
    * membership test collapses into the lead() window itself (next
    * event within the gap ⟺ same session), so the whole query is one
    * window over one exchange on user_id plus one count aggregate — no
    * sessionization subquery, no self-join, at any event volume.
    */
  private val qSessionPaths = Q("q_session_paths",
    (s, d) => Events.sessionTransitions(
      t(s, d, "events"), key = col("user_id"), ts = col("ts"),
      kind = col("event_type"),
      order = Seq(col("ts"), col("event_id")),
      gapSeconds = 1800L)
      .orderBy("from_type", "to_type"),
    Some("WITH e AS (SELECT user_id, event_id, event_type, " +
      "CAST(ts AS TIMESTAMP) AS ts FROM events), " +
      "n AS (SELECT event_type AS from_type, " +
      "lead(event_type) OVER w AS to_type, " +
      "lead(ts) OVER w AS next_ts, ts " +
      "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) " +
      "SELECT from_type, to_type, count(*) AS n FROM n " +
      "WHERE to_type IS NOT NULL AND next_ts - ts < INTERVAL 30 MINUTE " +
      "GROUP BY 1, 2 ORDER BY from_type, to_type"))

  private val qFunnel = Q("q_funnel",
    (s, d) => {
      val ev = t(s, d, "events")
      val byUser = ev.groupBy("user_id").agg(
        min(when(col("event_type") === "view", col("ts"))).as("t_view"))
      val stages = ev.join(byUser, Seq("user_id"), "left")
        .groupBy(col("user_id"), col("t_view"))
        .agg(min(when(col("event_type") === "click" &&
          col("ts") > col("t_view"), col("ts"))).as("t_click"))
      val fin = ev.join(stages, Seq("user_id"), "left")
        .groupBy(col("user_id"), col("t_view"), col("t_click"))
        .agg(min(when(col("event_type") === "purchase" &&
          col("ts") > col("t_click"), col("ts"))).as("t_purchase"))
      fin.select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"),
        (when(col("t_purchase").isNotNull, 3)
          .when(col("t_click").isNotNull, 2)
          .when(col("t_view").isNotNull, 1)
          .otherwise(0)).cast("long").as("stage"))
        .orderBy("user_id")
    },
    Some("WITH s1 AS (SELECT user_id, " +
      "min(CASE WHEN event_type = 'view' THEN ts END) AS t_view " +
      "FROM events GROUP BY user_id), " +
      "s2 AS (SELECT e.user_id, s1.t_view, " +
      "min(CASE WHEN e.event_type = 'click' AND e.ts > s1.t_view THEN e.ts END) AS t_click " +
      "FROM events e LEFT JOIN s1 ON e.user_id = s1.user_id " +
      "GROUP BY e.user_id, s1.t_view), " +
      "s3 AS (SELECT e.user_id, s2.t_view, s2.t_click, " +
      "min(CASE WHEN e.event_type = 'purchase' AND e.ts > s2.t_click THEN e.ts END) AS t_purchase " +
      "FROM events e LEFT JOIN s2 ON e.user_id = s2.user_id " +
      "GROUP BY e.user_id, s2.t_view, s2.t_click) " +
      "SELECT user_id, t_view, t_click, t_purchase, " +
      "CAST(CASE WHEN t_purchase IS NOT NULL THEN 3 " +
      "WHEN t_click IS NOT NULL THEN 2 " +
      "WHEN t_view IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage " +
      "FROM s3 ORDER BY user_id NULLS FIRST"))

  /** A11 cohort retention matrix: users cohorted by first-purchase
    * week, counted per week offset of their later purchase activity —
    * the classic retention triangle. Two hash aggregates (first
    * purchase, then distinct user-week cells) over the same user
    * exchange; weeks are integer epoch-day arithmetic so both engines
    * bucket identically.
    */
  private val qCohortRetention = Q("q_cohort_retention",
    (s, d) => {
      val buys = t(s, d, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"),
          floor(unix_date(to_date(col("ts"))) / 7).cast("long").as("week"))
      val cohort = buys.groupBy("user_id").agg(min("week").as("cohort_week"))
      buys.join(cohort, "user_id")
        .select(col("user_id"), col("cohort_week"),
          (col("week") - col("cohort_week")).as("week_offset"))
        .distinct()
        .groupBy("cohort_week", "week_offset")
        .agg(count(lit(1)).as("users"))
        .orderBy("cohort_week", "week_offset")
    },
    Some("WITH buys AS (SELECT user_id, " +
      "CAST(floor((CAST(ts AS DATE) - DATE '1970-01-01') / 7) AS BIGINT) AS week " +
      "FROM events WHERE event_type = 'purchase'), " +
      "cohort AS (SELECT user_id, min(week) AS cohort_week FROM buys GROUP BY user_id), " +
      "cells AS (SELECT DISTINCT b.user_id, c.cohort_week, b.week - c.cohort_week AS week_offset " +
      "FROM buys b JOIN cohort c ON b.user_id = c.user_id) " +
      "SELECT cohort_week, week_offset, count(*) AS users FROM cells " +
      "GROUP BY cohort_week, week_offset " +
      "ORDER BY cohort_week NULLS FIRST, week_offset NULLS FIRST"))

  /** A10 fixed-width histogram — single hash aggregate over a computed
    * bucket key; the profile primitive behind the reference's summary
    * reports (importer.py report counts).
    */
  private val qHistogram = Q("q_histogram",
    (s, d) => t(s, d, "orders")
      .groupBy(floor(col("o_totalprice") / 50000).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
        Scalars.sumCents(col("o_totalprice")).as("total_cents"))
      .orderBy("bucket"),
    Some("SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket, " +
      "count(*) AS n, " +
      "CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents " +
      "FROM orders GROUP BY 1 ORDER BY bucket"))

  /** A10b equi-depth histogram: deciles over a TOTAL value ordering
    * (price, then orderkey — §7.5 determinism at bucket boundaries)
    * give same-count buckets whose [lo, hi] bounds ARE the decile
    * boundaries — the profile primitive for skew-aware partitioning
    * decisions, complementing q_histogram's fixed-width buckets.
    * Buckets come from [[Windows.globalNtile]] — exact ntile(10)
    * semantics from a range-partitioned sort + per-partition row_number
    * with prefix-sum offset correction, NOT `ntile over (ORDER BY ...)`,
    * whose empty PARTITION BY would collapse the whole table into one
    * task (fixture-invisible, 100 TB-fatal).
    */
  private val qHistogramEq = Q("q_histogram_eq",
    (s, d) => Windows.globalNtile(
        t(s, d, "orders").select("o_orderkey", "o_totalprice"),
        10, Seq(col("o_totalprice"), col("o_orderkey")),
        partitions = s.conf.get("spark.sql.shuffle.partitions").toInt,
        bucketName = "decile")
      .groupBy("decile")
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"),
        Scalars.sumCents(col("o_totalprice")).as("total_cents"))
      .orderBy("decile"),
    Some("WITH t AS (SELECT o_totalprice, " +
      "ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile FROM orders) " +
      "SELECT decile, count(*) AS n, min(o_totalprice) AS lo, " +
      "max(o_totalprice) AS hi, " +
      "CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents " +
      "FROM t GROUP BY decile ORDER BY decile"))

  /** A12 2-D Pareto frontier (skyline): parts where nothing is both
    * smaller and cheaper. The implementation is the sort-based frontier
    * (hash-agg to one row per size, running-min window over the
    * bounded distinct-size frame — [[Aggregates.skylineMinMin]]), NOT
    * the quadratic NOT-EXISTS self-join; the ORACLE is the quadratic
    * dominance formulation, so the two independent shapes checking
    * each other is the point of the test. Money in exact cents per the
    * §7.5 contract.
    */
  private val qSkyline = Q("q_skyline",
    (s, d) => Aggregates.skylineMinMin(
        t(s, d, "part").select(col("p_size"),
          Scalars.moneyCents(col("p_retailprice")).as("price_c")),
        col("p_size"), col("price_c"))
      .select(col("x").as("p_size"), col("y").as("price_c"))
      .orderBy("p_size"),
    // WHERE mirrors skylineMinMin's null-coordinate exclusion
    Some("WITH pts AS (SELECT p_size, " +
      "min(CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)) AS price_c " +
      "FROM part WHERE p_size IS NOT NULL AND p_retailprice IS NOT NULL " +
      "GROUP BY p_size) " +
      "SELECT p_size, price_c FROM pts a WHERE NOT EXISTS (" +
      "SELECT 1 FROM pts b WHERE b.p_size <= a.p_size " +
      "AND b.price_c <= a.price_c " +
      "AND (b.p_size < a.p_size OR b.price_c < a.price_c)) " +
      "ORDER BY p_size"))

  /** Exact decimal renderings of 0.5^i — parse to bit-identical doubles
    * in any engine (kept as literals so the oracle text stays readable).
    * Declared BEFORE qEwma: object vals initialize in source order.
    */
  private val EwmaW = Array("1.0", "0.5", "0.25", "0.125", "0.0625",
    "0.03125", "0.015625", "0.0078125")

  /** W11 bounded exponentially-weighted moving average per user
    * ([[Temporal.ewmaBounded]]): one window exec, eight lags, exact
    * power-of-two weights — the oracle rebuilds the identical
    * left-associated expression, so the doubles agree bit-for-bit
    * before the 4-decimal rounding.
    */
  private val qEwma = Q("q_ewma",
    (s, d) => Temporal.ewmaBounded(
        t(s, d, "events").select("user_id", "event_id", "ts", "value"),
        keys = Seq("user_id"), order = Seq("ts", "event_id"),
        value = col("value"), k = 8)
      .select("user_id", "event_id", "ewma")
      .orderBy("user_id", "event_id"),
    Some {
      val num = (1 to 7).map(i =>
        s" + CASE WHEN lag(value, $i) OVER w IS NOT NULL " +
          s"THEN ${EwmaW(i)} * lag(value, $i) OVER w ELSE 0.0 END").mkString
      val den = (1 to 7).map(i =>
        s" + CASE WHEN lag(value, $i) OVER w IS NOT NULL " +
          s"THEN ${EwmaW(i)} ELSE 0.0 END").mkString
      s"SELECT user_id, event_id, round((value$num) / (1.0$den), 4) AS ewma " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id) " +
        "ORDER BY user_id NULLS FIRST, event_id"
    })

  /** A14 statistical mode per group (most frequent p_type per brand,
    * lexicographic tiebreak): hash-agg the (group, value) counts, then
    * the find-first election over counts — argmax as one
    * WindowGroupLimit on the aggregate, never a self-join against a
    * max subquery.
    */
  private val qMode = Q("q_mode",
    (s, d) => Windows.findFirst(
        t(s, d, "part").groupBy("p_brand", "p_type")
          .agg(count(lit(1)).as("n")),
        // an UNKNOWN type never wins the election over a known one at
        // equal count — nulls last, explicit on both engines
        Seq(col("p_brand")), Seq(col("n").desc, col("p_type").asc_nulls_last))
      .orderBy("p_brand"),
    Some("SELECT p_brand, p_type, n FROM (" +
      "SELECT p_brand, p_type, count(*) AS n, " +
      "row_number() OVER (PARTITION BY p_brand " +
      "ORDER BY count(*) DESC, p_type NULLS LAST) AS rn " +
      "FROM part GROUP BY p_brand, p_type) WHERE rn = 1 " +
      "ORDER BY p_brand NULLS FIRST"))

  /** O7 per-group top-k WITH ties ([[Windows.rankTopK]]): everything
    * tied at the cutoff price makes the list — the rank() semantic
    * J6's row_number deliberately breaks. Same WindowGroupLimit
    * pushdown; rows tied at equal (brand, price) are identical, so the
    * (brand, price desc) ordering is hash-total.
    */
  private val qTopkTies = Q("q_topk_ties",
    (s, d) => Windows.rankTopK(
        t(s, d, "part").select(col("p_brand"),
          Scalars.moneyCents(col("p_retailprice")).as("price_c")),
        Seq(col("p_brand")), Seq(col("price_c").desc), k = 3, rankName = "rk")
      .select(col("p_brand"), col("price_c"), col("rk").cast("long").as("rk"))
      .orderBy(col("p_brand"), col("price_c").desc),
    Some("SELECT p_brand, price_c, CAST(rk AS BIGINT) AS rk FROM (" +
      "SELECT p_brand, CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_c, " +
      "rank() OVER (PARTITION BY p_brand " +
      "ORDER BY CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) DESC) AS rk " +
      "FROM part) WHERE rk <= 3 ORDER BY p_brand NULLS FIRST, price_c DESC"))

  /** T-ext gap detection ([[Temporal.gaps]]): adjacent same-user
    * events more than one hour apart — the "where did the feed stall"
    * time-series QA probe. One key shuffle into ONE window exec (both
    * lags share the frame), gaps filtered before anything downstream
    * materializes; (ts, event_id) makes the per-user order total.
    */
  private val qGaps = Q("q_gaps",
    (s, d) => Temporal.gaps(
        t(s, d, "events").select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("tus")),
        keys = Seq("user_id"), tsUs = col("tus"), tiebreak = col("event_id"),
        minGapUs = 3600000000L)
      .select("user_id", "prev_id", "event_id", "gap_us")
      .orderBy("user_id", "event_id"),
    Some("WITH e AS (SELECT user_id, event_id, " +
      "epoch_us(CAST(ts AS TIMESTAMP)) AS tus FROM events), " +
      "l AS (SELECT user_id, event_id, tus, lag(tus) OVER w AS ptus, " +
      "lag(event_id) OVER w AS prev_id FROM e " +
      "WINDOW w AS (PARTITION BY user_id ORDER BY tus NULLS FIRST, event_id)) " +
      "SELECT user_id, prev_id, event_id, tus - ptus AS gap_us FROM l " +
      "WHERE ptus IS NOT NULL AND tus - ptus > 3600000000 " +
      "ORDER BY user_id NULLS FIRST, event_id"))

  // ---------------------------------------------------------------- all

  val all: Seq[Q] = Seq(
    qScan, qScanPrune,
    qProject, qFilterEq, qFilterLike, qFilterRlike,
    qJoinInner, qJoinBroadcast, qJoinStar, qJoinLeft,
    qSemiJoin, qAntiJoin, qFindFirst, qRangeJoin, qRangeBanded, qJoinSalted,
    qAggSalted,
    qDistinct, qDedupSubset, qFirstWins, qGroupCount,
    qGroupCollect, qGroupRoute, qRollup, qCube, qGroupingSets, qGroupingId,
    qWindowRunning, qWindowFrame, qWindowRank, qWindowLag, qWindowRange,
    qWindowRangeTs, qWindowDist, qStreaks, qFunnel, qSessionPaths,
    qCohortRetention,
    qMovingZscore,
    qSort, qSortMulti, qTopk,
    qUnion, qExcept, qIntersect, qExceptAll, qIntersectAll,
    qStrReplace, qStrRoute, qStrSplit, qBinHex,
    qDateTrunc, qMathExpr, qPercentileDisc, qPercentileCont, qRegrFit,
    qArrayDot, qJsonExtract, qExplodeTokens,
    qWindowTumbling, qWindowSliding, qWindowSession,
    qAsofJoin, qAsofForward, qAsofNearest, qResampleFfill, qResampleInterp,
    qMergeUpsert, qScd2, qTableDiff,
    qPivot, qUnpivot,
    qHistogram, qHistogramEq, qSkyline, qEwma, qMode, qTopkTies, qGaps)
}
