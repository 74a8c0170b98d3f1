package graft

/** Driver-contract registry invariants: the query inventory is the
  * interface the round driver consumes — catch registration mistakes
  * (duplicate names, missing oracles) before it does.
  */
class RegistrySpec extends SparkSpec {

  test("no duplicate query names") {
    assert(Queries.duplicateNames.isEmpty,
      s"duplicates: ${Queries.duplicateNames.mkString(", ")}")
  }

  test("all 58 declared queries are registered with oracle SQL") {
    assert(Queries.all.size == 58)
    val missingOracle = Queries.all.filter(_.oracle.isEmpty).map(_.name)
    assert(missingOracle.isEmpty,
      s"queries without oracle SQL: ${missingOracle.mkString(", ")}")
  }

  test("SURVEY §2.12 core inventory is fully covered") {
    val declared = Seq(
      "q_scan", "q_scan_prune", "q_project", "q_filter_eq", "q_filter_like",
      "q_filter_rlike", "q_join_inner", "q_join_broadcast", "q_join_star",
      "q_join_left", "q_semi_join", "q_anti_join", "q_find_first",
      "q_range_join", "q_distinct", "q_dedup_subset", "q_first_wins",
      "q_group_count", "q_group_collect", "q_group_route", "q_rollup",
      "q_cube", "q_window_running", "q_window_frame", "q_window_rank",
      "q_sort", "q_sort_multi", "q_topk", "q_union", "q_except",
      "q_intersect", "q_str_replace", "q_str_route", "q_str_split",
      "q_bin_hex", "q_date_trunc", "q_math_expr", "q_array_dot",
      "q_json_extract", "q_explode_tokens", "q_window_tumbling",
      "q_window_sliding", "q_window_session")
    val names = Queries.all.map(_.name).toSet
    val missing = declared.filterNot(names.contains)
    assert(missing.isEmpty, s"missing from registry: ${missing.mkString(", ")}")
  }

  test("every query builds a plan against sf0.001 (no analysis errors)") {
    val d = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, d)
      assert(df.schema.fields.nonEmpty, s"$name produced an empty schema")
    }
  }
}
