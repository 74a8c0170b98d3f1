package graft.tools

import org.apache.spark.sql.SparkSession

/** Zero-row twin of a testdata directory — the degenerate-input
  * correctness fixture. At production scale an EMPTY input is not an
  * edge case: a date-partition filter that matches nothing, a tenant
  * with no rows yet, a fold whose batch predicate excludes every id —
  * all land a structurally-valid, zero-row frame on every operator's
  * doorstep. An engine that errors (seed `.limit(n)` collects coming
  * back empty, divisions by zero-count aggregates, argmax over nothing)
  * or silently DIVERGES from the oracle (DuckDB scalar subqueries on
  * empty CTEs yield NULL where a Spark fallback kept a no-op) fails its
  * first real deployment week.
  *
  * Each table keeps its exact schema (including the events `ts`
  * timestamp encoding normalized by `Tables.load`) with zero rows, so
  * both engines plan every query normally and the compare gates
  * schema + rows + hash on emptiness.
  *
  * Usage: `runMain graft.tools.EmptyFixture SRC_SF_DIR DST_DIR`, then
  * the standard gate pair (`graft.Verify DST_DIR OUT` +
  * `tools/local_verify.py DST_DIR OUT`).
  */
object EmptyFixture {
  def main(args: Array[String]): Unit = {
    val Array(src, dst) = args.take(2)
    val spark = graft.Sessions.localBuilder("4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    FixtureIo.writeTwin(spark, src, dst, (_, df) => df.limit(0))
    spark.stop()
  }
}
