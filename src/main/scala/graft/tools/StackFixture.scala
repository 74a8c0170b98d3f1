package graft.tools

import org.apache.spark.sql.SparkSession

/** Stacked-scale twin of a testdata directory — the fifth correctness
  * fixture (r17 VERDICT item 4: promote the [[ScaleSmoke]] stack from
  * warm single-query probes into a hash-gated fixture).
  *
  * Same stacking contract as [[ScaleSmoke.stack]] (one shared
  * implementation): documents/embeddings/events get copy i's ids
  * offset by i x 10^8 — disjoint id spaces, IDENTICAL content, so
  * every stacked copy is a true near-dup of its siblings and the dup
  * graph carries ~factor² the pair mass of the source (the adversarial
  * shape for candidate generation); events users offset so sessions
  * never merge across copies; the TPC-H star tables pass through
  * unchanged (their joins need cross-table key consistency that
  * stacking would break). Unlike ScaleSmoke this writes a FULL
  * testdata layout for the standard gate pair (`graft.Verify DST OUT`
  * + `tools/local_verify.py DST OUT`), so the scale-posture claims
  * become pass/fail oracle rows instead of trusted probe timings:
  * 10 x sf0.01 is the driver's t2 volume carrying ~100x its true pair
  * mass, and EVERY query must still hash-match DuckDB there.
  *
  * Usage: runMain graft.tools.StackFixture SRC_SF_DIR DST_DIR [FACTOR]
  */
object StackFixture {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: runMain graft.tools.StackFixture SRC_SF_DIR DST_DIR [FACTOR]")
    val Array(src, dst) = args.take(2)
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = graft.Sessions.localBuilder("16").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stacked = Map(
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"),
      "events" -> Seq("event_id", "user_id"))
    FixtureIo.writeTwin(spark, src, dst, (t, base) =>
      stacked.get(t) match {
        case Some(ids) => ScaleSmoke.stack(base, factor, ids)
        case None => base
      })
    println(s"[stackfixture] wrote ${factor}x of $src at $dst")
    spark.stop()
  }
}
