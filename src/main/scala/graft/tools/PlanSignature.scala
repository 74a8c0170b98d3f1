package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Compact physical-plan fingerprints for every registered query — the
  * plan-shape regression guard (VERDICT r17 #5).
  *
  * The r17 `coalesce(1)` decode-pinning bug was caught by bench
  * forensics: the query stayed CORRECT while its whole synth+decode
  * chain silently ran on one task. Correctness gates cannot see that
  * class, and ad-hoc plan audits only cover the queries someone
  * thought to pin. This tool reduces each query's pre-execution
  * physical plan to counts of the scale-relevant operator kinds
  * (exchanges, join strategies, windows, aggregates, coalesce, the
  * whole-stage-codegen span) and diffs them against the committed
  * snapshot (`PLAN_SIGNATURES.json`) in RegistrySpec — a lost
  * broadcast, a surprise sort-merge cascade, a decode chain collapsing
  * onto one task, or a kernel dropping out of codegen now fails `sbt
  * test` as a reviewable one-line diff instead of surfacing rounds
  * later as a bench regression.
  *
  * Counting happens on the plan STRING (the `executedPlan.toString`
  * the plan audits already assert against): it uniformly covers the
  * AQE wrapper, reused subtrees, and subquery plans without chasing
  * Spark's internal node accessors, and it is stable — node ids and
  * paths are excluded, only operator names count. Whole-stage-codegen
  * spans are NOT visible pre-execution under AQE (collapse runs per
  * query stage at runtime), so the codegen guard is `fallback=N`: the
  * count of CodegenFallback EXPRESSIONS in the optimized logical plan
  * — an interpreted higher-order function sneaking back into a kernel
  * path (the r17 quality/text-surface class) raises it.
  *
  * Snapshots are environment-pinned: compute them with the TEST
  * session config (local[4], shuffle.partitions=4, sf0.001) — the
  * spec and this tool build identical sessions, so the committed file
  * diffs clean. Regenerate after a DELIBERATE plan change with:
  * `sbt "runMain graft.tools.PlanSignature"` and review the git diff.
  */
object PlanSignature {

  /** Operator kinds whose counts form the fingerprint — each one is a
    * scale lever (shuffle count, join strategy, window/aggregate
    * shape, task-collapse via Coalesce, row-explosion via Generate).
    */
  val Tracked: Seq[String] = Seq(
    "Exchange", "BroadcastExchange", "BroadcastHashJoin", "SortMergeJoin",
    "ShuffledHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct",
    "Window", "WindowGroupLimit", "TakeOrderedAndProject", "Sort",
    "HashAggregate", "ObjectHashAggregate", "SortAggregate",
    "Coalesce", "Generate")

  private val OpToken = """^[\s:+\-]*(?:\*\(\d+\)\s+)?([A-Za-z][A-Za-z0-9]*)""".r

  /** One query's fingerprint: `kind=count` pairs (tracked kinds that
    * occur, in [[Tracked]] order) + `fallback=<CodegenFallback
    * expression count over the optimized logical plan>`.
    */
  def signature(df: DataFrame): String = {
    val counts = scala.collection.mutable.LinkedHashMap(
      Tracked.map(_ -> 0): _*)
    df.queryExecution.executedPlan.toString.linesIterator.foreach { line =>
      OpToken.findFirstMatchIn(line).foreach { m =>
        val op = m.group(1)
        if (counts.contains(op)) counts(op) += 1
      }
    }
    var fallback = 0
    df.queryExecution.optimizedPlan.foreach { lp =>
      lp.expressions.foreach(_.foreach {
        case _: org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback =>
          fallback += 1
        case _ => ()
      })
    }
    (counts.filter(_._2 > 0).map { case (k, v) => s"$k=$v" }.toSeq :+
      s"fallback=$fallback").mkString(" ")
  }

  /** All registered queries' fingerprints against `sfDir`, name-sorted. */
  def all(spark: SparkSession, sfDir: String): Seq[(String, String)] =
    graft.SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> signature(fn(spark, sfDir))
    }

  /** Serialize as one `"name": "sig"` line per query — reviewable
    * diffs, trivially parseable without a JSON dependency.
    */
  def render(sigs: Seq[(String, String)]): String =
    sigs.map { case (n, s) => s"""  "$n": "$s"""" }
      .mkString("{\n", ",\n", "\n}\n")

  /** Parse [[render]]'s output (tolerates the trailing-comma-free JSON
    * it writes and nothing fancier — this file is machine-written).
    */
  def parse(text: String): Map[String, String] =
    text.linesIterator.flatMap { line =>
      val t = line.trim.stripSuffix(",")
      if (!t.startsWith("\"")) None
      else t.split("\": \"", 2) match {
        case Array(k, v) =>
          Some(k.stripPrefix("\"") -> v.stripSuffix("\""))
        case _ => None
      }
    }.toMap

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = if (args.length > 1) args(1) else "PLAN_SIGNATURES.json"
    // the TEST session config — snapshots are pinned to it
    val spark = graft.Sessions.localBuilder("4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      render(all(spark, sfDir)))
    println(s"[plansig] wrote ${graft.SparkEntry.queries.size} " +
      s"signatures to $out")
    spark.stop()
  }
}
