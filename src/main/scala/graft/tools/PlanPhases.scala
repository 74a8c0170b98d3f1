package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Scratch: Catalyst phase timing (parsing/analysis/optimization/
  * planning) vs wall for named queries, warm — how much of an
  * overhead-bound row is DRIVER plan work that no executor ever sees.
  * Usage: runMain graft.tools.PlanPhases SF_DIR q_a q_b ...
  */
object PlanPhases {
  def main(args: Array[String]): Unit = {
    val d = args.head
    val names = args.tail
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach(n => SparkEntry.queries(n)(spark, d).count()) // warm
    Seq(1, 2).foreach { round =>
      names.foreach { n =>
        val df = SparkEntry.queries(n)(spark, d)
        val t0 = System.nanoTime()
        df.count()
        val wall = (System.nanoTime() - t0) / 1e9
        val phases = df.queryExecution.tracker.phases
        val p = Seq("parsing", "analysis", "optimization", "planning")
          .map(k => k -> phases.get(k).map(s => (s.endTimeMs - s.startTimeMs) / 1e3).getOrElse(0.0))
        val sum = p.map(_._2).sum
        println(f"[phase] r$round $n%-26s wall $wall%6.2f  catalyst $sum%5.2f  " +
          p.map { case (k, v) => f"$k=$v%.2f" }.mkString(" "))
      }
    }
    spark.stop()
  }
}
