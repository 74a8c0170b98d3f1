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
    val spark = graft.Sessions.localBuilder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach(n => SparkEntry.queries(n)(spark, d).count()) // warm
    Seq(1, 2).foreach { round =>
      names.foreach { n =>
        val df = SparkEntry.queries(n)(spark, d)
        val t0 = System.nanoTime()
        // force THIS Dataset's QueryExecution through every phase
        // before the action: count() plans its own QueryExecution with
        // its own tracker, so df's tracker used to hold only the
        // 'analysis' phase recorded at Dataset creation — optimization
        // and planning read 0.0 and the catalyst share was
        // systematically under-reported (the very quantity this probe
        // exists to measure)
        df.queryExecution.executedPlan
        val tPlan = (System.nanoTime() - t0) / 1e9
        df.count()
        val wall = (System.nanoTime() - t0) / 1e9
        val phases = df.queryExecution.tracker.phases
        val p = Seq("parsing", "analysis", "optimization", "planning")
          .map(k => k -> phases.get(k).map(s => (s.endTimeMs - s.startTimeMs) / 1e3).getOrElse(0.0))
        val sum = p.map(_._2).sum
        println(f"[phase] r$round $n%-26s wall $wall%6.2f  toPhysical $tPlan%5.2f  " +
          f"catalyst $sum%5.2f  " +
          p.map { case (k, v) => f"$k=$v%.2f" }.mkString(" "))
      }
    }
    spark.stop()
  }
}
