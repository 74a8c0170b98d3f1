package graft.tools
import org.apache.spark.sql.SparkSession
import graft.SparkEntry
/** Debug main: print the physical plan of one query.
  * Usage: PlanDump <query> [sfDir] [exec]  — `exec` runs the query first
  * so AQE's final plan (runtime reuse, coalescing, join demotion) shows.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val exec = args.contains("exec")
    val spark = graft.Sessions.localBuilder("4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (args.contains("fallback")) {
      // name every interpreted (CodegenFallback) expression node in the
      // optimized plan — the drill-down behind PLAN_SIGNATURES.json's
      // fallback=N when deciding whether a residual is hot-path
      df.queryExecution.optimizedPlan.foreach { lp =>
        lp.expressions.foreach(_.foreach {
          case e: org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback =>
            val x = e.asInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression]
            println(s"[fallback] ${lp.nodeName}: ${x.prettyName} — " +
              x.toString.take(120))
          case _ => ()
        })
      }
    }
    else if (exec) { df.collect(); println(df.queryExecution.executedPlan.toString) }
    else df.explain("formatted")
    spark.stop()
  }
}
