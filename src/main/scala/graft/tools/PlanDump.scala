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
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (exec) { df.collect(); println(df.queryExecution.executedPlan.toString) }
    else df.explain("formatted")
    spark.stop()
  }
}
