package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev smoke: mirrors the driver's t1 check (SparkEntry.entry rows > 0). */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.localBuilder("4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    df.show(20, truncate = false)
    println(s"entry rows = ${df.count()}")
    spark.stop()
  }
}
