package graft.tools
import org.apache.spark.sql.SparkSession
import graft.SparkEntry
/** Scratch: time named queries at a given SF dir (warm session). */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val d = args.head
    val names = args.tail
    val spark = graft.Sessions.localBuilder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(names.head)(spark, d).count() // warm-up
    names.foreach { n =>
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(n)(spark, d).count()
      println(f"[time] $n%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s ($rows rows)")
    }
  }
}
