package graft.tools
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Scratch A/B probe: warm wall of named queries under AQE on vs off —
  * quantifies the adaptive re-optimization + per-stage-job share of
  * the overhead-bound rows (guide §1: decide WHERE the time goes
  * before optimizing). Usage: runMain graft.tools.AqeProbe SF_DIR q_a q_b ...
  */
object AqeProbe {
  def main(args: Array[String]): Unit = {
    val d = args.head
    val names = args.tail
    val spark = graft.Sessions.localBuilder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(n: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, d).count()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach(run) // warm everything once (codegen cache)
    Seq(true, false, true, false).foreach { aqe =>
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      names.foreach { n =>
        val w = run(n)
        println(f"[aqe] aqe=$aqe%-5s $n%-24s $w%6.2f s")
      }
    }
    spark.stop()
  }
}
