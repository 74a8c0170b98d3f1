package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.TextHash._
import graft.model.Tables
/** Scratch profiler for stage-level timing of the dedup hot path. */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }
    val docs = Tables.load(spark, d, "documents")
    time("warmup")(docs.count())
    time("split only")(docs.select(explode(tokens(col("text")))).count())
    // HOF composition vs the codegen'd kernel (graft_shingles): the HOF
    // runs interpreted and re-evaluates element_at per element
    time("shingle strings (HOF)")(docs.select(explode(shingles(tokens(col("text")), 3))).count())
    time("shingle strings (kernel)")(docs.select(explode(
      graft.functions.TermFunctions.stringShingles(col("text"), 3))).count())
    time("shingle+distinct")(docs.select(explode(array_distinct(shingles(tokens(col("text")), 3)))).count())
    time("shingle+distinct+hash") {
      docs.select(col("doc_id"), explode(array_distinct(shingles(tokens(col("text")), 3))).as("s0"))
        .select(baseHash(col("s0"))).count()
    }
    time("shingle-hash48 (kernel)") {
      docs.select(explode(array_distinct(
        graft.functions.HashFunctions.shingleHash48(col("text"), 3)))).count()
    }
    spark.stop()
  }
}
