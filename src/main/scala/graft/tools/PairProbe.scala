package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: stage-level decomposition of the exact shingle-pair
  * family at sf0.1 — index size, candidate mass, and where the 20+ s
  * of task CPU that QueryJobs measured actually goes.
  */
object PairProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.localBuilder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$d/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[pair] $name%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }
    for (r <- 1 to 2) {
      println(s"-- round $r --")
      time("docs")(docs.count())
      val idx = Dedup.shingleIndex(docs, col("text"), col("doc_id"), 3)
      time("shingle index")(idx.count())
      time("distinct shingles")(idx.select("s").distinct().count())
      val a = idx.select(col("doc_id").as("da"), col("s"), col("sz").as("na"))
      val b = idx.select(col("doc_id").as("db"), col("s"), col("sz").as("nb"))
      val cand = a.join(b.hint("shuffle_hash"), Seq("s"))
        .filter(col("da") < col("db"))
      time("candidate rows (join only)")(cand.count())
      time("candidates passing size prune")(
        cand.filter(least(col("na"), col("nb")) * 3 >= col("na") + col("nb"))
          .count())
      val inter = cand.groupBy("da", "db", "na", "nb")
        .agg(count(lit(1)).as("i"))
      time("intersections (join+agg)")(inter.count())
      time("jaccard pairs (full)")(
        Dedup.ngramJaccardPairs(docs, col("text"), col("doc_id"), 3, 0.5)
          .count())
    }
    spark.stop()
  }
}
