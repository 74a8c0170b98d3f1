package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Similarity
import graft.ops.Windows
/** Scratch profiler — stage-level timing of whichever hot path is under
  * the microscope this round (currently the n² knn scoring path).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.localBuilder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    val n = Similarity.withNorm(emb, col("vec_id"), col("embedding"),
      dim = 64)
    time("warmup")(n.count())
    val c = n.select(col("vec_id").as("cid"), col("v").as("cv"),
      col("nm").as("cn"))
    val scoredHalf = n.repartition(col("vec_id"))
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("nm").as("qn"))
      .join(broadcast(c), col("qid") < col("cid"))
      .select(col("qid").as("a"), col("cid").as("b"),
        round(Similarity.cosinePre(Similarity.dot(col("qv"), col("cv")),
          col("qn"), col("cn")) * lit(1e6)).cast("long").as("qcos"))
    time("scoredHalf")(scoredHalf.count())
    time("groupBy max on half")(
      scoredHalf.groupBy("a").agg(max("qcos")).count())
    val winHalf = Windows.findFirstK(scoredHalf, keys = Seq(col("a")),
      priority = Seq(col("qcos").desc, col("b")), k = 5, rankName = "rnk")
    time("window on half (2M)")(winHalf.count())
    time("window on half again")(winHalf.count())
    // same window, AQE off
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("window on half, AQE off")(winHalf.count())
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // window WITHOUT the rank filter (plain row_number, no group limit)
    import org.apache.spark.sql.expressions.Window
    val plain = scoredHalf.withColumn("rn", row_number().over(
      Window.partitionBy(col("a")).orderBy(col("qcos").desc, col("b"))))
    time("plain row_number (2M)")(plain.count())
    val agg = winHalf.groupBy("a").agg(sum("qcos")).count()
    println(agg)
    winHalf.explain("formatted")
    spark.stop()
  }
}
