package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** Scratch: stage decomposition of the marginMine |X|x|Y| pipeline
  * (q_bitext_margin's 43 s of task CPU at sf0.1 — where inside?).
  */
object MarginProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.localBuilder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[margin] $name%-30s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }
    val n = Similarity.withNorm(
      graft.model.Tables.load(spark, d, "embeddings"),
      col("vec_id"), col("embedding"), dim = 64, keep = Seq(col("label")))
    val x = n.filter(col("label") < 5).drop("label")
    val y = n.filter(col("label") >= 5).drop("label")
    for (r <- 1 to 2) {
      println(s"-- round $r --")
      time("x")(x.count()); time("y")(y.count())
      val q = x.select(col("vec_id").as("xid"), col("v").as("xv"),
        col("nm").as("xn"))
      val c = y.select(col("vec_id").as("yid"), col("v").as("yv"),
        col("nm").as("yn"))
      val scored = c
        .repartition(32, col("yid"))
        .join(broadcast(q))
        .select(col("xid"), col("yid"),
          round(Similarity.cosinePre(
            Similarity.dot(col("xv"), col("yv")), col("xn"), col("yn"))
            * lit(1e6)).cast("long").as("qcos"))
      time("scored fan-out")(scored.count())
      import org.apache.spark.sql.expressions.Window
      val wy = Window.partitionBy(col("yid"))
        .orderBy(col("qcos").desc, col("xid"))
      time("one window pass")(scored
        .withColumn("rny", row_number().over(wy)).count())
      time("marginMine full")(
        Similarity.marginMine(x, y, k = 4, threshold = 1.0).count())
    }
    spark.stop()
  }
}
