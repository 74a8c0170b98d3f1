package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.etl.{Export, FileTree, Import}
import graft.model.Manifests.CollectionExport
import graft.model.Tables

/** Scale exercise for the ETL pipelines: maps the TPC-H-ish testdata
  * into the reference-shaped release layout and runs
  * export -> import -> file-tree plan end-to-end at sfDir volume.
  *
  *   orders   -> the "raw" dataset type (one ref per order; collection
  *               derived from order status to exercise find_first)
  *   lineitem -> the datastore (one artifact row per line item)
  *   customer/nation -> dimensions
  *
  * Usage: EtlDemo [sfDir] [outRoot]
  */
object EtlDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/graft-etl-demo"
    val spark = graft.Sessions.localBuilder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[etl-demo] $name%-12s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val collections = Seq(
      CollectionExport("root", "CHAINED", Seq("runs/final", "runs/initial")),
      CollectionExport("runs/final", "TAGGED", Nil),
      CollectionExport("runs/initial", "TAGGED", Nil))

    val orders = Tables.load(spark, sfDir, "orders")
    // 'F' (finished) orders exist in both runs -> find_first must pick
    // runs/final; 'O' orders only in runs/initial
    val refsFinal = orders.filter(col("o_orderstatus") === "F").select(
      concat(lit("f-"), col("o_orderkey")).as("dataset_id"),
      lit("runs/final").as("run"), lit("runs/final").as("collection"),
      col("o_orderkey").as("order_id"))
    val refsInitial = orders.select(
      concat(lit("i-"), col("o_orderkey")).as("dataset_id"),
      lit("runs/initial").as("run"), lit("runs/initial").as("collection"),
      col("o_orderkey").as("order_id"))
    val refs = refsFinal.unionByName(refsInitial)

    val datastore = Tables.load(spark, sfDir, "lineitem").select(
      lit("main").as("datastore_name"), lit(0).as("priority"),
      concat(lit("i-"), col("l_orderkey")).as("dataset_id"),
      concat(lit("data/"), col("l_orderkey"), lit("/"),
        col("l_linenumber"), lit(".parquet#frag")).as("path"))

    val exportDir = s"$out/export"
    timed("export") {
      Export.run(exportDir,
        types = Seq(Export.DatasetTypeInput(
          "raw", "Exposure", refs, Seq("order_id"), findFirst = true)),
        dimensions = Seq(
          Export.DimensionInput("customer",
            Tables.load(spark, sfDir, "customer"), Seq("c_custkey")),
          Export.DimensionInput("nation",
            Tables.load(spark, sfDir, "nation"), Seq("n_nationkey"))),
        datastore = datastore,
        collections = collections, rootCollection = "root",
        // phase-2 expansion at volume: region constrained by the keys of
        // the already-written nation parquet (pruned re-read + semi-join)
        expansions = Seq(Export.DimensionExpansion(
          sourceDimension = "nation", sourceKeys = Seq("n_regionkey"),
          target = Export.DimensionInput("region",
            Tables.load(spark, sfDir, "region")
              .withColumnRenamed("r_regionkey", "n_regionkey"),
            Seq("n_regionkey")),
          targetJoinColumns = Seq("n_regionkey"))))
    }
    val nSel = spark.read.parquet(s"$exportDir/datasets/raw").count()
    val nF = spark.read.parquet(s"$exportDir/datasets/raw")
      .filter(col("dataset_id").startsWith("f-")).count()
    println(s"[etl-demo] exported refs=$nSel (final-run wins: $nF)")

    val report = timed("import") {
      Import.run(spark, exportDir, s"$out/target",
        requestedTypes = Seq("raw"),
        dimensionKeys = Map("customer" -> Seq("c_custkey"),
          "nation" -> Seq("n_nationkey"), "region" -> Seq("n_regionkey")),
        dimensionDeps = Map("customer" -> Seq("nation"),
          "nation" -> Seq("region"), "region" -> Nil))
    }
    println(s"[etl-demo] import: dims=${report.dimensionsInserted} " +
      s"datasets=${report.datasetRows} assoc=${report.associated}")
    val registered = graft.model.Manifests
      .readDatasetTypes(s"$out/target/dataset_types.json").map(_.name)
    println(s"[etl-demo] registered types in target: ${registered.mkString(", ")}")

    val plan = timed("tree-plan") {
      val p = FileTree.plan(spark.read.parquet(s"$exportDir/datastore"),
        "path", sourceRoot = "/data/src", remap = Nil)
      val n = p.count(); n
    }
    println(s"[etl-demo] symlink plan rows=$plan")
    spark.stop()
  }
}
