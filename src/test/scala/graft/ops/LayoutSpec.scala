package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{LayoutFunctions, LayoutKernels}

/** Z-order layout clustering: kernel correctness against a bit-by-bit
  * reference, and the locality property that justifies it at scale —
  * per-partition min/max spreads narrow on EVERY clustered dimension,
  * where a lexicographic sort narrows only the leading one. The spread
  * ratio IS the file-skipping ratio a selective predicate gets from
  * parquet min/max stats.
  */
class LayoutSpec extends SparkSpec {

  import spark.implicits._

  private def referenceInterleave(vals: Seq[Long], bits: Int): Long = {
    var z = 0L
    for (bit <- bits - 1 to 0 by -1; v <- vals)
      z = (z << 1) | ((v >>> bit) & 1L)
    z
  }

  test("zorder2/zorder3 match the bit-by-bit reference (property)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 500) {
      val a = rnd.nextLong() & 0xffffffffL
      val b = rnd.nextLong() & 0xffffffffL
      assert(LayoutKernels.zorder2(a, b) == referenceInterleave(Seq(a, b), 32),
        s"a=$a b=$b")
      val x = rnd.nextLong() & 0x1fffffL
      val y = rnd.nextLong() & 0x1fffffL
      val w = rnd.nextLong() & 0x1fffffL
      assert(LayoutKernels.zorder3(x, y, w) == referenceInterleave(Seq(x, y, w), 21),
        s"x=$x y=$y w=$w")
    }
  }

  test("zorder2 is monotone per dimension within a fixed other-dim prefix") {
    // doubling a coordinate can only move the point forward on the curve
    assert(LayoutKernels.zorder2(1L, 0L) > LayoutKernels.zorder2(0L, 0L))
    assert(LayoutKernels.zorder2(0L, 1L) > LayoutKernels.zorder2(0L, 0L))
    assert(LayoutKernels.zorder2(2L, 2L) > LayoutKernels.zorder2(1L, 1L))
  }

  test("null dimension z-maps to null (codegen and interpreted)") {
    val df = Seq((Some(1L), Some(2L)), (None, Some(2L))).toDF("a", "b")
      .select(LayoutFunctions.zorder(col("a"), col("b")).as("z"))
    val rows = df.collect()
    assert(!rows(0).isNullAt(0) && rows(1).isNullAt(0))
  }

  /** Uniform 2-D grid clustered into 16 partitions: measure the mean
    * per-partition extent of each dimension as a fraction of its global
    * range. A perfect 4x4 Morton tiling gives 0.25 per dimension; the
    * lexicographic baseline gives ~1/16 on x but ~1.0 on y.
    */
  test("clusterByZOrder narrows BOTH dimensions; lexicographic narrows one") {
    val n = 64
    val grid = (for (x <- 0 until n; y <- 0 until n)
      yield (x.toLong, y.toLong)).toDF("x", "y")

    def meanSpread(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val s = df.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
        .agg(avg("sx").as("ax"), avg("sy").as("ay"))
        .collect().head
      (s.getDouble(0) / (n - 1), s.getDouble(1) / (n - 1))
    }

    val (zx, zy) = meanSpread(Layout.clusterByZOrder(grid, Seq("x", "y"), 16))
    val (lx, ly) = meanSpread(
      grid.repartitionByRange(16, col("x"), col("y"))
        .sortWithinPartitions("x", "y"))

    // z-order: both dimensions tile (4x4 Morton -> ~0.25 each; the
    // tighter 0.32 bound regressed before the 31-bit normalization —
    // the signed-long wrap put one partition across the curve midpoint)
    assert(zx <= 0.32, s"z-order x spread $zx")
    assert(zy <= 0.32, s"z-order y spread $zy")
    // lexicographic: leading dim narrows hard, trailing dim spans ~everything
    assert(lx <= 0.15, s"lex x spread $lx")
    assert(ly >= 0.90, s"lex y spread $ly")
    // the claim that matters: z-order beats lexicographic on the
    // TRAILING dimension by a wide margin (that's the skipped IO)
    assert(zy < ly / 2, s"zy=$zy ly=$ly")
  }

  test("clusterByZOrder plan: projection + one range exchange, no extra shuffle") {
    // spark.range (not a local Seq) so the z projection stays a plan node
    // instead of folding into a pre-evaluated LocalTableScan
    val grid = spark.range(100)
      .select(col("id").as("x"), (col("id") * 7 % 100).as("y"))
    val plan = Layout.clusterByZOrder(grid, Seq("x", "y"), 4)
      .queryExecution.executedPlan.toString
    assert("rangepartitioning".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("hashpartitioning"), plan)
    // kernel stays in codegen: no interpreted fallback marker
    assert(plan.contains("graft_zorder") || plan.contains("ZOrder"), plan)
  }

  test("writeClustered: every parquet FILE is a narrow tile in both dims") {
    val n = 64
    val grid = (for (x <- 0 until n; y <- 0 until n)
      yield (x.toLong, y.toLong)).toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("graft_zw").toString
    try {
      Layout.writeClustered(grid, Seq("x", "y"), s"$dir/t", numPartitions = 16)
      val back = spark.read.parquet(s"$dir/t")
      val files = back.inputFiles
      assert(files.length == 16, files.length.toString)
      // per-file spreads: the stats a reader's row-group pruning sees
      val spreads = files.map { f =>
        val r = spark.read.parquet(f)
          .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
          .collect().head
        (r.getLong(0).toDouble / (n - 1), r.getLong(1).toDouble / (n - 1))
      }
      val ax = spreads.map(_._1).sum / spreads.length
      val ay = spreads.map(_._2).sum / spreads.length
      assert(ax <= 0.40 && ay <= 0.40, s"file spreads x=$ax y=$ay")
      assert(back.count() == n.toLong * n)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("2-D z-values stay non-negative across the full normalized range") {
    // regression: 32-bit-per-dim normalization put dim-1's top bit in
    // the long's sign bit, so max-range rows sorted BEFORE min-range
    // rows under signed range partitioning
    val extremes = Seq((0L, 0L), (0L, 1L << 40), ((1L << 40), 0L),
      ((1L << 40), (1L << 40))).toDF("x", "y")
    val bits = 31
    val scaleMax = (1L << bits) - 1
    val z = extremes.select(LayoutFunctions.zorder(
      least(lit(scaleMax), col("x")), least(lit(scaleMax), col("y"))).as("z"))
      .collect().map(_.getLong(0))
    assert(z.forall(_ >= 0L), s"negative z: ${z.mkString(",")}")
    // and the all-max corner is the curve's last point, not its midpoint
    assert(z.max == LayoutKernels.zorder2(scaleMax, scaleMax))
  }

  test("clusterByZOrder rejects wrong arity") {
    val df = Seq((1L, 2L)).toDF("x", "y")
    val e = intercept[IllegalArgumentException] {
      Layout.clusterByZOrder(df, Seq("x"), 4)
    }
    assert(e.getMessage.contains("2 or 3 dimensions"))
  }
}
