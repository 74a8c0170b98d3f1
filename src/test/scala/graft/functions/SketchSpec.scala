package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.SketchFunctions.approxDistinct

/** Property contract of the HLL approximate-distinct aggregate. No
  * cross-engine oracle is possible (register layouts differ per
  * engine), so the contract is pinned by the properties that make a
  * sketch a sketch: bounded error vs exact, duplication-insensitivity,
  * and merge independence from how rows are partitioned.
  */
class SketchSpec extends SparkSpec {

  import spark.implicits._

  private def relErr(est: Long, exact: Long): Double =
    math.abs(est - exact).toDouble / exact

  test("error < 5% vs exact countDistinct across cardinalities (property)") {
    // deterministic pseudo-random values per cardinality: xxhash of index
    for (n <- Seq(100, 1000, 5000, 40000, 120000)) {
      val df = spark.range(n.toLong)
        .select(xxhash64(col("id"), lit(7)).as("v")) // distinct w.h.p.
      val Array(est, exact) = df
        .agg(approxDistinct(col("v")).as("est"),
          countDistinct(col("v")).as("exact"))
        .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
      assert(relErr(est, exact) < 0.05,
        s"n=$n est=$est exact=$exact err=${relErr(est, exact)}")
    }
  }

  test("strings and longs both hash; nulls are ignored like countDistinct") {
    val df = Seq(Some("a"), Some("b"), Some("a"), None, Some("c"), None)
      .toDF("s")
    val r = df.agg(approxDistinct(col("s")).as("est"),
      countDistinct(col("s")).as("exact")).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
  }

  test("duplication-insensitive: sketch(data union data) == sketch(data)") {
    val df = spark.range(20000).select(concat(lit("doc-"), col("id")).as("v"))
    val once = df.agg(approxDistinct(col("v"))).collect().head.getLong(0)
    val tripled = df.union(df).union(df)
      .agg(approxDistinct(col("v"))).collect().head.getLong(0)
    assert(once == tripled)
  }

  test("merge is partition-order independent: same estimate at 1 and 16 partitions") {
    val df = spark.range(50000).select(xxhash64(col("id")).as("v"))
    val p1 = df.repartition(1).agg(approxDistinct(col("v"))).collect().head.getLong(0)
    val p16 = df.repartition(16, col("v")).agg(approxDistinct(col("v")))
      .collect().head.getLong(0)
    val pRand = df.repartition(16).agg(approxDistinct(col("v")))
      .collect().head.getLong(0)
    assert(p1 == p16 && p16 == pRand)
  }

  test("grouped: per-group sketches are independent and within bound") {
    // 8 groups with cardinalities 1000*(g+1)
    val df = spark.range(36000)
      .select((col("id") % 8).as("g"), col("id").as("v"))
      .filter(col("v") / 8 < (col("g") + 1) * lit(1000)) // group g keeps (g+1)*1000 ids
    val rows = df.groupBy("g")
      .agg(approxDistinct(col("v")).as("est"), countDistinct(col("v")).as("exact"))
      .collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      assert(relErr(r.getLong(1), r.getLong(2)) < 0.05, r.toString)
    }
  }

  test("precision knob trades memory for error (p=8 coarser but still bounded)") {
    val df = spark.range(30000).select(xxhash64(col("id")).as("v"))
    val est = df.agg(approxDistinct(col("v"), precision = 8))
      .collect().head.getLong(0)
    // 1.04/sqrt(256) ~= 6.5% standard error; 4 sigma bound
    assert(relErr(est, 30000) < 0.26, s"est=$est")
  }

  test("works as a window aggregate and under rollup (the scaladoc claim)") {
    val df = spark.range(300)
      .select((col("id") % 3).as("g"), (col("id") % 2).as("h"), col("id").as("v"))
    // running distinct count per group
    val win = df.select(col("g"), col("v"),
      approxDistinct(col("v")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("g").orderBy("v")
          .rowsBetween(Long.MinValue, 0)).as("run"))
      .groupBy("g").agg(max(col("run")).as("total"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(win.values.forall(v => math.abs(v - 100) <= 5), win.toString)
    // rollup: per-(g,h) cells + margins all estimate within bound
    val ru = df.rollup("g", "h").agg(approxDistinct(col("v")).as("est"),
      countDistinct(col("v")).as("exact")).collect()
    assert(ru.length == 3 * 2 + 3 + 1)
    ru.foreach(r => assert(math.abs(r.getLong(2) - r.getLong(3)) <=
      math.max(2, r.getLong(3) / 20), r.toString))
  }

  test("map-side combine: partial aggregation happens before the exchange") {
    val df = spark.range(10000).select((col("id") % 4).as("g"), col("id").as("v"))
      .groupBy("g").agg(approxDistinct(col("v")).as("est"))
    val plan = df.queryExecution.executedPlan.toString
    // ObjectHashAggregate runs in partial then final mode around one exchange
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert("graft_approx_distinct".r.findAllIn(plan).size >= 2, plan)
  }

  // ---------------------------------------------- Misra-Gries heavy hitters

  import graft.functions.SketchFunctions.freqItems

  /** Zipf-ish skewed corpus: item i appears ~N/i times, plus a long tail
    * of singletons — the shape heavy-hitter sketches exist for.
    */
  private def skewed(parts: Int) = {
    val heavy = (1 to 20).flatMap(i => Seq.fill(2000 / i)(s"item-$i"))
    val tail = (1 to 3000).map(i => s"tail-$i")
    spark.createDataset(heavy ++ tail).toDF("v").repartition(parts)
  }

  private def summary(parts: Int, capacity: Int): Map[String, Long] =
    skewed(parts).agg(freqItems(col("v"), capacity).as("hh"))
      .selectExpr("explode(hh) AS e").select("e.item", "e.count_lo")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("every item with frequency > n/(capacity+1) is reported (property)") {
    val exact = skewed(4).groupBy("v").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    for (parts <- Seq(1, 4, 13); capacity <- Seq(8, 32, 64)) {
      val hh = summary(parts, capacity)
      val mustReport = exact.filter { case (_, c) => c > n / (capacity + 1) }
      val missing = mustReport.keySet -- hh.keySet
      assert(missing.isEmpty,
        s"parts=$parts cap=$capacity missing guaranteed heavy hitters: $missing")
    }
  }

  test("counters undercount by at most n/(capacity+1), never overcount") {
    val exact = skewed(4).groupBy("v").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    for (parts <- Seq(1, 7); capacity <- Seq(16, 64)) {
      summary(parts, capacity).foreach { case (item, lo) =>
        val truth = exact(item)
        assert(lo <= truth, s"$item overcounted: $lo > $truth")
        assert(truth - lo <= n / (capacity + 1),
          s"$item bound violated: $truth - $lo > ${n / (capacity + 1)}")
      }
    }
  }

  test("nulls are ignored; an unskewed stream stays within capacity") {
    val df = Seq(Some("a"), None, Some("b"), Some("a"), None).toDF("v")
    val hh = df.agg(freqItems(col("v"), 4).as("hh"))
      .selectExpr("explode(hh) AS e").select("e.item", "e.count_lo")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hh("a") == 2L && hh("b") == 1L && !hh.contains(null))
  }

  test("freq sketch combines map-side like the HLL (object hash aggregate)") {
    val plan = skewed(4).agg(freqItems(col("v")).as("hh"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert("graft_freq_items".r.findAllIn(plan).size >= 2, plan)
  }

  // ------------------------------------------- log-histogram quantiles

  import graft.functions.SketchFunctions.approxQuantiles

  /** Distributions with different shapes — uniform, heavy-tailed
    * (quadratic), clustered — the estimate must stay within the grid's
    * relative-value bound on all of them (exact baseline via
    * approxQuantile at relativeError = 0).
    */
  test("quantile estimates within the grid bound across distributions") {
    val n = 20000L
    val cases: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      ("uniform", col("id")),
      ("heavy-tail", col("id") * col("id") / lit(100)),
      ("clustered", (col("id") % 5) * lit(1000000L) + col("id") % 97))
    for ((name, expr) <- cases) {
      val df = spark.range(n).select(expr.cast("long").as("v"))
      val probs = Seq(0.1, 0.5, 0.9, 0.99)
      val est = df.agg(approxQuantiles(col("v"), probs).as("qs"))
        .collect().head.getSeq[Double](0)
      val exact = df.stat.approxQuantile("v", probs.toArray, 0.0)
      probs.indices.foreach { i =>
        val e = est(i); val x = exact(i)
        assert(math.abs(e - x) <= math.max(1.0, 0.02 * math.abs(x)),
          s"$name p=${probs(i)} est=$e exact=$x")
      }
    }
  }

  test("quantile sketch is partition-order independent (exact count merge)") {
    val mk = (parts: Int) => spark.range(30000)
      .select(((col("id") * 37) % 9973).cast("long").as("v"))
      .repartition(parts)
      .agg(approxQuantiles(col("v"), Seq(0.25, 0.5, 0.75)).as("qs"))
      .collect().head.getSeq[Double](0)
    assert(mk(1) == mk(16)) // bucket counts add exactly; no order effects
  }

  test("quantile sketch: nulls ignored, empty input yields null, negatives rejected") {
    val withNulls = Seq(Some(10L), None, Some(20L), None).toDF("v")
    val qs = withNulls.agg(approxQuantiles(col("v"), Seq(1.0)).as("qs"))
      .collect().head.getSeq[Double](0)
    assert(qs.head == 20.0)
    val empty = Seq.empty[Long].toDF("v")
    assert(empty.agg(approxQuantiles(col("v"), Seq(0.5)).as("qs"))
      .collect().head.isNullAt(0))
    val err = intercept[Exception] {
      Seq(-1L).toDF("v").agg(approxQuantiles(col("v"), Seq(0.5))).collect()
    }
    assert(err.getMessage != null)
  }

  test("small values are EXACT (unit buckets below 2^subBits)") {
    val df = spark.range(100).select(col("id").cast("long").as("v"))
    val est = df.agg(approxQuantiles(col("v"), Seq(0.5, 1.0)).as("qs"))
      .collect().head.getSeq[Double](0)
    // nearest-rank p50 of 0..99 is rank 50 -> value 49; max 99
    assert(est == Seq(49.0, 99.0))
  }

  test("quantile sketch works grouped and under rollup (usability claim)") {
    val df = spark.range(3000).select((col("id") % 3).as("g"),
      (col("id") % 2).as("h"), col("id").as("v"))
    val grouped = df.groupBy("g")
      .agg(approxQuantiles(col("v"), Seq(0.5)).as("qs"))
      .collect()
    assert(grouped.length == 3)
    grouped.foreach { r =>
      val p50 = r.getSeq[Double](1).head
      assert(math.abs(p50 - 1500.0) < 60.0, r.toString) // ~median of each residue class
    }
    val ru = df.rollup("g", "h")
      .agg(approxQuantiles(col("v"), Seq(0.9)).as("qs")).collect()
    assert(ru.length == 3 * 2 + 3 + 1)
    ru.foreach(r => assert(!r.isNullAt(2), r.toString))
  }

  // ---------------------------------------------- Count-Min sketch

  import graft.functions.SketchFunctions.{countMin, cmsEstimate}

  /** Zipf-ish stream: "w1" 1000x, "w2" 500x, ..., plus a 2000-item
    * distinct tail — point queries must hold for heavy AND tail items.
    */
  private def cmsCorpus = {
    val heavy = (1 to 10).flatMap(i => Seq.fill(1000 / i)(s"w$i"))
    val tail = (1 to 2000).map(i => s"t$i")
    (heavy ++ tail).toDF("v")
  }

  test("cms never undercounts; overcount bounded by eN (property)") {
    val df = cmsCorpus
    val n = df.count()
    val sk = df.agg(countMin(col("v")).as("sk"))
    val probes = (1 to 10).map(i => s"w$i") ++ Seq("t1", "t1999", "absent")
    val exact = df.groupBy("v").count().as[(String, Long)].collect().toMap
    val est = probes.map(p => p -> sk.select(cmsEstimate(col("sk"), lit(p)))
      .as[Long].head()).toMap
    val epsN = math.ceil(math.E / 256 * n).toLong
    probes.foreach { p =>
      val t = exact.getOrElse(p, 0L)
      assert(est(p) >= t, s"$p undercounted: ${est(p)} < $t")
      assert(est(p) <= t + epsN, s"$p overcounted past eN: ${est(p)} vs $t + $epsN")
    }
  }

  test("cms merge is exact: merged counters identical to the one-pass sketch") {
    val df = cmsCorpus
    // partial sketches per split, merged by re-aggregation, vs one pass
    val one = df.agg(countMin(col("v")).as("sk")).as[Seq[Long]].head()
    val split = df.repartition(16).agg(countMin(col("v")).as("sk"))
      .as[Seq[Long]].head()
    assert(one == split, "CMS merge must be counter-wise exact")
  }

  test("cms nulls ignored; grouped sketches independent; width knob honors layout") {
    val df = Seq(Some("a"), None, Some("a"), Some("b")).toDF("v")
    val sk = df.agg(countMin(col("v")).as("sk"))
    assert(sk.select(cmsEstimate(col("sk"), lit("a"))).as[Long].head() >= 2L)
    val arr = sk.as[Seq[Long]].head()
    assert(arr(0) == 4L && arr(1) == 256L && arr(2) == 3L) // depth, width, N(non-null)
    val g = spark.range(200)
      .select((col("id") % 2).as("g"),
        concat(lit("k"), (col("id") % 5)).as("v"))
      .groupBy("g").agg(countMin(col("v"), depth = 3, width = 64).as("sk"))
      .select(col("g"), cmsEstimate(col("sk"), lit("k0")).as("e"))
      .as[(Long, Long)].collect().toMap
    // k0 occurs 20x in each of the two groups (ids ≡ 0 mod 10 per parity)
    assert(g.values.forall(v => v >= 20L && v <= 20L + 200 / 64 * 3), g.toString)
  }

  test("cms combines map-side like the other sketches (object hash aggregate)") {
    val df = spark.range(10000)
      .select(concat(lit("k"), col("id") % 7).as("v"))
      .agg(countMin(col("v")).as("sk"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert("graft_cms".r.findAllIn(plan).size >= 2, plan)
  }

  // SQL-callable registration is covered in GraftExtensionsSpec (it
  // needs the cleared-session dance extensions binding requires).
}
