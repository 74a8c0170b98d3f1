package graft
import org.apache.spark.sql.SparkSession

/** Renders the bench JSON lines. Extracted from [[Bench]] so
  * BenchFormatSpec can render the lines for the CURRENT registry size
  * and assert the driver-tail budget before the driver does.
  *
  * Line protocol (printed in this order; the driver keeps only a
  * fixed-size stdout TAIL, so the LAST line is the one guaranteed
  * visible):
  *   1. "detail"  — full-precision mins + medians + calibration (the
  *      committed record; may exceed the tail window).
  *   2. "queries" — compact per-query mins (best-effort: gives the
  *      judge per-query visibility when it fits the tail).
  *   3. "total"   — map-free, ~150 chars, ALWAYS fits: total seconds,
  *      sf, passes, query count, calibration per pass. This is the
  *      canonical driver-parsed line; r8's record went parsed=null
  *      because the then-last line carried the full 111-query map and
  *      outgrew the tail.
  */
object BenchFormat {
  def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  // locale-independent formatting: the f-interpolator follows the JVM
  // default locale and could emit comma decimals into the JSON line
  def num(v: Double, decimals: Int): String =
    String.format(java.util.Locale.ROOT, s"%.${decimals}f", Double.box(v))

  def obj(vals: Seq[(String, Double)]): String =
    vals.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")

  // compact keys drop the uniform "q_" prefix (full names live on the
  // detail line and in CORRECTNESS_r*.json)
  def objCompact(vals: Seq[(String, Double)], decimals: Int): String =
    vals.map { case (k, v) =>
      s"\"" + k.stripPrefix("q_") + "\":" + num(v, decimals)
    }.mkString("{", ",", "}")

  def detailLine(mins: Seq[(String, Double)], medians: Seq[(String, Double)],
                 sfDir: String, passes: Int, calib: Seq[Double]): String = {
    val total = mins.map(_._2).sum
    val calibJson = calib.map(num(_, 4)).mkString("[", ",", "]")
    s"""{"metric":"detail","value":$total,"unit":"sec","queries":${obj(mins)},""" +
      s""""sf":"$sfDir","passes":$passes,"method":"min-of-$passes-interleaved-passes",""" +
      s""""queries_median":${obj(medians)},"calibration_per_pass_sec":$calibJson}"""
  }

  def queriesLine(mins: Seq[(String, Double)], sfName: String, passes: Int,
                  decimals: Int): String =
    s"""{"metric":"queries","value":${num(mins.map(_._2).sum, 3)},"unit":"sec",""" +
      s""""queries":${objCompact(mins, decimals)},"sf":"$sfName","passes":$passes}"""

  /** The canonical driver-parsed line: map-free, bounded length
    * regardless of registry size. `errors` counts query executions that
    * threw — a failing query otherwise times as ~0 s and makes the
    * total look BETTER, so the record must carry the denominator.
    * `errored` NAMES the distinct failing queries (capped at
    * [[ErroredCap]] so the line stays inside the driver's stdout-tail
    * budget even in a mass-failure round; r10's record carried
    * errors:18 but a reader had to rerun Verify to learn WHICH six
    * queries were red). `passes` is the CONFIGURED base pass count;
    * `passesRun` is how many passes actually executed (≥ passes when
    * the load-adaptive loop extended the run — see [[Bench]]); the
    * calibration array has one entry per executed pass, so a contended
    * record carries both the evidence (high early calibrations) and
    * the remedy (a late quiet pass that min-of-passes picked up).
    */
  val ErroredCap = 10

  /** Calibration ceiling (r16, tightened r17): a record whose QUIETEST
    * pass still exceeds this is load-contaminated end to end —
    * min-of-passes never saw an uncontended host — and must SELF-REJECT
    * via `"quiet":false` on the total line instead of shipping a
    * silently inflated number (the r15 driver record read +23% purely
    * from ambient load and the evidence lived outside the record).
    * Set at 1.5x the recorded historical quiet floor (~0.17-0.22 s
    * across r13-r16 captures): the r16 value of 0.45 barely rejected
    * anything — a 0.44 s "quiet" pass is ~2x the true floor, which is
    * exactly the contamination the flag exists to name. Matches the
    * load-adaptive loop's default quiet floor.
    */
  val CalibrationCeiling = 0.30

  def totalLine(total: Double, sfName: String, passes: Int, nQueries: Int,
                calib: Seq[Double], errors: Long = 0L,
                passesRun: Int = -1,
                errored: Seq[String] = Nil,
                quietFloor: Double = CalibrationCeiling): String = {
    val calibJson = calib.map(num(_, 3)).mkString("[", ",", "]")
    val run = if (passesRun < 0) passes else passesRun
    val erroredJson = errored.sorted.take(ErroredCap)
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val quiet = calib.nonEmpty && calib.min <= quietFloor
    s"""{"metric":"total","value":${num(total, 3)},"unit":"sec","sf":"$sfName",""" +
      s""""passes":$passes,"passes_run":$run,"queries_n":$nQueries,"errors":$errors,""" +
      s""""errored":$erroredJson,"quiet":$quiet,""" +
      s""""calibration_per_pass_sec":$calibJson}"""
  }
}

/** Bench harness (driver contract): JSON lines with per-query and
  * total seconds at SPARK_GRAFT_SF_DIR; the LAST line is a short
  * map-free total (see [[BenchFormat]] for the line protocol).
  *
  * Methodology (BASELINE.md "Recorded numbers"): every query is timed
  * once per pass, for `passes` (default 3) full passes over the whole
  * query set, and the reported per-query number is the MIN of its
  * samples; total = sum of mins. Contention on the shared host only
  * ever ADDS time (the single-shot r2/r3 harness swung unchanged
  * queries 7x between rounds), so the min is the estimator of the
  * engine's actual cost with the least contamination, and — unlike a
  * median under sustained load — it is reproducible across runs.
  * Passes are interleaved (a query's samples are taken minutes apart)
  * so one burst cannot poison all samples of a query; per-query
  * medians ride along under "queries_median" for transparency. A fixed
  * calibration query (tiny groupBy, constant work) is timed at the
  * start of every pass; its per-pass times are published on the FINAL
  * line so a contended environment is visible in the driver record
  * rather than inferred from query swings.
  *
  * Load-adaptive extension: if after the base passes the MINIMUM
  * calibration still exceeds the quiet floor (no pass ran on a quiet
  * host), extra passes run — up to SPARK_GRAFT_BENCH_MAX_PASSES
  * (default 7) total — until one does. `passes_run` and the
  * per-executed-pass calibration array on the total line let the
  * record defend itself: a reader can see both the contention and
  * whether the mins ultimately came from a quiet sample.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    // the ONE engine session recipe ([[Sessions]]): codegen cache
    // sized to the registry, committer v2, UTC — shared with Verify,
    // every probe, and library consumers, so no main drifts
    val spark = Sessions.localBuilder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warm-up: pay JIT/classloader/parquet-footer costs once so
    // the first measured query isn't charged ~3-4s of JVM start-up
    try {
      spark.range(1000).selectExpr("sum(id)").count()
      graft.model.Tables.load(spark, sfDir, "nation").count()
      // warm the calibration table too: pass 0's probe must not be the
      // first-ever orders read, or cold footer/codegen costs masquerade
      // as pass-0 host load in calibration_per_pass_sec
      graft.model.Tables.load(spark, sfDir, "orders")
        .groupBy("o_orderstatus").count().count()
    } catch { case _: Throwable => () }

    var errors = 0L
    val erroredNames = scala.collection.mutable.Set.empty[String]
    def time(label: String)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      // swallow (one broken query must not kill the whole record) but
      // COUNT and NAME: a throw times as ~0 s, which inflates nothing —
      // the errors/errored fields on the total line keep the record
      // honest and point straight at the red queries
      try body catch { case e: Throwable =>
        errors += 1
        if (label.nonEmpty) erroredNames += label
        System.err.println(s"[bench] query failed ($label): ${e.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }
    // fixed-work contention probe: same tiny aggregate every pass
    def calibrate(): Double = time("") {
      graft.model.Tables.load(spark, sfDir, "orders")
        .groupBy("o_orderstatus").count().count()
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
    def runPass(): Double = {
      val c = calibrate()
      names.foreach { n =>
        val s = time(n)(SparkEntry.queries(n)(spark, sfDir).count())
        samples(n) = s :: samples.getOrElse(n, Nil)
      }
      c
    }
    val calibBuf = scala.collection.mutable.ArrayBuffer.empty[Double]
    (0 until passes).foreach(_ => calibBuf += runPass())
    // Load-adaptive extension: two consecutive driver records (r8, r9)
    // were inflated 1.6-2.6x by ambient host load that min-of-3 could
    // not fully mask. The fixed-work calibration probe tells us whether
    // ANY pass ran on a quiet host; while even the QUIETEST pass is
    // above the quiet floor, keep adding passes (bounded) so
    // min-of-passes gets at least one uncontended sample per query.
    // The floor default (0.30 s = BenchFormat.CalibrationCeiling) is
    // 1.5x the observed historical quiet probes (~0.17-0.22 s); loaded
    // ones read 0.45-1.0+ s.
    val quietFloor = sys.env.getOrElse("SPARK_GRAFT_BENCH_QUIET_FLOOR",
      BenchFormat.CalibrationCeiling.toString).toDouble
    val maxPasses =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_PASSES", "7").toInt
    while (calibBuf.min > quietFloor && calibBuf.size < maxPasses)
      calibBuf += runPass()
    val calib = calibBuf.toSeq
    val passesRun = calib.size
    val mins = names.map(n => n -> samples(n).min)
    val medians = names.map(n => n -> BenchFormat.median(samples(n)))
    val total = mins.map(_._2).sum
    val sfName = new java.io.File(sfDir).getName
    val detail = BenchFormat.detailLine(mins, medians, sfDir, passesRun, calib)
    println(detail)
    println(BenchFormat.queriesLine(mins, sfName, passesRun, decimals = 2))
    // LAST line = the driver-parsed one; bounded size by construction
    println(BenchFormat.totalLine(total, sfName, passes, names.size, calib,
      errors, passesRun, erroredNames.toSeq, quietFloor))
    // optional file sink for the FULL detail record: the driver keeps
    // only a fixed stdout tail, which truncates the per-query map once
    // the registry outgrows it (r12's committed record lost every query
    // past 'n' alphabetically) — a committed closing artifact should
    // come from here, not from the tail
    sys.env.get("SPARK_GRAFT_BENCH_FILE").foreach { f =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(f),
        detail + "\n")
    }
    spark.stop()
    // exit nonzero on a red run so an exit-code gate catches it without
    // parsing the tail (r10 shipped rc:0 with errors:18)
    if (errors > 0) sys.exit(1)
  }
}
