package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench line protocol to the driver's stdout-tail budget.
  *
  * The driver keeps a fixed ~2000-char TAIL of the bench stdout; the
  * r8 record went parsed=null because the then-last line carried the
  * full per-query map and outgrew the window. The contract now is:
  * the FINAL printed line is map-free and bounded regardless of how
  * many queries the registry holds — these tests render the lines for
  * the CURRENT registry and a worst-case future one, so registry
  * growth can never silently re-blind the BENCH gate.
  */
class BenchFormatSpec extends AnyFunSuite {
  // the driver tail also contains sbt's "[info] " prefix on the line
  // and a trailing "[success] Total time: ..." line (~80 chars)
  private val prefix = "[info] "
  private val tailBudget = 1900

  private def fakeMins: Seq[(String, Double)] =
    Queries.all.map(q => q.name -> 9999.99)

  test("final total line fits the driver tail for the current registry") {
    val calib = Seq.fill(3)(99.999)
    val line = BenchFormat.totalLine(99999.999, "sf0.1", 3,
      Queries.all.size, calib)
    assert(prefix.length + line.length <= tailBudget,
      s"total line ${line.length} chars — over tail budget")
  }

  test("total line stays bounded even at 10x the registry and 9 passes") {
    // map-free by construction: only the calibration array grows with
    // passes (one entry per EXECUTED pass, load-adaptive cap included),
    // never with registry size
    val calib = Seq.fill(9)(9999.9999)
    val line = BenchFormat.totalLine(999999.999, "sf100.0", 3,
      Queries.all.size * 10, calib, errors = 9999L, passesRun = 9)
    assert(prefix.length + line.length <= tailBudget,
      s"total line ${line.length} chars — over tail budget")
  }

  test("total line publishes passes_run when the adaptive loop extended") {
    val line = BenchFormat.totalLine(50.0, "sf0.1", 3, Queries.all.size,
      Seq(1.02, 0.66, 0.55, 0.28), passesRun = 4)
    assert(line.contains(""""passes":3"""))
    assert(line.contains(""""passes_run":4"""))
    assert(line.contains(""""calibration_per_pass_sec":[1.020,0.660,0.550,0.280]"""))
  }

  test("calibration ceiling: a record whose quietest pass beats the " +
      "floor is quiet:true; one that never saw a quiet host self-rejects") {
    val quiet = BenchFormat.totalLine(50.0, "sf0.1", 3, Queries.all.size,
      Seq(1.02, 0.66, 0.28), passesRun = 3)
    assert(quiet.contains(""""quiet":true"""), quiet)
    val loaded = BenchFormat.totalLine(50.0, "sf0.1", 3, Queries.all.size,
      Seq(1.02, 0.66, 0.55, 0.47, 0.46, 0.48, 0.51), passesRun = 7)
    assert(loaded.contains(""""quiet":false"""), loaded)
    // r17 tightening: a 0.44 s "quietest pass" (which the r16 ceiling
    // of 0.45 accepted) is ~2x the true historical floor — rejected
    val nearMiss = BenchFormat.totalLine(50.0, "sf0.1", 3, Queries.all.size,
      Seq(0.66, 0.44, 0.38), passesRun = 3)
    assert(nearMiss.contains(""""quiet":false"""), nearMiss)
  }

  test("total line is valid JSON with the driver-contract fields") {
    val line = BenchFormat.totalLine(42.4, "sf0.1", 3, Queries.all.size,
      Seq(0.55, 0.37, 0.27))
    // minimal structural check without a JSON lib on the main classpath
    assert(line.startsWith("""{"metric":"total","value":42.400,"unit":"sec""""))
    assert(line.contains(""""sf":"sf0.1""""))
    assert(line.contains(""""passes":3"""))
    assert(line.contains(""""passes_run":3"""))
    assert(line.contains(s""""queries_n":${Queries.all.size}"""))
    assert(line.contains(""""errors":0"""))
    assert(line.contains(""""calibration_per_pass_sec":[0.550,0.370,0.270]"""))
    assert(line.endsWith("}"))
    assert(line.count(_ == '{') == 1 && line.count(_ == '}') == 1)
  }

  test("only the total line carries metric=total (no driver ambiguity)") {
    val mins = fakeMins
    val medians = mins
    val detail = BenchFormat.detailLine(mins, medians, "/x/sf0.1", 3, Seq(1.0))
    val queries = BenchFormat.queriesLine(mins, "sf0.1", 3, decimals = 2)
    assert(!detail.contains("\"metric\":\"total\""))
    assert(!queries.contains("\"metric\":\"total\""))
  }

  test("queries line carries every registered query under its compact key") {
    val line = BenchFormat.queriesLine(fakeMins, "sf0.1", 3, decimals = 2)
    Queries.all.foreach { q =>
      val key = "\"" + q.name.stripPrefix("q_") + "\":"
      assert(line.contains(key), s"missing ${q.name} on queries line")
    }
  }

  test("numbers format locale-independently") {
    assert(BenchFormat.num(1234.5678, 2) == "1234.57")
    assert(BenchFormat.num(0.1, 3) == "0.100")
  }

  test("total line names errored queries, sorted and capped") {
    val errored = Seq("q_window_sliding", "q_gaps", "q_window_tumbling")
    val line = BenchFormat.totalLine(50.0, "sf0.1", 3, Queries.all.size,
      Seq(0.3, 0.3, 0.3), errors = 9L, errored = errored)
    assert(line.contains(
      """"errored":["q_gaps","q_window_sliding","q_window_tumbling"]"""))
    // cap: a mass failure must not flood the line
    val many = (1 to 50).map(i => f"q_some_long_query_name_$i%02d")
    val capped = BenchFormat.totalLine(50.0, "sf0.1", 3, Queries.all.size,
      Seq(0.3), errors = 150L, errored = many)
    assert(capped.split("\"errored\":\\[")(1).split("]")(0)
      .count(_ == ',') == BenchFormat.ErroredCap - 1)
  }

  test("total line fits the tail with the errored cap saturated") {
    // worst realistic shape: 10 long query names + 9 adaptive passes
    val errored = (1 to 50).map(i => f"q_sample_priority_grouped_$i%02d")
    val calib = Seq.fill(9)(9999.9999)
    val line = BenchFormat.totalLine(999999.999, "sf100.0", 3,
      Queries.all.size, calib, errors = 9999L, passesRun = 9,
      errored = errored)
    assert(prefix.length + line.length <= tailBudget,
      s"total line ${line.length} chars — over tail budget")
  }

  test("empty errored renders as an empty array (record stays parseable)") {
    val line = BenchFormat.totalLine(42.4, "sf0.1", 3, Queries.all.size,
      Seq(0.55))
    assert(line.contains(""""errored":[]"""))
  }
}
