package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val only = args.drop(2).toSet // optional: restrict to these queries
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // the ONE engine session recipe ([[Sessions]]) — identical conf
    // posture to the bench, so the oracle verifies what Bench times
    val spark = Sessions.localBuilder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val failed = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failed(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
        // under committer v2 a mid-write failure can leave committed-
        // looking part files at the destination (v1 kept them in
        // _temporary) — and a failure during job FINALIZATION leaves
        // complete-looking output; sweep it so a failed query has no
        // artifact and errors.json stays the single source of truth
        try graft.ops.Staging.deleteTree(s"$outDir/$name")
        catch { case _: Throwable => () }
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Name every query that threw (r10: six queries errored before
    // writing output and simply vanished from the correctness record —
    // no parquet dir, no entry, nothing to grep). errors.json makes a
    // red query a first-class artifact next to oracle_sql.json; capped
    // messages keep the file bounded in a mass-failure round.
    val errJson = failed
      .map { case (k, v) => s"${q(k)}: ${q(v.take(500))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    if (failed.nonEmpty)
      System.err.println(
        s"[verify] ${failed.size} queries failed: ${failed.keys.mkString(", ")}")
    spark.stop()
  }
}
