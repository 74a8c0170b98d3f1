package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.DupGraph
import graft.streaming.StreamingDedup

/** Streaming dup-graph maintenance cost ladder (r13 VERDICT item 6 /
  * r14 item 7): drive [[StreamingDedup.foldBatch]] over K id-ranged
  * micro-batches of a (optionally stacked) document corpus and record,
  * PER BATCH, the fold wall time and the COMMIT BYTES the version
  * actually wrote — the measurement that motivates and validates the
  * segment-incremental commit (r15): fold cost follows the batch ×
  * shared-shingle collisions, and commit bytes must stay flat in
  * CORPUS size (each version writes only its batch's index/pairs
  * segments + a cluster CHANGE delta — new docs + the true merge
  * ripple), where the pre-segment layout rewrote the whole corpus
  * index, and then the whole cluster table, every batch.
  *
  * Output: one `[ladder]` line per batch
  * (batch, rows, fold_sec, commit_mb, cum_docs, segment list), then a
  * compact JSON summary line for SCALE.md/BASELINE.md.
  *
  * Usage: runMain graft.tools.DupGraphLadder [sfDir] [factor] [batches]
  *        [compactEvery]
  * (factor stacks documents with disjoint id spaces, the ScaleSmoke
  * convention — every copy is a true near-dup of its siblings, the
  * adversarial dedup shape). `compactEvery` > 0 enables the streaming
  * maintainers' auto-compaction policy (r16): per-batch `segs` then
  * stays bounded by the threshold — the read-amplification ceiling —
  * where the uncompacted run grows it one per batch, and fold wall
  * stops inheriting a per-stored-segment join fan-out as the stream
  * ages (compaction batches themselves spike by the corpus rewrite;
  * that is the amortized price, visible in the row).
  */
object DupGraphLadder {

  private def dirBytes(p: String): Long = {
    import scala.jdk.CollectionConverters._
    val path = java.nio.file.Paths.get(p)
    if (!java.nio.file.Files.exists(path)) return 0L
    val s = java.nio.file.Files.walk(path)
    try s.iterator().asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .map(java.nio.file.Files.size(_)).sum
    finally s.close()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 1
    val batches = if (args.length > 2) args(2).toInt else 5
    val compactEvery = if (args.length > 3) args(3).toInt else 0
    val out = java.nio.file.Files.createTempDirectory("graft_ladder").toString
    val spark = graft.Sessions.localBuilder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = {
      val base = graft.model.Tables.load(spark, sfDir, "documents")
        .select("doc_id", "text")
      (if (factor > 1) ScaleSmoke.stack(base, factor, Seq("doc_id"))
       else base).localCheckpoint(true)
    }
    val n = docs.count()
    // contiguous id-range batches over the (offset-stacked) id space:
    // deterministic, append-ordered, every batch disjoint
    val ids = docs.select("doc_id").orderBy("doc_id")
      .collect().map(_.getLong(0))
    val bounds = (1 until batches).map(i => ids(i * ids.length / batches))
    println(s"[ladder] corpus $n docs (${factor}x $sfDir), $batches batches")

    var cum = 0L
    val rows = (0 until batches).map { b =>
      val lo = if (b == 0) Long.MinValue else bounds(b - 1)
      val hi = if (b == batches - 1) Long.MaxValue else bounds(b)
      val batch = docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
      val bn = batch.count()
      cum += bn
      val t0 = System.nanoTime()
      StreamingDedup.foldBatch(batch, out, batchId = b.toLong,
        compactEvery = compactEvery)
      val sec = (System.nanoTime() - t0) / 1e9
      val segn = graft.streaming.Maintenance.segmentCount(out,
        Seq("isegs", "psegs", "clsegs"))
      // net new bytes this commit (segments written + new version dir;
      // GC of superseded versions nets OUT, so measure gross writes via
      // the new version's own artifacts)
      val v = graft.ops.Staging.currentVersion(out).get
      val segs = graft.ops.Staging.readManifest(
        graft.ops.Staging.versionDir(out, v))
      val newSegBytes =
        dirBytes(s"$out/segments/i$v") + dirBytes(s"$out/segments/p$v")
      // clusters commit as a CHANGE delta segment since r15
      val clusterBytes = dirBytes(s"$out/segments/k$v")
      val commitMb = (newSegBytes + clusterBytes) / 1e6
      println(f"[ladder] batch $b%2d rows $bn%8d fold $sec%7.2f s " +
        f"commit $commitMb%8.2f MB (segs ${newSegBytes / 1e6}%6.2f + " +
        f"clusters ${clusterBytes / 1e6}%6.2f) cum $cum%9d segn=$segn " +
        s"isegs=${segs.getOrElse("isegs", "?")}")
      (b, bn, sec, commitMb, segn)
    }
    val g = DupGraph.read(spark, out)
    println(f"[ladder] final clusters=${g.clusters.count()}%d " +
      f"pairs=${g.pairs.count()}%d index=${g.index.count()}%d " +
      f"total_mb=${dirBytes(out) / 1e6}%.2f")
    println("{\"metric\":\"dupgraph_ladder\"," +
      s""""sf_dir":"$sfDir","factor":$factor,"docs":$n,""" +
      s""""compact_every":$compactEvery,""" +
      "\"batches\":[" + rows.map { case (b, bn, sec, mb, segn) =>
        f"""{"b":$b,"rows":$bn,"fold_sec":$sec%.2f,""" +
          f""""commit_mb":$mb%.2f,"segn":$segn}"""
      }.mkString(",") + "]}")
    spark.stop()
  }
}
