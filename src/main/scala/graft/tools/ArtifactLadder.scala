package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.{StreamingAnn, StreamingHamming, StreamingNovelty}

/** Per-batch commit-cost ladder for the OTHER two durable artifacts
  * ([[DupGraphLadder]] covers the dup graph): drive the streaming
  * maintenance fold over K id-ranged micro-batches and record fold
  * wall + the COMMIT BYTES each version wrote. The contract under
  * measurement is the same segment-incremental one: ANN commit bytes
  * follow the batch's m code cells per vector (centroids/codebooks are
  * catalog-sized rewrites); novelty commit bytes follow the batch's
  * NEW shingles only — a re-crawl-heavy batch commits almost nothing,
  * and neither ever rewrites the accumulated corpus segments.
  *
  * `hamming` (r19) drives [[StreamingHamming]] over the media
  * fixture's closed-form fingerprints (8 bytes/item — the decode
  * stage's output shape): index commit bytes follow the batch's
  * banded rows, pair commit bytes follow the batch's TRUE new pairs.
  *
  * Usage: runMain graft.tools.ArtifactLadder [ann|novelty|hamming]
  *        [sfDir] [factor] [batches] [compactEvery]
  * `compactEvery` > 0 enables the maintainers' auto-compaction policy
  * (r16): per-batch `segn` stays bounded by the threshold (the read
  * amplification ceiling) instead of growing one per batch; trigger
  * batches pay the corpus rewrite visibly — the amortized price.
  */
object ArtifactLadder {

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
    val kind = if (args.length > 0) args(0) else "ann"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val factor = if (args.length > 2) args(2).toInt else 1
    val batches = if (args.length > 3) args(3).toInt else 5
    val compactEvery = if (args.length > 4) args(4).toInt else 0
    val out = java.nio.file.Files.createTempDirectory(s"graft_${kind}_ladder")
      .toString
    val spark = graft.Sessions.localBuilder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val (table, idCol) =
      if (kind == "ann") ("embeddings", "vec_id") else ("documents", "doc_id")
    val rowsDf = {
      val base = graft.model.Tables.load(spark, sfDir, table)
      (if (factor > 1) ScaleSmoke.stack(base, factor, Seq(idCol))
       else base).localCheckpoint(true)
    }
    val n = rowsDf.count()
    val ids = rowsDf.select(idCol).orderBy(idCol).collect().map(_.getLong(0))
    val bounds = (1 until batches).map(i => ids(i * ids.length / batches))
    println(s"[ladder:$kind] corpus $n rows (${factor}x $sfDir), $batches batches")

    val recs = (0 until batches).map { b =>
      val lo = if (b == 0) Long.MinValue else bounds(b - 1)
      val hi = if (b == batches - 1) Long.MaxValue else bounds(b)
      val batch = rowsDf.filter(col(idCol) >= lo && col(idCol) < hi)
      val bn = batch.count()
      val t0 = System.nanoTime()
      if (kind == "ann")
        StreamingAnn.foldBatch(
          batch.select(col("vec_id"), col("embedding")), out, b.toLong,
          m = 4, subDim = 16, compactEvery = compactEvery)
      else if (kind == "hamming") {
        // the media fixture's closed-form fingerprints: what the
        // decode stage hands the artifact (8 bytes/item), with the
        // true near-dup group geometry so pair deltas are non-trivial
        import spark.implicits._
        val fps = batch.select(col("doc_id")).as[Long]
          .map(i => (i, graft.ext.Multimodal.targetFp(i)))
          .toDF("doc_id", "fp")
        StreamingHamming.foldBatch(fps, out, b.toLong,
          maxDist = 3, bands = 4, bits = 64, buckets = 32,
          compactEvery = compactEvery)
      } else
        StreamingNovelty.foldBatch(
          batch.select(col("doc_id"), col("text")), out, b.toLong,
          n = 3, buckets = 32, compactEvery = compactEvery)
      val sec = (System.nanoTime() - t0) / 1e9
      val segKey = kind match {
        case "ann" => "csegs"; case "hamming" => "isegs"; case _ => "ssegs"
      }
      val segn = graft.streaming.Maintenance.segmentCount(out, Seq(segKey))
      val v = graft.ops.Staging.currentVersion(out).get
      val segId = segKey.take(1) + v
      val segBytes = dirBytes(s"$out/segments/$segId")
      // ANN catalogs are segment-shared across a train generation
      // (commit-floor trim): only a commit that WROTE them this version
      // (n<v>/b<v> exist) counts them — every other ingest commit
      // references the frozen pair for zero catalog bytes. Hamming's
      // side family is the batch's TRUE-new-pair delta (p<v>).
      val sideBytes =
        if (kind == "ann")
          dirBytes(s"$out/segments/n$v") + dirBytes(s"$out/segments/b$v")
        else if (kind == "hamming") dirBytes(s"$out/segments/p$v")
        else 0L
      val commitMb = (segBytes + sideBytes) / 1e6
      println(f"[ladder:$kind] batch $b%2d rows $bn%8d fold $sec%7.2f s " +
        f"commit $commitMb%8.2f MB (seg ${segBytes / 1e6}%6.2f + " +
        f"side ${sideBytes / 1e6}%5.2f) segn=$segn")
      (b, bn, sec, commitMb, segn)
    }
    // ANN retrain cost: one full-generation rebuild from the corpus
    // vectors (train + union re-encode + full-segment commit) — the
    // amortized price of reacting to the onInertia drift signal
    val retrainSec =
      if (kind == "ann") {
        val t0 = System.nanoTime()
        graft.ext.AnnIndex.retrain(spark, out,
          graft.ext.Similarity.withNorm(rowsDf,
            col("vec_id"), col("embedding")))
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[ladder:$kind] retrain $sec%7.2f s " +
          f"(full generation over $n rows)")
        Some(sec)
      } else None
    println(f"[ladder:$kind] total_mb=${dirBytes(out) / 1e6}%.2f")
    println(s"""{"metric":"${kind}_ladder","sf_dir":"$sfDir",""" +
      s""""factor":$factor,"rows":$n,"compact_every":$compactEvery,""" +
      retrainSec.map(s => f""""retrain_sec":$s%.2f,""").getOrElse("") +
      s""""batches":[""" +
      recs.map { case (b, bn, sec, mb, segn) =>
        f"""{"b":$b,"rows":$bn,"fold_sec":$sec%.2f,""" +
          f""""commit_mb":$mb%.2f,"segn":$segn}"""
      }.mkString(",") + "]}")
    spark.stop()
  }
}
