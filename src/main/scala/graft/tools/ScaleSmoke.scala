package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-posture smoke: synthesize a corpus `factor`x bigger than
  * sf0.1 (default 10x ≈ "sf1") by stacking the self-contained tables
  * with remapped keys, then time a heavy-operator subset against it.
  *
  * The point is empirical: the dedup/similarity/events operators carry
  * "cost follows collisions / bounded state / one shuffle" claims in
  * their scaladoc, and this harness is where a quadratic blowup would
  * actually show (e.g. every stacked copy of a document is a true
  * near-dup of its siblings, so the dup graph holds factor-sized
  * clusters per source doc — candidate generation must stay linear in
  * true pairs, and the contraction must converge in O(log d) rounds).
  *
  * Stacking contract: documents/embeddings/events get copy i's ids
  * offset by i * 10^8 (disjoint id spaces, identical content — the
  * adversarial dedup shape); events users offset so sessions don't
  * merge across copies; the TPC-H star tables are passed through
  * unchanged (their joins need cross-table key consistency that
  * stacking would break — core-op scale is exercised by the driver
  * bench at sf0.1 and by partitioned shuffles that are already
  * row-linear). Output dir is a full testdata layout, so ANY
  * registered query runs against it:
  *   runMain graft.tools.ScaleSmoke [factor] [query ...]
  */
object ScaleSmoke {
  private val Off = 100000000L

  def stack(df: DataFrame, factor: Int, idCols: Seq[String]): DataFrame =
    (0 until factor).map { i =>
      idCols.foldLeft(df)((d, c) =>
        d.withColumn(c, col(c) + lit(i * Off)))
    }.reduce(_ unionAll _)

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val queries = if (args.length > 1) args.drop(1).toSeq else Seq(
      "q_dedup_clusters", "q_dedup_corpus", "q_cluster_canonical",
      "q_minhash_lsh", "q_simhash_pairs64", "q_passage_dedup",
      "q_span_dedup", "q_ngram_novelty", "q_vocab_growth", "q_bpe_train",
      "q_bloom_decontaminate", "q_bm25", "q_semantic_dedup",
      "q_semantic_decontaminate",
      "q_embed_lsh", "q_ann_ivf", "q_pagerank", "q_entity_resolution",
      "q_window_session", "q_gaps", "q_session_paths", "q_source_drift",
      "q_pipeline_corpus",
      "q_perplexity_bucket", "q_zipf_fit", "q_moore_lewis",
      "q_embed_covariance", "q_ndcg", "q_mmr_diversify",
      // round-12 session 3: LM / training-prep / eval heavies
      "q_bigram_lm", "q_source_overlap", "q_silhouette", "q_lr_train",
      "q_simhash_recall", "q_span_corrupt")
    val src = "/root/testdata/sf0.1"
    val out = s"/tmp/graft_scale_${factor}x"
    val spark = graft.Sessions.localBuilder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val stacked = Map(
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"),
      "events" -> Seq("event_id", "user_id"))
    graft.model.Tables.names.foreach { t =>
      val base = graft.model.Tables.load(spark, src, t)
      val big = stacked.get(t) match {
        case Some(ids) => stack(base, factor, ids)
        case None => base
      }
      big.write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    println(s"[scale] materialized ${factor}x at $out")

    queries.foreach { n =>
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(n)(spark, out).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[scale] $n%-24s $sec%7.2f s  ($rows rows)")
    }
    spark.stop()
  }
}
