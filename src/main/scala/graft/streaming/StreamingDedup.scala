package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ext.{Dedup, DupGraph}

/** Streaming dup-graph maintenance: the durable day-2 refresh loop
  * ([[Dedup.refreshDupGraph]]) driven by a document STREAM — each
  * micro-batch folds into the graph stored at `path` and the result is
  * written back in place, so the on-disk pairs/clusters/index always
  * reflect every document seen so far. This is the production shape
  * for a daily/hourly crawl: candidate pairs for a batch cost
  * batch-index × stored-index shared shingles, never a corpus
  * re-enumeration, and any downstream consumer (dedup corpus,
  * leakage-safe split, size QA) reads the current cluster table
  * between batches.
  *
  * foreachBatch, not transformWithState: the graph's state IS the
  * parquet artifact (shared with batch jobs and surviving restarts by
  * construction), and the contraction is a multi-job iterative
  * operator that cannot run inside a stateful-operator update. The
  * sink is idempotent under micro-batch replay ONLY for append-shaped
  * recoveries (a replayed batch's ids already in the stored index
  * would self-pair — the same disjoint-ids contract as the batch
  * refresh); exactly-once deployments should key the write on
  * batchId (versioned dirs) or dedup ids upstream.
  *
  * Batch==streaming contract (spec-pinned): after processing batches
  * B1..Bk, the stored clusters equal `dupGraph(B1 ∪ … ∪ Bk)`'s — the
  * refresh==rebuild property, streamed.
  */
object StreamingDedup {

  /** Start the maintenance loop over a streaming frame bearing
    * (`doc_id`, `text`) columns. The first micro-batch builds the
    * graph; every later one refreshes it.
    */
  def maintain(docs: DataFrame, path: String): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        // the probe is the COMMIT POINTER, not a table dir: a version
        // is discoverable only after write()'s atomic pointer swap, so
        // a crash mid-write can never make a restarted loop mistake a
        // partial graph for "nothing stored" and silently rebuild from
        // one batch
        val g =
          if (!DupGraph.exists(path))
            Dedup.dupGraph(batch.toDF(), col("text"), col("doc_id"))
          else Dedup.refreshDupGraph(DupGraph.read(spark, path),
            batch.toDF(), col("text"), col("doc_id"))
        try g.write(path) finally g.unpersist()
        ()
      }
      .start()
}
