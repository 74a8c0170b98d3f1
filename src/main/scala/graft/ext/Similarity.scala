package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.ops.Windows

/** Embedding similarity search ([EXT]): brute-force cosine baseline and
  * an IVF-style cluster-pruned variant as the scale path.
  *
  * Vector math uses built-in higher-order functions (zip_with +
  * aggregate) over array<float> cast to double — codegen'd, no UDF,
  * same arithmetic expressible in the DuckDB oracle.
  *
  * 100 TB posture: brute-force is O(queries x corpus) with the corpus
  * scanned once per batch of broadcast queries — correct baseline, used
  * when the query set is small. IVF assigns the corpus to centroids
  * once (narrow, cache-able), then probes only matching clusters,
  * cutting the scanned fraction to ~1/nlist per query.
  */
object Similarity {

  /** dot(a, b) in double precision, sequential accumulation.
    * Native codegen'd kernel (graft.functions.DotProduct); arithmetic
    * identical to `aggregate(zip_with(a, b, _*_), 0.0, _+_)` and to
    * DuckDB's list_dot_product over DOUBLE[].
    */
  def dot(a: Column, b: Column): Column = VectorFunctions.dotNative(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine(a, b) given precomputed norms (avoids recomputing norms
    * inside join conditions).
    */
  def cosinePre(dotAb: Column, na: Column, nb: Column): Column =
    dotAb / (na * nb)

  /** Id + vector + L2 norm — the single entry frame of the cosine
    * family. Rows with a NULL or EMPTY vector are EXCLUDED here: they
    * carry no direction, so neither a query nor a corpus entry is
    * meaningful (and a 0-norm row would turn every downstream cosine
    * into a divide-by-zero). Real corpora hit both on day one — the
    * null fixture gates this contract, mirrored in every oracle's
    * norm CTE.
    */
  def withNorm(emb: DataFrame, id: Column, vec: Column,
               dim: Int = -1, keep: Seq[Column] = Nil): DataFrame =
    emb.filter(vec.isNotNull && size(vec) > 0 &&
        // dim > 0 declares the model dimension and drops RAGGED rows
        // (truncated writes, mixed encoder versions): a wrong-length
        // vector cannot participate in the cosine space — its dot
        // against every well-formed vector is NULL (graft_dot's
        // mismatch rule), which silently SINKS it in rankings here and
        // hard-ERRORS the DuckDB twin (list_dot_product rejects
        // unequal lengths) — so the contract is to exclude it up
        // front, like the other corrupt-row classes below. The null
        // fixture carries ragged rows to gate this cross-engine.
        (if (dim > 0) size(vec) === dim else lit(true)))
      // `keep` carries metadata columns (label, source, …) through the
      // gate so label-consuming operators (knnClassify, marginMine's
      // side split) don't need a second pass over the table
      .select(Seq(id.as("vec_id"), vec.as("v"), norm(vec).as("nm")) ++
        keep: _*)
      // an all-zero vector (failed encoder, padding row) has nm = 0:
      // its cosine is 0/0 = NaN, and Spark sorts NaN ABOVE every real
      // double, so it would rank FIRST in every top-k — dropped here
      // with the other direction-less rows
      .filter(col("nm") > 0)

  /** All pairs (a < b) with cosine >= threshold via the triangular
    * self-join — a SMALL-CORPUS utility (O(n²) BroadcastNestedLoopJoin).
    * The shipped scale path for embedding near-dup is [[signLshPairs]]:
    * bucket by sign-projection LSH first so cost follows collisions.
    */
  def cosinePairs(emb: DataFrame, id: Column, vec: Column,
                  threshold: Double, dim: Int = -1): DataFrame = {
    val n = withNorm(emb, id, vec, dim)
    val a = n.select(col("vec_id").as("va"), col("v").as("xa"), col("nm").as("na"))
    val b = n.select(col("vec_id").as("vb"), col("v").as("xb"), col("nm").as("nb"))
    a.join(b, col("va") < col("vb"))
      .select(col("va"), col("vb"),
        cosinePre(dot(col("xa"), col("xb")), col("na"), col("nb")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Sign-random-projection LSH near-dup pairs — the bucketed scale
    * path for cosinePairs. Each of `tables` hash tables projects a
    * vector onto `bits` seeded Gaussian hyperplanes; the sign bits form
    * the bucket key. Only bucket-mates are compared (exact cosine
    * verify), so cost follows collisions, not n². OR-amplification
    * across tables sets recall: a pair at angle θ collides in one
    * table with probability (1 - θ/π)^bits — near-identical vectors
    * (cos >= 0.99) are found with probability > 0.999 at the default
    * (8 bits × 4 tables); this is approximate by design, unlike the
    * exact triangular baseline.
    */
  /** Deterministic Gaussian hyperplanes for [[signLshPairs]] — exposed
    * so an oracle (e.g. DuckDB SQL with literal plane values) can
    * replicate the exact same bucketing. Same (dim, bits, tables, seed)
    * → same planes.
    */
  def signPlanes(dim: Int, bits: Int, tables: Int,
                 seed: Long): Array[Array[Array[Float]]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(tables, bits, dim)(rnd.nextGaussian().toFloat)
  }

  def signLshPairs(emb: DataFrame, id: Column, vec: Column, dim: Int,
                   threshold: Double, bits: Int = 8, tables: Int = 4,
                   seed: Long = 42L): DataFrame = {
    val planes = signPlanes(dim, bits, tables, seed)
    // dim is the DECLARED model dimension: it sizes the hyperplanes
    // AND drops ragged rows (a wrong-length vector cannot be
    // projected; see withNorm's dim rule)
    val n = withNorm(emb, id, vec, dim)
    val tableStructs = (0 until tables).map { t =>
      val sig = (0 until bits).map { b =>
        when(dot(col("v"), typedLit(planes(t)(b).toSeq)) >= 0, lit(1L << b))
          .otherwise(lit(0L))
      }.reduce(_ + _)
      struct(lit(t).as("tbl"), sig.as("sig"))
    }
    val bucketed = n
      .select(col("vec_id"), col("v"), col("nm"),
        explode(array(tableStructs: _*)).as("bk"))
      .select(col("vec_id"), col("v"), col("nm"),
        col("bk.tbl").as("tbl"), col("bk.sig").as("sig"))
    val a = bucketed.select(col("tbl"), col("sig"),
      col("vec_id").as("va"), col("v").as("xa"), col("nm").as("na"))
    val b = bucketed.select(col("tbl"), col("sig"),
      col("vec_id").as("vb"), col("v").as("xb"), col("nm").as("nb"))
    // shuffle-hash + identical sides -> one exchange, reused (the same
    // plan-shape reasoning as the MinHash LSH band join)
    a.join(b.hint("shuffle_hash"), Seq("tbl", "sig"))
      .filter(col("va") < col("vb"))
      .select(col("va"), col("vb"),
        cosinePre(dot(col("xa"), col("xb")), col("na"), col("nb")).as("cos"))
      .filter(col("cos") >= threshold)
      .distinct()
  }

  /** Symmetric per-vector int8 quantization: q_i = floor(v_i * s + 0.5)
    * with s = 127 / max|v| (zero vectors quantize to all-zero at
    * s = 0). The memory lever for ANN at corpus scale — a 4x cut vs
    * float32 with the scale kept per row for dequantization. floor(x +
    * 0.5) instead of round() because the two engines' round() disagree
    * on tie-breaking (the same trick the exact-money sums use); pure
    * per-row projection, no shuffle.
    */
  def quantizeInt8(emb: DataFrame, id: Column, vec: Column): DataFrame = {
    // the abs-max pass and the quantize pass are native codegen'd
    // kernels (graft_abs_max / graft_quantize — the interpreted-HOF
    // staged form ran three lambda round-trips per corpus row); the
    // staged projections keep `__mx`/`scale` single-evaluation per row
    // (CollapseProject keeps multi-referenced non-cheap aliases
    // staged, so this shape survives optimization)
    emb.select(id.as("vec_id"), vec.as("__v"))
      .select(col("vec_id"), col("__v"),
        VectorFunctions.absMax(col("__v")).as("__mx"))
      .select(col("vec_id"), col("__v"),
        when(col("__mx") === 0.0, lit(0.0))
          .otherwise(lit(127.0) / col("__mx")).as("scale"))
      .select(col("vec_id"), col("scale"),
        VectorFunctions.quantize(col("__v"), col("scale")).as("q"))
  }

  /** Quantized corpus with attached integer norm — the int8 analog of
    * [[withNorm]]. Norms are exact (integer dot, then one sqrt).
    */
  def withQuantNorm(emb: DataFrame, id: Column, vec: Column,
                    dim: Int = -1): DataFrame =
    // same row-drop rule as withNorm incl. the zero-norm case and the
    // declared-dim ragged drop; with max|v| > 0 guaranteed here, the
    // 127/max scaling always quantizes the max element to ±127, so the
    // integer norm below is never 0
    quantizeInt8(emb.filter(vec.isNotNull && size(vec) > 0 &&
      (if (dim > 0) size(vec) === dim else lit(true)) &&
      VectorFunctions.dotNative(vec, vec) > 0), id, vec)
      .select(col("vec_id"), col("q"),
        sqrt(VectorFunctions.dotIntNative(col("q"), col("q")).cast("double")).as("nm"))

  /** Brute-force top-k over int8-quantized vectors ([[withQuantNorm]]
    * frames): the quantized SCAN path — the hot loop is the integer
    * dot kernel (graft_dot_int, exact long arithmetic, no float
    * rounding), and the per-vector scales cancel in the cosine so they
    * are not even read. Same broadcast + WindowGroupLimit shape as
    * [[bruteForceTopK]]. Zero vectors (norm 0) score NaN — quantized
    * search assumes a non-degenerate corpus.
    */
  def quantizedTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("q").as("qq"), col("nm").as("qn"))
    val scored = corpus.join(broadcast(q), col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"),
        (VectorFunctions.dotIntNative(col("qq"), col("q")).cast("double") /
          (col("qn") * col("nm"))).as("cos"))
    Windows.findFirstK(scored,
      keys = Seq(col("qid")),
      priority = Seq(col("cos").desc, col("vec_id")),
      k = k, rankName = "rnk")
  }

  /** Asymmetric quantized search: FLOAT queries against the INT8
    * corpus — the standard serving pattern (corpus quantized for
    * memory, the few queries kept at full precision for accuracy).
    * The corpus scale cancels in the cosine exactly as in the
    * symmetric case: cos(qf, q/s) = dot(qf, q) / (|qf| * |q|), so the
    * scan reads only the int vectors and their integer norms; the
    * mixed float x long dot runs in the same codegen'd kernel
    * (long→double widening is exact for int8 values).
    * queries from [[withNorm]], corpus from [[withQuantNorm]].
    */
  def asymmetricTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("v").as("qv"), col("nm").as("qn"))
    val scored = corpus.join(broadcast(q), col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"),
        (dot(col("qv"), col("q")) / (col("qn") * col("nm"))).as("cos"))
    Windows.findFirstK(scored,
      keys = Seq(col("qid")),
      priority = Seq(col("cos").desc, col("vec_id")),
      k = k, rankName = "rnk")
  }

  /** Brute-force top-k neighbors (cosine) for each query vector;
    * queries are broadcast, corpus is scanned once.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("v").as("qv"), col("nm").as("qn"))
    val scored = corpus.join(broadcast(q), col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"),
        cosinePre(dot(col("qv"), col("v")), col("qn"), col("nm")).as("cos"))
    Windows.findFirstK(scored,
      keys = Seq(col("qid")),
      priority = Seq(col("cos").desc, col("vec_id")),
      k = k, rankName = "rnk")
  }

  /** Reciprocal-rank fusion of two per-query rankings — the standard
    * hybrid-retrieval combiner (fuse an exact ranker with a quantized
    * or lexical one without score calibration):
    * `rrf = Σ 1/(kConst + rank_i)`, a candidate missing from one list
    * contributes 0 for that list. Output keeps the fused rank (`frnk`)
    * and score; final top-`k` per query by (rrf desc, vec_id).
    *
    * Inputs carry (qid, vec_id, rnk) — any of the top-k operators here
    * produce that shape. Scale posture: ONE equi-join on
    * (qid, vec_id) between two already-k-bounded lists (each ≤ k rows
    * per query, never corpus-sized) and one WindowGroupLimit on qid.
    * Determinism: each rrf is two IEEE divisions and one add in fixed
    * order — no shuffle-order accumulation — and ties break on vec_id,
    * so the fused list is bit-stable across engines (SURVEY.md §7.5).
    */
  def rrfFuse(a: DataFrame, b: DataFrame, kConst: Int, k: Int): DataFrame = {
    val ra = a.select(col("qid"), col("vec_id"), col("rnk").as("ra"))
    val rb = b.select(col("qid"), col("vec_id"), col("rnk").as("rb"))
    val fused = ra.join(rb, Seq("qid", "vec_id"), "full_outer")
      .select(col("qid"), col("vec_id"),
        (coalesce(lit(1.0) / (lit(kConst) + col("ra")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kConst) + col("rb")), lit(0.0))).as("rrf"))
    Windows.findFirstK(fused,
      keys = Seq(col("qid")),
      priority = Seq(col("rrf").desc, col("vec_id")),
      k = k, rankName = "frnk")
  }

  /** Hard-negative mining (contrastive-training data prep): for each
    * query vector, the top-k most-similar corpus vectors with a
    * DIFFERENT label — the near-misses a contrastive or reranker loss
    * learns the most from (random negatives are too easy; same-label
    * neighbors are positives). Same broadcast-queries + single corpus
    * scan + WindowGroupLimit shape as [[bruteForceTopK]], with the
    * label-mismatch predicate evaluated on the broadcast join — at IVF
    * scale, compose the same predicate over [[ivfTopK]]'s probed cells
    * instead.
    *
    * Inputs carry (vec_id, v, nm, label) — build with [[withNorm]] plus
    * a label column.
    */
  def hardNegativeTopK(queries: DataFrame, corpus: DataFrame,
                       k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("v").as("qv"),
      col("nm").as("qn"), col("label").as("qlabel"))
    val scored = corpus
      .join(broadcast(q),
        col("qid") =!= col("vec_id") && col("label") =!= col("qlabel"))
      .select(col("qid"), col("vec_id"), col("label"),
        cosinePre(dot(col("qv"), col("v")), col("qn"), col("nm")).as("cos"))
    Windows.findFirstK(scored,
      keys = Seq(col("qid")),
      priority = Seq(col("cos").desc, col("vec_id")),
      k = k, rankName = "rnk")
  }

  /** IVF-style search: assign every corpus vector to its nearest
    * centroid (cluster pruning index), then answer each query by
    * scanning its `nprobe` nearest clusters.
    *
    * nprobe is the recall knob: a query near a Voronoi cell boundary
    * loses true neighbors assigned to the adjacent cell, and probing
    * the next-nearest centroids recovers them (recall is monotone in
    * nprobe; nprobe = nlist degenerates to exact brute force —
    * property-tested in SimilaritySpec). Scanned fraction grows as
    * ~nprobe/nlist, so the 100 TB cost stays cluster-pruned: the
    * corpus-side assignment is one broadcast pass, and each query
    * touches only its probed cells via the bucket equi-join.
    * queries must be drawn from the corpus (joined by vec_id).
    *
    * `broadcastQueries` (default true) assumes the PROBE FRAME is
    * query-batch sized — the interactive-search posture, where
    * broadcasting (qid, qv, cell) to the corpus side avoids shuffling
    * the corpus. A million-query batch (offline re-ranking, all-pairs
    * linking) would OOM that broadcast: set it false and the
    * candidate join shuffles BOTH sides on `cid` instead — each probed
    * cell's corpus vectors meet its queries in one hash-partitioned
    * task, nothing driver-sized anywhere. Same rows either way
    * (spec-pinned); choose by query-batch size.
    */
  def ivfTopK(corpus: DataFrame, centroids: DataFrame,
              queries: DataFrame, k: Int, nprobe: Int = 1,
              broadcastQueries: Boolean = true): DataFrame = {
    val c = centroids.select(col("vec_id").as("cid"), col("v").as("cv"), col("nm").as("cn"))
    // assignment: argmax cosine over centroids (broadcast; one pass)
    val assigned = Windows.findFirst(
      corpus.crossJoin(broadcast(c))
        .select(col("vec_id"), col("v"), col("nm"), col("cid"),
          cosinePre(dot(col("v"), col("cv")), col("nm"), col("cn")).as("ccos")),
      keys = Seq(col("vec_id")),
      priority = Seq(col("ccos").desc, col("cid")))
      .select("vec_id", "v", "nm", "cid")
    // one row per (query, probed cell). At the default nprobe = 1 the
    // probed cell IS the query's assigned cell (identical argmax +
    // tiebreak), already computed by the assignment pass — reuse it for
    // free rather than re-scoring every centroid per query. For
    // nprobe > 1, rank ALL centroids per query and keep the top p.
    val qvec = assigned
      .join(queries.select(col("vec_id").as("qid")), col("qid") === col("vec_id"))
      .select(col("qid"), col("v").as("qv"), col("nm").as("qn"), col("cid"))
    val probes =
      if (nprobe == 1) qvec
      else Windows.findFirstK(
        qvec.drop("cid").crossJoin(broadcast(c))
          .select(col("qid"), col("qv"), col("qn"), col("cid"),
            cosinePre(dot(col("qv"), col("cv")), col("qn"), col("cn")).as("ccos")),
        keys = Seq(col("qid")),
        priority = Seq(col("ccos").desc, col("cid")),
        k = nprobe, rankName = "__probe_rank")
        .select("qid", "qv", "qn", "cid")
    // a corpus vector lives in exactly one cell, so multi-probe never
    // duplicates a (qid, vec_id) candidate
    val probeSide =
      if (broadcastQueries) broadcast(probes) else probes.hint("shuffle_hash")
    val scored = assigned.join(probeSide, Seq("cid"))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"),
        cosinePre(dot(col("qv"), col("v")), col("qn"), col("nm")).as("cos"))
    Windows.findFirstK(scored,
      keys = Seq(col("qid")),
      priority = Seq(col("cos").desc, col("vec_id")),
      k = k, rankName = "rnk")
  }

  /** Spherical k-means Lloyd refinement — the trainer for [[ivfTopK]]'s
    * `centroids` side (which until now took sampled seeds as-is):
    * iteratively reassign every corpus vector to its max-cosine
    * centroid, then recompute each centroid as the FIXED-POINT
    * per-dimension mean of its members. Components quantize to 1/scale
    * before an exact-BIGINT sum, so each mean is exact-int ÷ exact-int
    * — one IEEE division, bit-identical at any parallelism and on any
    * engine, where a raw float mean depends on partial-sum order.
    * Assignment ties break on cid, so the whole trajectory (including
    * which clusters empty out and drop — standard Lloyd degeneracy) is
    * deterministic.
    *
    * Returns the final centroid table as one row per (cid, dim) with
    * the member count `n` and the mean component — the rows-form twin
    * of the (cid, v, nm) frame `ivfTopK` consumes (rebuild arrays with
    * the same sort_array(collect_list) fold used between iterations).
    *
    * Scale posture per iteration: centroids broadcast (k·dim doubles),
    * the corpus is scanned once, the argmax is a WindowGroupLimit
    * riding the broadcast-join exchange (no per-vector sort), and the
    * update shuffles only k·dim aggregate cells after map-side combine
    * — never corpus-sized. `iters` stays a small constant (production
    * IVF trainers run 2-5 Lloyd passes).
    */
  def kmeansRefine(corpus: DataFrame, seeds: DataFrame, iters: Int,
                   scale: Long = 10000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    def update(asg: DataFrame): DataFrame = asg
      .select(col("cid"), posexplode(col("v")))
      .select(col("cid"), col("pos").cast("long").as("dim"),
        floor(col("col").cast("double") * scale + 0.5).cast("long").as("q"))
      .groupBy("cid", "dim")
      .agg(sum("q").as("s"), count(lit(1)).as("n"))
      .withColumn("mean", col("s").cast("double") / (col("n") * scale))
    var cent = seeds.select(col("vec_id").as("cid"), col("v").as("cv"),
      col("nm").as("cn"))
    var upd = update(kmeansAssign(corpus, cent))
    for (_ <- 2 to iters) {
      upd = update(kmeansAssign(corpus, centroidFrame(upd)))
    }
    upd.select(col("cid"), col("dim"), col("n"), col("mean"))
  }

  /** One Lloyd assignment pass: every corpus vector joined to its
    * max-cosine centroid (ties break on cid). Centroids broadcast; the
    * argmax is a WindowGroupLimit riding the broadcast-join output, so
    * nothing corpus-sized shuffles. Returns (vec_id, v, cid, ccos).
    */
  def kmeansAssign(corpus: DataFrame, cent: DataFrame): DataFrame =
    Windows.findFirst(
      corpus.crossJoin(broadcast(cent))
        .select(col("vec_id"), col("v"), col("cid"),
          cosinePre(dot(col("v"), col("cv")), col("nm"), col("cn")).as("ccos")),
      keys = Seq(col("vec_id")),
      priority = Seq(col("ccos").desc, col("cid")))

  /** Rebuild the (cid, cv, cn) centroid frame [[ivfTopK]] and
    * [[kmeansAssign]] consume from [[kmeansRefine]]'s rows-form output
    * (one deterministic sort_array fold — collect_list order cannot
    * leak into the result).
    */
  def centroidFrame(rows: DataFrame): DataFrame = rows.groupBy("cid")
    .agg(sort_array(collect_list(struct(col("dim"), col("mean")))).as("sm"))
    .select(col("cid"),
      // GetArrayStructFields (codegen'd), not a transform lambda
      col("sm").getField("mean").as("cv"))
    .withColumn("cn", sqrt(dot(col("cv"), col("cv"))))

  /** Clustering quality report for a trained centroid set: per-cluster
    * member count and mean member-to-centroid cosine (the spherical
    * k-means inertia twin — higher is tighter). The per-member cosine
    * quantizes to 1/scale before an exact-BIGINT sum, so the mean is
    * exact-int ÷ exact-int: bit-stable at any parallelism, where a
    * float sum of cosines depends on partition order. One broadcast
    * assignment pass + one k-cell aggregate.
    */
  def kmeansInertia(corpus: DataFrame, cent: DataFrame,
                    scale: Long = 1000000L): DataFrame =
    kmeansAssign(corpus, cent)
      .select(col("cid"),
        floor(col("ccos") * scale + 0.5).cast("long").as("q"))
      .groupBy("cid")
      .agg(count(lit(1)).as("n"), sum("q").as("s"))
      .withColumn("mean_cos", col("s").cast("double") / (col("n") * scale))

  /** Simplified (centroid-based) silhouette per cluster: for each
    * vector, a = cosine distance to its OWN (max-cosine) centroid,
    * b = distance to the nearest OTHER centroid, sil = (b−a)/max(a,b)
    * — the standard clustering-separation readout computed against
    * centroids instead of all pairwise members (the only form that
    * scales: the classic silhouette is corpus² while this is one
    * broadcast scoring pass). Complements [[kmeansInertia]]: inertia
    * says clusters are TIGHT, silhouette says they are SEPARATED — a
    * near-zero mean flags clusters whose members sit on the boundary
    * to a neighbor (merge candidates / over-split k). Under argmax
    * assignment a ≤ b always, so sil = (c1−c2)/(1−c2) ∈ [0, 1].
    *
    * Determinism: per-vector sil quantizes to 1/scale before an
    * exact-BIGINT sum (bit-stable mean, same discipline as inertia);
    * the top-2 election ties break on cid. Degenerate guard: with one
    * centroid (no c2) or a duplicate-centroid c2 at distance 0, sil
    * is 0 by contract rather than null/∞.
    *
    * Scale posture: centroids broadcast (k·dim doubles), corpus
    * scanned once, top-2 is a WindowGroupLimit riding the broadcast
    * join; only k aggregate cells shuffle after map-side combine.
    */
  def silhouette(corpus: DataFrame, cent: DataFrame,
                 scale: Long = 1000000L): DataFrame = {
    val scored = corpus.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("cid"),
        cosinePre(dot(col("v"), col("cv")), col("nm"), col("cn")).as("ccos"))
    val top2 = Windows.findFirstK(scored, keys = Seq(col("vec_id")),
      priority = Seq(col("ccos").desc, col("cid")), k = 2, rankName = "rn")
    top2.groupBy("vec_id")
      .agg(max(when(col("rn") === 1, col("ccos"))).as("c1"),
        max(when(col("rn") === 1, col("cid"))).as("cid"),
        max(when(col("rn") === 2, col("ccos"))).as("c2"))
      .select(col("cid"),
        floor(when(col("c2").isNull || lit(1.0) - col("c2") === lit(0.0),
            lit(0.0))
          .otherwise((col("c1") - col("c2")) / (lit(1.0) - col("c2")))
          * scale + 0.5).cast("long").as("q"))
      .groupBy("cid")
      .agg(count(lit(1)).as("n"), sum("q").as("s"))
      .withColumn("mean_sil", col("s").cast("double") / (col("n") * scale))
  }

  /** Triplet mining for contrastive training: for each anchor, the
    * most-similar SAME-label vector (the positive) paired with the
    * most-similar DIFFERENT-label vector (the hardest negative), plus
    * the cosine margin between them — the (anchor, positive, negative)
    * rows a triplet/InfoNCE loss consumes, with margin ≤ 0 flagging
    * the anchors where the negative currently beats the positive (the
    * examples worth training on first).
    *
    * Scale posture: the anchor set broadcasts once and the corpus is
    * scanned ONCE for both elections (same-label and diff-label are
    * disjoint predicates over one broadcast join, split into two
    * WindowGroupLimit argmaxes); the final pair-up is a join of two
    * |anchors|-sized frames. Determinism: both elections tie-break on
    * vec_id; the margin is one IEEE subtraction of two already-pinned
    * cosines.
    *
    * Contract: an anchor appears in the output ONLY if the corpus
    * holds at least one same-label candidate AND at least one
    * different-label candidate (both elections are inner-joined into
    * the pair-up) — an anchor whose label is unique corpus-wide, or
    * one facing a single-label corpus, is omitted rather than emitted
    * with a null pos/neg. Rows out ≤ anchors in, by design: a triplet
    * loss cannot consume a one-sided pair.
    */
  def tripletMine(queries: DataFrame, corpus: DataFrame): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("v").as("qv"),
      col("nm").as("qn"), col("label").as("qlabel"))
    val scored = corpus
      .join(broadcast(q), col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"), col("label"), col("qlabel"),
        cosinePre(dot(col("qv"), col("v")), col("qn"), col("nm")).as("cos"))
    val pos = Windows.findFirst(
      scored.filter(col("label") === col("qlabel")),
      keys = Seq(col("qid")),
      priority = Seq(col("cos").desc, col("vec_id")))
      .select(col("qid"), col("vec_id").as("pos_id"), col("cos").as("pos_cos"))
    val neg = Windows.findFirst(
      scored.filter(col("label") =!= col("qlabel")),
      keys = Seq(col("qid")),
      priority = Seq(col("cos").desc, col("vec_id")))
      .select(col("qid"), col("vec_id").as("neg_id"), col("cos").as("neg_cos"))
    pos.join(neg, Seq("qid"))
      .select(col("qid"), col("pos_id"), col("neg_id"),
        col("pos_cos"), col("neg_cos"),
        (col("pos_cos") - col("neg_cos")).as("margin"))
  }

  /** SemDeDup-style semantic deduplication: assign every vector to its
    * nearest trained centroid, enumerate cosine pairs WITHIN each
    * cluster only, and drop every vector that has a near-duplicate
    * (cos ≥ threshold) with a lower id in its cluster — first-wins
    * survivors, the embedding-space analog of the text near-dup
    * pipeline (catches paraphrases and re-encodings that share no
    * n-grams).
    *
    * Scale posture: THE SemDeDup trick — the quadratic pair
    * enumeration is confined to cluster buckets (one equi-join on cid;
    * cost Σ|cluster|², controlled by k), never the corpus; the
    * centroid set broadcasts; the drop set is one distinct + one
    * anti-join. Determinism: assignment ties break on cid, the drop
    * rule compares ids, and the survivor set needs no float
    * accumulation at all.
    */
  // ------------------------------------------------- product quantization

  /** Subvector frame for product quantization: each vector split into
    * `m` contiguous `subDim`-wide subspaces → (vec_id, s, sv). Pure
    * per-row projection (one generate per row, never a shuffle).
    */
  def pqSubvectors(corpus: DataFrame, m: Int, subDim: Int): DataFrame =
    corpus.select(col("vec_id"), explode(array((0 until m).map(s =>
        struct(lit(s).as("s"),
          slice(col("v"), s * subDim + 1, subDim).as("sv"))): _*)).as("e"))
      .select(col("vec_id"), col("e.s").as("s"), col("e.sv").as("sv"))

  /** One PQ assignment pass: every subvector to its nearest subspace
    * centroid by the L2-equivalent inner-product rule
    * argmin ‖x−c‖² = argmax (x·c − ‖c‖²/2) — ties break on cid.
    * Centroids broadcast (m·k rows); the argmax is a WindowGroupLimit
    * per (vec_id, s); nothing corpus-sized shuffles.
    */
  def pqAssign(sub: DataFrame, cent: DataFrame): DataFrame =
    Windows.findFirst(
      sub.join(broadcast(cent), Seq("s"))
        .select(col("vec_id"), col("s"), col("cid"), col("sv"),
          (dot(col("sv"), col("cv")) - dot(col("cv"), col("cv")) / 2)
            .as("score")),
      keys = Seq(col("vec_id"), col("s")),
      priority = Seq(col("score").desc, col("cid")))
      .drop("score")

  /** PQ codebook training: seeded subspace centroids (vec_id % 100 = 0,
    * the k-means seeding convention) + one exact fixed-point Lloyd
    * update per subspace — component sums quantized to 1/scale and
    * aggregated as BIGINT (map-side-combinable, bit-stable at any
    * parallelism; same arithmetic as [[kmeansRefine]]), so the DuckDB
    * oracle replays the trajectory to the last ulp. Returns
    * (s, cid, cv) — m independent codebooks in one frame.
    *
    * Scale posture: the corpus is scanned once per Lloyd pass; only
    * m·k·subDim aggregate cells shuffle after map-side combine.
    */
  def pqTrain(corpus: DataFrame, m: Int, subDim: Int,
              seedPred: Column = col("vec_id") % 100 === 0,
              scale: Long = 10000L): DataFrame = {
    // seedPred selects the codebook seeds (default: the % 100 k-means
    // seeding convention). Callers with sparse or hashed vec_ids MUST
    // pass a predicate that actually selects rows — an empty seed set
    // yields an empty codebook and silently empty search results.
    val sub = pqSubvectors(corpus, m, subDim)
    val seeds = sub.filter(seedPred)
      .select(col("s"), col("vec_id").as("cid"), col("sv").as("cv"))
    pqAssign(sub, seeds)
      .select(col("s"), col("cid"), posexplode(col("sv")))
      .select(col("s"), col("cid"), col("pos").cast("long").as("dim"),
        floor(col("col").cast("double") * scale + 0.5).cast("long").as("q"))
      .groupBy("s", "cid", "dim")
      .agg(sum("q").as("sm"), count(lit(1)).as("n"))
      .groupBy("s", "cid")
      .agg(sort_array(collect_list(struct(col("dim"),
        (col("sm").cast("double") / (col("n") * scale)).as("mean"))))
        .as("smeans"))
      .select(col("s"), col("cid"),
        col("smeans").getField("mean").as("cv"))
  }

  /** PQ asymmetric-distance (ADC) top-k: FLOAT queries against the
    * code table. Per query, ONE lookup table of m·k quantized partial
    * dots (micro-units, exact BIGINT) joins the corpus codes on
    * (s, cid); each corpus vector's score is the exact integer sum of
    * its m table cells — shuffle-order-proof where a float Σ is not —
    * and the per-query top-k is a WindowGroupLimit.
    *
    * Scale posture: the corpus vectors are never read at query time —
    * only the m-cell code rows (the whole point of PQ: memory/IO drops
    * from dim floats to m bytes per vector); the LUT is
    * queries × m·k rows, broadcast.
    */
  def pqSearch(queries: DataFrame, cent: DataFrame, codes: DataFrame,
               m: Int, subDim: Int, k: Int): DataFrame = {
    val lut = queries.select(col("vec_id").as("qid"), col("v").as("qv"))
      .crossJoin(broadcast(cent))
      .select(col("qid"), col("s"), col("cid"),
        floor(dot(slice(col("qv"), col("s") * subDim + 1, lit(subDim)),
          col("cv")) * 1000000L + 0.5).cast("long").as("d"))
    val scored = codes
      .join(broadcast(lut), Seq("s", "cid"))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy("qid", "vec_id")
      .agg(sum("d").as("score"))
    Windows.findFirstK(scored,
      keys = Seq(col("qid")),
      priority = Seq(col("score").desc, col("vec_id")),
      k = k, rankName = "rnk")
      .select(col("qid"), col("vec_id"), col("rnk").cast("long").as("rnk"),
        col("score"))
  }

  /** IVF-PQ search — the standard FAISS IndexIVFPQ composition and the
    * shipped 100 TB ANN shape: IVF cluster pruning bounds WHICH vectors
    * are scored (probe the query's `nprobe` nearest Voronoi cells,
    * [[ivfTopK]]'s candidate rule), PQ asymmetric-distance lookup
    * bounds WHAT is read per candidate ([[pqSearch]]'s ADC — m code
    * cells, never the corpus vector). Recall composes multiplicatively:
    * cell pruning can drop a true neighbor assigned elsewhere (the
    * nprobe dial), ADC can misrank within the candidate set (the
    * m/subDim dial) — q_ivfpq_recall reads both against exact truth.
    *
    * Determinism: identical argmax/tiebreak rules as the components
    * (cell assignment ties on cell id, ADC scores are exact BIGINT
    * micro-unit sums, final ties on vec_id).
    *
    * Scale posture: one broadcast centroid pass assigns the corpus
    * (linear scan); the probe frame is queries×nprobe rows
    * (broadcast); the candidate join touches only probed cells' code
    * rows; the LUT is queries×m·k cells (broadcast). Nothing
    * corpus-sized shuffles, and corpus VECTORS are read only by the
    * one-off assignment pass — query-time IO is the m-byte codes.
    */
  def ivfPqTopK(corpus: DataFrame, centroids: DataFrame, queries: DataFrame,
                pqCent: DataFrame, codes: DataFrame,
                m: Int, subDim: Int, k: Int, nprobe: Int = 1): DataFrame = {
    val c = centroids.select(col("vec_id").as("icell"), col("v").as("cv"),
      col("nm").as("cn"))
    val assigned = Windows.findFirst(
      corpus.crossJoin(broadcast(c))
        .select(col("vec_id"), col("icell"),
          cosinePre(dot(col("v"), col("cv")), col("nm"), col("cn")).as("ccos")),
      keys = Seq(col("vec_id")),
      priority = Seq(col("ccos").desc, col("icell")))
      .select(col("vec_id"), col("icell"))
    val probes = Windows.findFirstK(
      queries.select(col("vec_id").as("qid"), col("v").as("qv"),
          col("nm").as("qn"))
        .crossJoin(broadcast(c))
        .select(col("qid"), col("icell"),
          cosinePre(dot(col("qv"), col("cv")), col("qn"), col("cn")).as("pcos")),
      keys = Seq(col("qid")),
      priority = Seq(col("pcos").desc, col("icell")),
      k = nprobe, rankName = "__pr")
      .select(col("qid"), col("icell"))
    val cand = assigned.join(broadcast(probes), Seq("icell"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"))
    val lut = queries.select(col("vec_id").as("qid"), col("v").as("qv"))
      .crossJoin(broadcast(pqCent))
      .select(col("qid"), col("s"), col("cid"),
        floor(dot(slice(col("qv"), col("s") * subDim + 1, lit(subDim)),
          col("cv")) * 1000000L + 0.5).cast("long").as("d"))
    val scored = cand.join(codes, Seq("vec_id"))
      .join(broadcast(lut), Seq("qid", "s", "cid"))
      .groupBy("qid", "vec_id")
      .agg(sum("d").as("score"))
    Windows.findFirstK(scored,
      keys = Seq(col("qid")),
      priority = Seq(col("score").desc, col("vec_id")),
      k = k, rankName = "rnk")
      .select(col("qid"), col("vec_id"), col("rnk").cast("long").as("rnk"),
        col("score"))
  }

  /** Embedding-based contamination screening: flag every corpus vector
    * whose nearest eval-set vector is at cosine >= threshold, reporting
    * that nearest offender — the semantic complement of exact n-gram
    * decontamination (paraphrased eval leakage survives token-level
    * screens; it does not survive an embedding screen). Inputs are
    * [[withNorm]] frames; corpus and eval rows sharing an id are not
    * compared (supports screening a corpus against an eval slice drawn
    * from itself in tests).
    *
    * Scale posture: eval sets are small by nature — the eval frame
    * broadcasts, the corpus streams through ONE scan, and the
    * per-corpus-vector argmax is a WindowGroupLimit (top-1 per id held
    * during the sort, never the full |corpus|x|eval| score table).
    * For very large eval suites, pre-bucket both sides with
    * [[signLshPairs]]'s hyperplanes and screen bucket-mates only.
    */
  def semanticScreen(corpus: DataFrame, evalSet: DataFrame,
                     threshold: Double,
                     excludeSameId: Boolean = false): DataFrame = {
    // excludeSameId supports screening a corpus against an eval slice
    // drawn from ITSELF (tests, self-audit). Leave it false for a
    // genuinely separate eval table: its vec_ids are unrelated to the
    // corpus ids, and excluding equal ids there would silently skip
    // real comparisons (both id spaces are commonly 0-based).
    val ev = evalSet.select(col("vec_id").as("eid"), col("v").as("ev"),
      col("nm").as("en"))
    val cond = if (excludeSameId) col("vec_id") =!= col("eid") else lit(true)
    val scored = corpus.join(broadcast(ev), cond)
      .select(col("vec_id"), col("eid"),
        cosinePre(dot(col("v"), col("ev")), col("nm"), col("en")).as("cos"))
    Windows.findFirst(scored, keys = Seq(col("vec_id")),
        priority = Seq(col("cos").desc, col("eid")))
      .filter(col("cos") >= threshold)
      .select(col("vec_id"), col("eid"), col("cos"))
  }

  def semanticDedup(corpus: DataFrame, cent: DataFrame,
                    threshold: Double): DataFrame = {
    // materialized once: the assignment (broadcast cross + group-limit
    // argmax) has THREE consumers below — both sides of the pair join
    // and the survivor anti-join — and would re-run per consumer.
    // localCheckpoint, not persist: checkpoint blocks are
    // per-invocation (a persist would be deduped by the CacheManager
    // across bench passes and understate the min; cf. q_pipeline_corpus)
    val asg = kmeansAssign(corpus, cent)
      .select(col("vec_id"), col("cid"), col("v"),
        norm(col("v")).as("nm"))
      .localCheckpoint()
    val a = asg.select(col("cid"), col("vec_id").as("va"),
      col("v").as("xa"), col("nm").as("na"))
    val b = asg.select(col("cid"), col("vec_id").as("vb"),
      col("v").as("xb"), col("nm").as("nb"))
    val dropped = a.join(b, Seq("cid"))
      .filter(col("va") < col("vb"))
      .filter(cosinePre(dot(col("xa"), col("xb")),
        col("na"), col("nb")) >= threshold)
      .select(col("vb").as("vec_id")).distinct()
    asg.join(dropped, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cid").cast("long").as("cid"))
  }

  /** Rank-weighted retrieval quality: NDCG@k of an approximate
    * ranking against an exact-truth ranking — the eval-harness row
    * recall@k can't provide (recall treats rank 1 and rank k the
    * same; NDCG pays log-discounted credit, so a system that finds
    * the right vectors in the wrong ORDER scores below one that
    * ranks them correctly). Graded relevance is positional:
    * truth rank r earns gain k+1−r, so ideal DCG is a closed-form
    * constant ([[ndcgIdealMicro]]).
    *
    * Inputs are the (qid, vec_id, rnk ∈ 1..k) frames
    * [[bruteForceTopK]] / [[ivfTopK]] emit. Determinism: per-position
    * discounts are integer MICRO-credits precomputed ONCE driver-side
    * ([[ndcgDiscountMicro]]) and generated verbatim into the oracle
    * CASE — gain·discount sums are exact BIGINT, so no float ever
    * crosses a shuffle; the final ratio is one double division
    * rounded to 4.
    *
    * Scale posture: both inputs are k·|queries| rows (the top-k
    * frames), so the join and the per-query aggregate are
    * queries-sized — the expensive part of an NDCG eval is always
    * producing the truth ranking, and that cost is the caller's
    * explicit choice of truth enumerator.
    */
  def ndcgAt(truth: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    val disc = ndcgDiscountMicro(k)
    val tr = truth.select(col("qid"), col("vec_id"),
      (lit(k + 1) - col("rnk")).cast("long").as("gain"))
    val ap = approx.select(col("qid"), col("vec_id"),
        col("rnk").cast("int").as("p"))
      // positions beyond k carry zero discount by DEFINITION of @k —
      // filter them rather than let element_at return null past the
      // k-element discount array and silently drop rows from the sum
      .filter(col("p") <= k)
    ap.join(tr, Seq("qid", "vec_id"), "left")
      .select(col("qid"),
        (coalesce(col("gain"), lit(0L)) *
          element_at(array(disc.map(lit(_)): _*), col("p"))).as("contrib"))
      .groupBy("qid")
      .agg(sum("contrib").as("dcg_micro"))
      .select(col("qid"), col("dcg_micro"),
        round(col("dcg_micro").cast("double") /
          lit(ndcgIdealMicro(k).toDouble), 4).as("ndcg"))
  }

  /** Mean-reciprocal-rank readout per query: where did the TRUE
    * nearest neighbor (truth rank 1) land in the approximate list —
    * truth_rank (0 = missed entirely) and rr = 1/rank in exact µ-units
    * (integer floor division; 1/3 is not a finite double). The
    * first-relevant-result metric that complements [[ndcgAt]]'s
    * graded-list view: an index can have decent NDCG while burying
    * the single best hit, and MRR is what catches it. Same eval-class
    * cost as NDCG (the truth side pays the exact enumeration); the
    * comparison itself is one |queries|-sized left join.
    */
  def mrrAt(truth: DataFrame, approx: DataFrame): DataFrame = {
    val t1 = truth.filter(col("rnk") === 1)
      .select(col("qid"), col("vec_id"))
    t1.join(approx.select(col("qid"), col("vec_id"),
        col("rnk").cast("long").as("p")),
        Seq("qid", "vec_id"), "left")
      .select(col("qid"),
        coalesce(col("p"), lit(0L)).as("truth_rank"),
        when(col("p").isNull, 0L)
          .otherwise(expr("CAST(1000000 DIV p AS BIGINT)")).as("rr_micro"))
  }

  /** Micro-units of the NDCG position discount 1/log2(p+1), p = 1..k —
    * ONE source of truth for the Spark literal array and the generated
    * oracle CASE (each engine evaluating its own log2 could diverge in
    * the last ulp at a rounding boundary; a shared integer table
    * cannot).
    */
  def ndcgDiscountMicro(k: Int): IndexedSeq[Long] =
    (1 to k).map(p =>
      math.round(1e6 / (math.log(p + 1.0) / math.log(2.0))))

  /** Ideal DCG in micro-units under positional gains k+1−p. */
  def ndcgIdealMicro(k: Int): Long =
    (1 to k).zip(ndcgDiscountMicro(k))
      .map { case (p, d) => (k + 1 - p).toLong * d }.sum

  /** Output width of [[signProject]] / the [[JlSigns]] matrix. */
  val JlOutDim = 8

  /** Deterministic ±1 Johnson–Lindenstrauss sign matrix
    * (JlOutDim × inDim), row k / column j from the md5 parity of
    * "jl_k_j" — reproducible on any engine with no RNG state to ship.
    * Shared source of truth for the Spark expression tree and the
    * generated oracle arithmetic.
    */
  def jlSigns(inDim: Int): IndexedSeq[IndexedSeq[Int]] =
    (0 until JlOutDim).map { k =>
      (0 until inDim).map { j =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"jl_${k}_$j".getBytes("UTF-8"))
        if ((h(0) & 1) == 0) 1 else -1
      }
    }

  /** Johnson–Lindenstrauss ±1 sign projection: reduce `inDim`-float
    * embeddings to [[JlOutDim]] dense double components, p_k = Σ_j
    * s_kj·x_j — the dimensionality-REDUCTION half of the sign-LSH
    * story ([[signLshPairs]] keeps only the SIGN bit of each
    * component to bucket; this keeps the value, preserving pairwise
    * distances to JL tolerance for downstream coarse clustering /
    * visualization / cheap pre-filters on compressed vectors).
    *
    * Determinism: strictly left-to-right accumulation in double on
    * both engines (the generated oracle spells the same ±-term chain
    * in the same order), so the sums are bit-identical and the
    * 4-decimal rounding cannot flip.
    *
    * Scale posture: a pure zero-shuffle projection — the sign matrix
    * folds into the expression tree (never a join), each output row
    * reads only its own vector, and downstream consumers shuffle
    * JlOutDim doubles instead of inDim floats.
    *
    * Contract: vectors must carry at least `inDim` components — a
    * shorter NON-EMPTY array fails loud under ANSI element_at (a
    * silent null/zero fill would corrupt distances); NULL and EMPTY
    * vectors are excluded, the [[withNorm]] row-drop rule (a
    * projection of nothing is not a point in the reduced space).
    */
  def signProject(emb: DataFrame, id: Column, vec: Column,
                  inDim: Int = 64): DataFrame = {
    val signs = jlSigns(inDim)
    // size == inDim, not just > 0: a ragged vector has no component
    // for every plane term (ANSI element_at throws past the length,
    // and the DuckDB twin would null the whole projection) — the
    // declared-dim corrupt-row drop, same rule as withNorm's dim
    val valid = emb.filter(vec.isNotNull && size(vec) === inDim)
    val outCols = (0 until JlOutDim).map { k =>
      val terms = (0 until inDim).map { j =>
        val e = element_at(vec, j + 1).cast("double")
        if (signs(k)(j) > 0) e else -e
      }
      // + 0.0 folds IEEE −0.0 to +0.0 (DuckDB's round preserves the
      // sign of a tiny negative, Spark's BigDecimal round drops it;
      // mirrored in the generated oracle)
      (round(terms.reduceLeft(_ + _), 4) + lit(0.0)).as(s"p$k")
    }
    valid.select(id.as("vec_id") +: outCols: _*)
  }

  /** Upper-triangular embedding covariance, one row per dimension pair
    * (i ≤ j, 0-based): the dim×dim second-moment statistics PCA /
    * whitening / feature-correlation audits start from. Components
    * quantize to 1/scale before exact-BIGINT moment sums (the
    * [[kmeansRefine]] arithmetic — a raw float sum depends on
    * partition merge order), then the one closed-form double division
    * per cell, rounded to 4.
    *
    * Scale posture: each vector explodes to its dim(dim+1)/2 products
    * (per-row compute, embarrassingly parallel), and the aggregate is
    * map-side combined — the shuffle carries ~dim²/2 cells PER TASK
    * regardless of corpus size, and the output is dim²-sized, never
    * corpus-sized. At 100 TB this is the textbook
    * giant-rows × tiny-state statistics pass.
    *
    * Contract: `dim` must equal the vector length — a LONGER vector
    * makes the tail slice length negative (ANSI error, fail-loud);
    * shorter/null vectors contribute only their present components.
    */
  def covarianceCells(emb: DataFrame, vec: Column, dim: Int = 64,
                      scale: Long = 1000L): DataFrame = {
    val vq = emb.select(
      VectorFunctions.quantize(vec, lit(scale.toDouble)).as("vq"))
    val ex = vq.select(col("vq"), posexplode(col("vq")))
      .toDF("vq", "i", "xi")
    val pr = ex
      .select(col("i"), col("xi"),
        posexplode(slice(col("vq"), col("i") + 1, lit(dim) - col("i"))))
      .toDF("i", "xi", "p2", "xj")
      .select(col("i").cast("long").as("i"),
        (col("i") + col("p2")).cast("long").as("j"),
        col("xi"), col("xj"))
    val m = pr.groupBy("i", "j").agg(
      count(lit(1)).as("n"),
      sum("xi").as("sx"), sum("xj").as("sy"),
      sum(col("xi") * col("xj")).as("sxy"))
    val nd = col("n").cast("double")
    // `+ 0.0` normalizes IEEE −0.0 → 0.0 (a tiny negative covariance
    // rounds to −0.0 in DuckDB while Spark's BigDecimal round yields
    // +0.0; the driver's hash is sign-sensitive) — applied on BOTH
    // engines so the arithmetic stays mirrored.
    m.select(col("i"), col("j"), col("n"),
      (round((col("sxy").cast("double") * nd -
          col("sx").cast("double") * col("sy").cast("double")) /
        (nd * nd * lit((scale * scale).toDouble)), 4) + lit(0.0))
        .as("cov"))
  }

  /** Per-dimension standardization (z-scoring) of an embedding corpus
    * — the feature-preprocessing step before distance-based anything
    * (a dimension with 10× the variance silently dominates every
    * cosine/L2 decision; whitening the diagonal is the cheap fix that
    * needs no matrix inversion). Components quantize to 1/scale, so
    * the per-dim moment sums are exact BIGINT (variance numerator
    * sqq·n − sq² is exactly ≥ 0 in integers — no negative-variance
    * float edge), and each z quantizes to µ-units; the mean/std/z
    * double shapes are mirrored verbatim by the oracle. Zero-variance
    * dimensions emit z = 0 by contract rather than NaN.
    *
    * Scale posture: one corpus scan into a dim-sized moment aggregate
    * (map-side combined), the 64-row stats table broadcast back over
    * the exploded components; nothing corpus-global.
    */
  def standardize(emb: DataFrame, id: Column, vec: Column,
                  scale: Long = 1000L): DataFrame = {
    val ex = emb.select(id.as("vec_id"),
        posexplode(VectorFunctions.quantize(vec, lit(scale.toDouble))))
      .toDF("vec_id", "dim", "q")
    val nd = col("n").cast("double")
    val stats = ex.groupBy("dim")
      .agg(count(lit(1)).as("n"), sum("q").as("sq"),
        sum(col("q") * col("q")).as("sqq"))
      .select(col("dim"),
        (col("sq").cast("double") / (nd * scale)).as("mu"),
        sqrt((col("sqq").cast("double") * nd -
            col("sq").cast("double") * col("sq").cast("double")) /
          (nd * nd * lit((scale * scale).toDouble))).as("sd"))
    ex.join(broadcast(stats), Seq("dim"))
      .select(col("vec_id"), col("dim").cast("long").as("dim"),
        when(col("sd") === 0.0, lit(0L))
          .otherwise(floor((col("q").cast("double") / scale - col("mu")) /
            col("sd") * 1e6 + 0.5).cast("long")).as("z_micro"))
  }

  /** Top principal component by power iteration over a
    * [[covarianceCells]] frame. The collect is dim²-sized STATISTICS
    * (never corpus data) — the same justified-driver-side class as the
    * z-order bounds fetch; the O(dim²·iters) matvec loop runs on the
    * driver in microseconds while the corpus-sized work stayed in the
    * one covariance pass. Returns (unit eigenvector, eigenvalue);
    * the eigenvalue is the variance captured along the component.
    * Deterministic: fixed start 1/√dim and a fixed iteration count
    * (covariance is PSD, so power iteration converges to the top
    * eigenpair; sign follows the start vector).
    */
  def principalComponent(cov: DataFrame, dim: Int,
                         iters: Int = 30): (Array[Double], Double) = {
    val m = Array.ofDim[Double](dim, dim)
    cov.select(col("i"), col("j"), col("cov")).collect().foreach { r =>
      val i = r.getLong(0).toInt; val j = r.getLong(1).toInt
      val c = r.getDouble(2)
      m(i)(j) = c; m(j)(i) = c
    }
    var v = Array.fill(dim)(1.0 / math.sqrt(dim))
    var lambda = 0.0
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dim)(i =>
        (0 until dim).foldLeft(0.0)((a, j) => a + m(i)(j) * v(j)))
      val n = math.sqrt(w.foldLeft(0.0)((a, x) => a + x * x))
      if (n > 0) { v = w.map(_ / n); lambda = n }
    }
    (v, lambda)
  }

  /** Per-vector score along a fixed component (e.g.
    * [[principalComponent]]'s): one zero-shuffle projection — the
    * component folds into the plan as a literal array, never a join.
    */
  def componentScores(emb: DataFrame, id: Column, vec: Column,
                      component: Array[Double]): DataFrame =
    emb.select(id.as("vec_id"),
      // graft_dot casts elements to double internally — the explicit
      // cast-transform lambda it replaces was an interpreted no-op
      round(dot(vec, typedLit(component.toSeq)), 4).as("score"))

  /** Maximal-marginal-relevance selection (Carbonell–Goldstein MMR):
    * from each query's top-`c` cosine candidates, greedily pick `k`
    * items maximizing λ·rel(cand) − (1−λ)·max_{s∈picked} sim(cand, s)
    * — the diversity re-rank retrieval and training-data selection
    * run on top of ANN so near-duplicate hits don't crowd out
    * coverage (pick 1 is pure relevance; later picks trade relevance
    * against similarity to what is already chosen). Returns
    * (qid, pick ∈ 1..k, vec_id, score), score = the criterion that
    * won the pick (pick 1's is raw relevance).
    *
    * Determinism: relevance and pairwise sims are the engine-portable
    * cosine; each pick's criterion is λ·rel − (1−λ)·red evaluated in
    * that order on both engines over identical doubles, argmax ties
    * break on vec_id, and the emitted score folds −0.0 → +0.0.
    *
    * Scale posture: the expensive part is the candidate generation
    * the caller chooses (brute force here; IVF at scale). Everything
    * after runs on c·|queries| rows: the candidate frame and its c²
    * pairwise sims materialize ONCE (lazy per-invocation
    * localCheckpoint — the k−1 greedy steps each reread them), and
    * each step is a selected-sized join + WindowGroupLimit argmax.
    * The k-step loop is inherently sequential (that IS the MMR
    * semantics), but every step's cost is candidate-sized, never
    * corpus-sized.
    */
  def mmrSelect(queries: DataFrame, corpus: DataFrame, c: Int, k: Int,
                lambda: Double = 0.5): DataFrame = {
    require(k >= 1 && c >= k, s"need c >= k >= 1: c=$c k=$k")
    val cands = bruteForceTopK(queries, corpus, c)
      .select(col("qid"), col("vec_id"), col("cos").as("rel"))
    val cv = corpus.select(col("vec_id"), col("v"), col("nm"))
    val cd = cands.join(cv, "vec_id")
      .select(col("qid"), col("vec_id"), col("rel"), col("v"), col("nm"))
      .localCheckpoint(false)
    val a = cd.select(col("qid"), col("vec_id").as("a"),
      col("v").as("va"), col("nm").as("na"))
    val b = cd.select(col("qid"), col("vec_id").as("b"),
      col("v").as("vb"), col("nm").as("nb"))
    val sims = a.join(b, Seq("qid")).filter(col("a") =!= col("b"))
      .select(col("qid"), col("a"), col("b"),
        cosinePre(dot(col("va"), col("vb")), col("na"), col("nb"))
          .as("sim"))
      .localCheckpoint(false)
    val base = cd.select("qid", "vec_id", "rel")
    var picks = Windows.findFirst(base, keys = Seq(col("qid")),
        priority = Seq(col("rel").desc, col("vec_id")))
      .select(col("qid"), col("vec_id"), lit(1L).as("pick"),
        col("rel").as("score"))
    var selected = picks.select("qid", "vec_id")
    for (step <- 2 to k) {
      val red = sims
        .join(selected.withColumnRenamed("vec_id", "b"), Seq("qid", "b"))
        .groupBy("qid", "a").agg(max("sim").as("red"))
        .withColumnRenamed("a", "vec_id")
      val scored = base
        .join(selected, Seq("qid", "vec_id"), "left_anti")
        .join(red, Seq("qid", "vec_id"))
        .select(col("qid"), col("vec_id"),
          (lit(lambda) * col("rel") - lit(1 - lambda) * col("red"))
            .as("score"))
      // checkpoint each pick (a |queries|-row frame): step t's plan
      // references step t−1 TWICE (redundancy join + anti-join), so an
      // un-materialized chain re-embeds every earlier window 2^k times
      // in the final plan — measured 2.8 s vs ~1 s at sf0.1
      val next = Windows.findFirst(scored, keys = Seq(col("qid")),
          priority = Seq(col("score").desc, col("vec_id")))
        .select(col("qid"), col("vec_id"), lit(step.toLong).as("pick"),
          col("score"))
        .localCheckpoint(false)
      picks = picks.unionAll(next)
      selected = selected.unionAll(next.select("qid", "vec_id"))
    }
    picks.select(col("qid"), col("pick"), col("vec_id"),
      (round(col("score"), 4) + lit(0.0)).as("score"))
  }

  /** Margin-criterion bitext mining (Artetxe & Schwenk, ACL 2019 —
    * the LASER mining rule): for source-side vector x and target-side
    * vector y,
    *
    *   margin(x, y) = cos(x, y) / ((fwd_k(x) + bwd_k(y)) / 2)
    *
    * where fwd_k/bwd_k are the mean cosine of each vector's k nearest
    * neighbors on the OTHER side. Each x keeps its best-margin y when
    * the ratio clears `threshold` — absolute-cosine mining misfires on
    * hubness (some vectors are near everything); the margin normalizes
    * by local neighborhood density on both sides.
    *
    * Determinism contract: the pair cosine is quantized ONCE to exact
    * µ-units (round(cos·1e6) as BIGINT); both k-NN sums are then exact
    * integer sums and the margin is a single IEEE divide of exact
    * integers — bit-identical across engines, no float-accumulation
    * order anywhere. Ranking ties break on the id.
    *
    * 100 TB posture: the scored frame is |X|·|Y| here (the exact
    * baseline, X broadcast); at corpus scale the same margin math runs
    * unchanged over an ANN candidate list per x (ivfTopK / signLshPairs
    * generate candidates; fwd/bwd sums then use each side's retrieved
    * top-k, the standard large-scale margin approximation). Two window
    * passes per side are shuffle-partitioned on xid/yid — no driver
    * state.
    *
    * @param x source side, [[withNorm]]-shaped (vec_id, v, nm)
    * @param y target side, [[withNorm]]-shaped
    */
  /** Display rounding for exact µ-unit cosines: HALF-AWAY-FROM-ZERO
    * to 4 decimals computed in INTEGER arithmetic, then one IEEE
    * divide by 1e4. `round(qcos / 1e6, 4)` is NOT cross-engine safe:
    * a µ-value ending in …50 (1-in-100 rows) puts the quotient's
    * decimal tie at the 5th place, and Spark's Round (HALF_UP on the
    * double's SHORTEST decimal repr — "0.28755" → 0.2876) disagrees
    * with binary-value rounders (DuckDB: 0.2875499999… → 0.2875) on
    * every such tie — caught by the sf0.1 gate on q_bitext_margin_ivf.
    * The floor-of-double step is exact at these magnitudes (|µ| ≤ 1e6,
    * integer quotients representable far below 2^53); the negate runs
    * on LONG so a −0.0 can never leak into the display column.
    */
  private def muCos4(qcos: Column): Column = {
    val mag = floor((abs(qcos) + lit(50L)) / lit(100.0)).cast("long")
    when(qcos >= 0, mag).otherwise(-mag).cast("double") / lit(1e4)
  }

  def marginMine(x: DataFrame, y: DataFrame, k: Int,
                 threshold: Double): DataFrame = {
    val q = x.select(col("vec_id").as("xid"), col("v").as("xv"),
      col("nm").as("xn"))
    val c = y.select(col("vec_id").as("yid"), col("v").as("yv"),
      col("nm").as("yn"))
    // spread the target side BEFORE the |X|·|Y| fan-out at a PINNED
    // partition count (the knnMeanCos rule): one parquet split — or an
    // AQE coalesce of the byte-tiny pre-multiply exchange — would
    // score every pair on one task; the exchange moves |Y| pre-multiply
    // rows only
    val scored = c
      .repartition(c.sparkSession.sessionState.conf.numShufflePartitions,
        col("yid"))
      .join(broadcast(q))
      .select(col("xid"), col("yid"),
        round(cosinePre(dot(col("xv"), col("yv")), col("xn"), col("yn"))
          * lit(1e6)).cast("long").as("qcos"))
    // Both k-NN sums are FUSED into their ranking pass as a second
    // window over the same partitioning (rank, then an unordered
    // partition-wide sum of the rank-gated value) — an aggregate+join
    // formulation re-shuffles the |X|·|Y| scored frame once per side
    // and then twice more through the joins (measured: 2 SortMergeJoins
    // + 6 exchanges). Window ORDER exploits preserved partitioning:
    // the scored frame leaves the fan-out join partitioned by yid (the
    // streamed side), so the yid windows run exchange-free; the xid
    // windows then cost ONE exchange, and the final per-xid argmax
    // rides that same partitioning — one big-frame exchange end-to-end.
    import org.apache.spark.sql.expressions.Window
    val wx = Window.partitionBy(col("xid"))
      .orderBy(col("qcos").desc, col("yid"))
    val wy = Window.partitionBy(col("yid"))
      .orderBy(col("qcos").desc, col("xid"))
    val margined = scored
      .withColumn("rny", row_number().over(wy))
      .withColumn("bs", sum(when(col("rny") <= k, col("qcos")))
        .over(Window.partitionBy(col("yid"))))
      .withColumn("rnx", row_number().over(wx))
      .withColumn("fs", sum(when(col("rnx") <= k, col("qcos")))
        .over(Window.partitionBy(col("xid"))))
      .select(col("xid"), col("yid"), col("qcos"),
        (lit(2.0 * k) * col("qcos") / (col("fs") + col("bs")))
          .as("margin"))
    Windows.findFirst(margined, keys = Seq(col("xid")),
        priority = Seq(col("margin").desc, col("yid")))
      .filter(col("margin") >= threshold)
      .select(col("xid"), col("yid"),
        round(col("margin"), 4).as("margin"),
        muCos4(col("qcos")).as("cos"))
  }

  /** [[marginMine]]'s 100 TB shape, made concrete: margin-criterion
    * bitext mining over IVF CANDIDATE LISTS instead of the |X|·|Y|
    * cross product — the standard large-scale approximation (mine from
    * each side's retrieved top candidates; the k-NN normalization sums
    * run over the same retrieved lists). Two cluster-pruned passes:
    * forward (each x probes its top-`nprobe` Voronoi cells of the
    * Y-side assignment and keeps its `cand` best targets) and backward
    * (symmetric, y against the X side); the margin denominator takes
    * fwd_k from the forward lists and bwd_k from the backward lists,
    * and each x keeps its best-margin forward candidate above
    * `threshold`.
    *
    * Scale posture mirrors [[ivfTopK]]: corpus-side assignment is one
    * broadcast-centroid pass per side; every candidate join is a
    * cid-bucket equi-join, so cost follows probed cells, never |X|·|Y|.
    * The backward pass probes with the corpus-sized Y side, so its
    * probe frame is NEVER broadcast (the `broadcastQueries = false`
    * posture — shuffle-hash on cid); the forward probe frame is
    * query-batch sized and broadcasts. Determinism: candidate cosines
    * µ-quantized once (the [[marginMine]] contract); both k-NN sums are
    * exact BIGINT; assignment/probe argmax ties break on cid, candidate
    * ties on the target id.
    *
    * With nprobe = |centroids| and cand ≥ |Y| (and ≥ |X| backward) the
    * candidate lists are exhaustive and this equals [[marginMine]]
    * exactly — property-pinned in SimilaritySpec.
    *
    * @param x source side, [[withNorm]]-shaped (vec_id, v, nm)
    * @param y target side, [[withNorm]]-shaped
    * @param centroids [[withNorm]]-shaped centroid table (shared by
    *                  both directions)
    * @param k    neighbors in each margin-normalization sum
    * @param cand retrieved candidates per query (≥ k)
    */
  def marginMineIvf(x: DataFrame, y: DataFrame, centroids: DataFrame,
                    k: Int, cand: Int, nprobe: Int,
                    threshold: Double): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(cand >= k, s"cand ($cand) must be >= k ($k)")
    // nprobe = 0 would silently mine ZERO pairs — indistinguishable
    // from "nothing cleared the threshold" (the error-loudly posture)
    require(nprobe >= 1, s"nprobe must be >= 1: $nprobe")
    val cent = centroids.select(col("vec_id").as("cid"),
      col("v").as("cv"), col("nm").as("cn"))
    // ONE broadcast-centroid ranking pass per side serves BOTH
    // consumers — the rank-1 row IS the cell assignment (corpus role)
    // and rank <= nprobe are the probed cells (query role). Each side
    // plays both roles (forward mines x against Y cells, backward y
    // against X cells), so without the shared pass the dominant
    // |side|·|centroids| sweep would run TWICE per side; the lazy
    // checkpoint materializes it once for its two consumers (the
    // SCALE.md multi-consumer rule — Spark does not CSE across
    // DataFrame reuse).
    def ranked(side: DataFrame): DataFrame =
      Windows.findFirstK(
        side.crossJoin(broadcast(cent))
          .select(col("vec_id"), col("v"), col("nm"), col("cid"),
            cosinePre(dot(col("v"), col("cv")), col("nm"), col("cn"))
              .as("ccos")),
        keys = Seq(col("vec_id")),
        priority = Seq(col("ccos").desc, col("cid")),
        k = math.max(nprobe, 1), rankName = "pr")
        .select("vec_id", "v", "nm", "cid", "pr")
        .localCheckpoint(false)
    val rx = ranked(x)
    val ry = ranked(y)
    // ranked candidate list: queries meet their probed cells' corpus
    // vectors on the cid bucket; qcos µ-quantized at birth
    def cands(queries: DataFrame, corpus: DataFrame,
              broadcastProbes: Boolean): DataFrame = {
      val p = queries.filter(col("pr") <= nprobe)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("nm").as("qn"), col("cid"))
      val probeSide = if (broadcastProbes) broadcast(p)
        else p.hint("shuffle_hash")
      Windows.findFirstK(
        corpus.filter(col("pr") === 1)
          .select("vec_id", "v", "nm", "cid")
          .join(probeSide, Seq("cid"))
          .select(col("qid"), col("vec_id"),
            round(cosinePre(dot(col("qv"), col("v")), col("qn"),
              col("nm")) * lit(1e6)).cast("long").as("qcos")),
        keys = Seq(col("qid")),
        priority = Seq(col("qcos").desc, col("vec_id")),
        k = cand, rankName = "rnk")
    }
    // fwd_k is FUSED into the forward list as a second window over the
    // same qid partitioning (the marginMine rule): findFirstK leaves
    // the candidate frame partitioned by qid, so the rank-gated sum is
    // exchange-free — an aggregate+join formulation re-embeds the
    // whole forward pipeline (probe join + ranking window) a second
    // time in the final plan AND pays a groupBy/join round trip
    // (measured ~8.2 s cold → ~3 s at sf0.1)
    import org.apache.spark.sql.expressions.Window
    val fwd = cands(rx, ry, broadcastProbes = true)
      .withColumn("fs", sum(when(col("rnk") <= k, col("qcos")))
        .over(Window.partitionBy(col("qid"))))
      .select(col("qid").as("xid"), col("vec_id").as("yid"),
        col("qcos"), col("fs"))
    val bs = cands(ry, rx, broadcastProbes = false)
      .groupBy(col("qid").as("yid"))
      .agg(sum(when(col("rnk") <= k, col("qcos"))).as("bs"))
    val margined = fwd.join(bs, "yid")
      .select(col("xid"), col("yid"), col("qcos"),
        (lit(2.0 * k) * col("qcos") / (col("fs") + col("bs")))
          .as("margin"))
    Windows.findFirst(margined, keys = Seq(col("xid")),
        priority = Seq(col("margin").desc, col("yid")))
      .filter(col("margin") >= threshold)
      .select(col("xid"), col("yid"),
        round(col("margin"), 4).as("margin"),
        muCos4(col("qcos")).as("cos"))
  }

  /** k-NN majority-vote classification over an embedding space — label
    * propagation from a labeled corpus to unlabeled queries (the
    * standard weak-labeling pass of a training-data pipeline: propagate
    * curated domain/topic/quality labels to new documents by embedding
    * neighborhood). Neighbors by cosine (ties → corpus id), prediction
    * by vote count (ties → smaller label). Everything after the
    * neighbor cut is integer arithmetic — deterministic by
    * construction.
    *
    * 100 TB posture: queries broadcast against a corpus scanned once
    * (the [[bruteForceTopK]] shape — WindowGroupLimit stops each group
    * at rank k); at corpus scale swap the scored join for ivfTopK
    * candidates, the vote math is unchanged.
    *
    * @param queries [[withNorm]]-shaped (vec_id, v, nm)
    * @param corpus  [[withNorm]]-shaped plus a `label` column
    *                (withNorm(keep = Seq(col("label"))))
    */
  def knnClassify(queries: DataFrame, corpus: DataFrame,
                  k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("v").as("qv"),
      col("nm").as("qn"))
    val scored = corpus
      // an unlabeled corpus row cannot vote — and a NULL label group
      // surviving to the tie-break would DIVERGE cross-engine (Spark
      // orders NULLS FIRST ascending, DuckDB NULLS LAST), so the
      // abstention is a correctness contract, not just semantics
      .filter(col("label").isNotNull)
      .join(broadcast(q), col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"), col("label"),
        cosinePre(dot(col("qv"), col("v")), col("qn"), col("nm"))
          .as("cos"))
    val nn = Windows.findFirstK(scored, keys = Seq(col("qid")),
      priority = Seq(col("cos").desc, col("vec_id")), k = k,
      rankName = "rnk")
    val votes = nn.groupBy("qid", "label")
      .agg(count(lit(1)).as("votes"))
    Windows.findFirst(votes, keys = Seq(col("qid")),
        priority = Seq(col("votes").desc, col("label")))
      .select(col("qid"), col("label").cast("long").as("pred_label"),
        col("votes"))
  }

  /** Per-vector k-NN mean cosine — the embedding-space isolation score.
    * A vector whose k nearest neighbors are all far away is a semantic
    * outlier (mis-encoded row, off-distribution document, junk page);
    * ranking ascending surfaces the cleaning candidates. The dual of
    * near-dup mining: dedup keys on the TOP of the similarity range,
    * this keys on the BOTTOM.
    *
    * Determinism: per-pair cosine quantized to exact µ-units before the
    * top-k sum (integer-exact, no accumulation-order drift); the
    * returned mean is one IEEE divide of exact integers.
    *
    * Returns (vec_id, sc BIGINT µ-sum, cnt, knn_cos) — callers rank on
    * the exact `sc`, display `knn_cos`.
    *
    * 100 TB posture: self-scored via broadcast of the query side per
    * batch (corpus scanned once per batch); at scale the candidate join
    * is ivfTopK/LSH-bucketed, the µ-sum unchanged.
    */
  def knnMeanCos(n: DataFrame, k: Int): DataFrame = {
    val c = n.select(col("vec_id").as("cid"), col("v").as("cv"),
      col("nm").as("cn"))
    // Each unordered pair is scored ONCE (qid < cid halves the n²
    // dot-product fan-out — the expensive stage at 2 µs/pair of row
    // plumbing) and both orientations are emitted by a 2-element
    // explode in the same codegen'd pass. The mirror is EXACT: the dot
    // sums x_i·y_i index-by-index and the norm product commutes, so
    // qcos(a,b) and qcos(b,a) are the same double bit-for-bit. The
    // streamed side is SPREAD before the fan-out with a PINNED
    // partition count (REPARTITION_BY_NUM): the pre-multiply frame is
    // tiny by bytes, so both a single parquet split AND an AQE
    // partition-coalesce would land every pair of the ×|n| blowup on
    // ONE task — AQE sizes the stage by the exchange's bytes and
    // cannot see the multiply (measured 4.7 s coalesced vs 0.95 s
    // spread for the same window). The exchange moves |n| pre-multiply
    // rows, not |n|².
    val scored = n
      .repartition(n.sparkSession.sessionState.conf.numShufflePartitions,
        col("vec_id"))
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("nm").as("qn"))
      .join(broadcast(c), col("qid") < col("cid"))
      .select(col("qid").as("a"), col("cid").as("b"),
        round(cosinePre(dot(col("qv"), col("cv")), col("qn"), col("cn"))
          * lit(1e6)).cast("long").as("qcos"))
      .select(explode(array(
        struct(col("a").as("qid"), col("b").as("vec_id"), col("qcos")),
        struct(col("b").as("qid"), col("a").as("vec_id"), col("qcos"))))
        .as("e"))
      .select(col("e.qid").as("qid"), col("e.vec_id").as("vec_id"),
        col("e.qcos").as("qcos"))
    Windows.findFirstK(scored, keys = Seq(col("qid")),
        priority = Seq(col("qcos").desc, col("vec_id")), k = k,
        rankName = "rnk")
      .groupBy("qid").agg(sum("qcos").as("sc"), count(lit(1)).as("cnt"))
      .select(col("qid").as("vec_id"), col("sc"), col("cnt"),
        round(col("sc").cast("double") / (col("cnt") * lit(1e6)), 4)
          .as("knn_cos"))
  }
}
