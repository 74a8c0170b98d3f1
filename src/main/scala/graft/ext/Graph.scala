package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph analytics over candidate-pair edge lists ([EXT]): the
  * importance/centrality side of the dup-graph toolkit (structure
  * census lives in [[Dedup.triangleStats]], components in
  * [[Dedup.connectedComponents]]).
  */
object Graph {

  /** Deterministic FIXED-POINT PageRank over an undirected edge list,
    * unrolled for `iters` power iterations.
    *
    * Every value is an exact BIGINT in units of 1/`scale` (default
    * 1e-8): pr₀ = scale÷n, each neighbor contribution is pr÷deg
    * (floor), and the update is
    * `pr' = (15·(scale÷n))÷100 + (85·Σ contrib)÷100` — all floor
    * divisions. The point of the fixed-point form: a floating-point
    * PageRank sums doubles in shuffle order, so re-running on a
    * different partition count changes low-order bits and breaks
    * reproducible pipelines (and any hash-compared oracle); integer
    * sums are associative, so this is bit-stable at any parallelism,
    * at the cost of ≤ n·iters units of floor-lost mass (≈ 2e-6 of
    * total at the defaults — far below any ranking decision).
    *
    * Scale posture: exactly the classic distributed PR shape — per
    * iteration ONE equi-join of the edge list with the (node, contrib)
    * table and ONE hash aggregate on the destination, both partitioned
    * by node key; degrees and n are computed once up front and n rides
    * along as a broadcast scalar. The symmetrized edge list is
    * PERSISTED and every iteration is `localCheckpoint`ed (the
    * [[Dedup.connectedComponents]] pattern, incl. unpersist-in-finally
    * and scoped AQE-off): without the persist, all `iters` join
    * subtrees of one unrolled Catalyst plan re-scan the edge SOURCE
    * once per iteration — invisible at sf0.1, dominant at 100x — and
    * without the checkpoint, iteration N's plan replays 1..N-1.
    * GraphSpec's accumulator-instrumented scan-count audit pins the
    * source-read count to the cache fill alone. Contract: `edges` is
    * one row per undirected edge (src < dst convention fine); isolated
    * vertices are not ranked (every node in the edge list has deg ≥ 1,
    * so there is no dangling mass to redistribute). Same fault-
    * tolerance trade as connectedComponents: executor-block state,
    * re-run from source on loss.
    */
  def pagerankFixedPoint(edges: DataFrame, src: Column, dst: Column,
                         iters: Int, scale: Long = 100000000L): DataFrame = {
    require(iters >= 1 && iters <= 8, s"iters out of [1,8]: $iters")
    val spark = edges.sparkSession
    val sym = edges.select(src.as("u"), dst.as("v"))
      .union(edges.select(dst.as("u"), src.as("v")))
      .persist()
    // fill the cache BEFORE toggling AQE off (the caller's edge plan
    // may rely on AQE runtime exchange reuse, cf. connectedComponents)
    sym.count()
    val aqeKey = "spark.sql.adaptive.enabled"
    val prevAqe = spark.conf.get(aqeKey, "true")
    spark.conf.set(aqeKey, "false")
    try {
      val deg = sym.groupBy("u").agg(count(lit(1)).as("deg"))
      val n1 = deg.agg(count(lit(1)).as("n"))
      // base = scale ÷ n, the uniform start mass (and the teleport basis)
      var pr = deg.crossJoin(broadcast(n1))
        .select(col("u"), col("deg"),
          floor(lit(scale) / col("n")).cast("long").as("base"))
        .withColumn("pr", col("base"))
        .localCheckpoint()
      (1 to iters).foreach { _ => pr = prStep(sym, pr).localCheckpoint() }
      pr.select(col("u").as("node"), col("pr"))
    } finally {
      spark.conf.set(aqeKey, prevAqe)
      // unpersist on every exit path (idempotent): the returned frame
      // is checkpointed, so it no longer reads the cached edges
      sym.unpersist()
    }
  }

  /** One fixed-point power iteration: contributions out over degrees,
    * summed in on the destination, damped against the teleport base.
    * Package-visible so PlanAuditSpec can pin the per-iteration shape
    * (equi-joins + one hash aggregate, no cartesian) — the post-
    * checkpoint plan of [[pagerankFixedPoint]]'s result is an opaque
    * scan and cannot be audited.
    */
  private[graft] def prStep(sym: DataFrame, pr: DataFrame): DataFrame = {
    val contrib = pr.select(col("u").as("cu"),
      floor(col("pr") / col("deg")).cast("long").as("c"))
    // rename the aggregate key: both join inputs descend from `pr`
    // (contrib does), so resolving by parent-frame column would be
    // ambiguous — distinct names keep every reference unique
    val inbound = sym.join(contrib, col("u") === col("cu"))
      .groupBy("v").agg(sum("c").as("s"))
      .withColumnRenamed("v", "iv")
    pr.drop("pr")
      .join(inbound, col("u") === col("iv"), "left")
      .select(col("u"), col("deg"), col("base"),
        (floor(lit(15L) * col("base") / 100) +
          floor(lit(85L) * coalesce(col("s"), lit(0L)) / 100))
          .cast("long").as("pr"))
  }

  /** Per-node local clustering coefficient over a canonically-oriented
    * edge list (src < dst): cc(v) = triangles(v) / C(deg(v), 2) — how
    * close each node's neighborhood is to a clique. On a dedup
    * candidate graph this separates genuine duplicate clusters
    * (cc ≈ 1: every member similar to every other) from hub-like hash
    * noise (high degree, low cc) — the per-node refinement of
    * [[Dedup.triangleStats]]'s corpus census.
    *
    * Scale posture: the same two-equi-join oriented triangle
    * enumeration as triangleStats (each triangle found once, O(m^1.5)
    * worst case), then one explode(3 roles) + hash agg for per-node
    * counts and a node-keyed left join onto degrees. Exact integer
    * counts; cc is one IEEE division rounded to 4 — bit-stable.
    */
  def clusteringCoefficients(edges: DataFrame, src: Column,
                             dst: Column): DataFrame = {
    val e = edges.select(src.as("u"), dst.as("v"))
    val deg = e.select(col("u").as("node"))
      .union(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val tris = e.select(col("u").as("a"), col("v").as("b"))
      .join(e.select(col("u").as("b"), col("v").as("c")), Seq("b"))
      .join(e.select(col("u").as("a"), col("v").as("c")), Seq("a", "c"))
    val triPerNode = tris
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("tri"))
    val tri = coalesce(col("tri"), lit(0L))
    deg.join(triPerNode, Seq("node"), "left")
      .select(col("node"), col("deg"), tri.as("tri"),
        when(col("deg") >= 2,
          round(tri.cast("double") * 2 / (col("deg") * (col("deg") - 1)), 4))
          .otherwise(lit(0.0)).as("cc"))
  }
}
