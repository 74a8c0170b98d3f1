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
    * by node key. The DIRECTED edge list and the degree table are
    * PERSISTED, and ONE action (`deg.count()`, which doubles as the
    * driver-side node count — n is a scalar, it never needs the r10
    * crossJoin-broadcast job chain) fills both caches, evaluating the
    * (possibly expensive) caller edge plan exactly once; persisting
    * the symmetrized union instead would evaluate the source once per
    * union branch (the r10 shape — it doubled the fuzzy-pair cost of
    * q_pagerank's fill). Without any persist, all `iters` join
    * subtrees of one unrolled Catalyst plan re-scan the edge SOURCE
    * once per iteration — invisible at sf0.1, dominant at 100x.
    * Lineage is truncated with `localCheckpoint` every SECOND
    * iteration (and at the end, which also makes the returned frame
    * independent of the caches so `finally` can unpersist them): `pr`
    * feeds two places in the next step (contributions + carry-over),
    * so unchecked lineage doubles per iteration, but across a
    * 2-iteration gap the duplicated subtree is identical and exchange
    * reuse dedupes its shuffles — bounded plan, half the eager
    * checkpoint jobs (and none of the per-checkpoint AQE-off job
    * shaping) that made r10's per-iteration form ~2.3x slower than r9
    * at sf0.1.
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
    val e = edges.select(src.as("u"), dst.as("v")).persist()
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val deg = sym.groupBy("u").agg(count(lit(1)).as("deg")).persist()
    try {
      // node count is a SCALAR, so take it driver-side from the ONE
      // action that fills BOTH caches (evaluating deg computes through
      // the persist-marked e, so the possibly-expensive caller edge
      // plan runs exactly once) — this count() replaces the r10
      // crossJoin(broadcast(n1)) whose collect-and-broadcast job chain
      // was pure overhead inside every downstream action, and the
      // separate edge-fill count() the r10 shape also paid
      val n = deg.count()
      // empty edge frame: no nodes to rank. Guard BEFORE building the
      // lit(scale / n) literal (division by zero is driver-side here);
      // eager checkpoint so the empty result outlives the unpersist
      if (n == 0L) return deg
        .select(col("u").as("node"), lit(0L).as("pr"))
        .localCheckpoint()
      // Iterations + checkpoints run with AQE scoped OFF (restored in
      // finally), the connectedComponents discipline: with AQE on,
      // every localCheckpoint materialization splinters into one job
      // PER STAGE (join + agg + join per iteration pair), and at toy
      // scale that per-job scheduling overhead IS the query's residual
      // cost. The caches are already filled (the count() above ran
      // under the caller's AQE), so nothing here needs runtime
      // re-planning: inputs are cached frames with known sizes.
      val aqeKey = "spark.sql.adaptive.enabled"
      val prevAqe = spark.conf.get(aqeKey, "true")
      spark.conf.set(aqeKey, "false")
      try {
        // base = scale ÷ n, the uniform start mass (and teleport basis)
        var pr = deg.select(col("u"), col("deg"),
          lit(scale / n).as("base"), lit(scale / n).as("pr"))
        (1 to iters).foreach { i =>
          pr = prStep(sym, pr)
          if (i % 2 == 0 || i == iters) pr = pr.localCheckpoint()
        }
        pr.select(col("u").as("node"), col("pr"))
      } finally spark.conf.set(aqeKey, prevAqe)
    } finally {
      // unpersist on every exit path (idempotent): the returned frame
      // is checkpointed, so it no longer reads the cached edges or
      // degrees
      deg.unpersist()
      e.unpersist()
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
