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
    * along as a broadcast scalar. Unrolled iterations keep the whole
    * run a single Catalyst plan (no driver loop state beyond plan
    * construction). Contract: `edges` is one row per undirected edge
    * (src < dst convention fine); isolated vertices are not ranked
    * (every node in the edge list has deg ≥ 1, so there is no dangling
    * mass to redistribute).
    */
  def pagerankFixedPoint(edges: DataFrame, src: Column, dst: Column,
                         iters: Int, scale: Long = 100000000L): DataFrame = {
    require(iters >= 1 && iters <= 8, s"iters out of [1,8]: $iters")
    val sym = edges.select(src.as("u"), dst.as("v"))
      .union(edges.select(dst.as("u"), src.as("v")))
    val deg = sym.groupBy("u").agg(count(lit(1)).as("deg"))
    val n1 = deg.agg(count(lit(1)).as("n"))
    // base = scale ÷ n, the uniform start mass (and the teleport basis)
    val start = deg.crossJoin(broadcast(n1))
      .select(col("u"), col("deg"),
        floor(lit(scale) / col("n")).cast("long").as("base"))
    val init = start.withColumn("pr", col("base"))
    val ranked = (1 to iters).foldLeft(init) { (pr, _) =>
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
    ranked.select(col("u").as("node"), col("pr"))
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
