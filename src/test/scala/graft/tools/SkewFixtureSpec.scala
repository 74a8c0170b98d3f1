package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the skew-fixture generator's injection contract (r13 VERDICT
  * item 4, shipped r15): deterministic key-mod hot keys, duplicate-text
  * variants, dominant categorical values — all drawn from the columns'
  * existing domains so the oracle suite semantics are untouched
  * (FIXTURES.md §1d documents the gate: full suite + wall-clock bound).
  */
class SkewFixtureSpec extends SparkSpec {

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("skewfix").toString
    SkewFixture.generate(spark, "/root/testdata/sf0.001", d)
    d
  }

  test("documents: 20% boilerplate in 13 variants, dominant lang/source, " +
      "n_chars consistent with the injected text") {
    val docs = graft.model.Tables.load(spark, dir, "documents")
    val hot = docs.filter(col("text").startsWith("hot boilerplate"))
    assert(hot.count() == 100L) // doc_id%5==0 of 500
    assert(hot.select("text").distinct().count() == 13L)
    // the biggest duplicate cluster is corpus/5/13-sized, never 1
    val top = hot.groupBy("text").count().agg(max("count")).head.getLong(0)
    assert(top >= 7L, s"variant clusters too small to be hot: $top")
    assert(docs.filter(col("lang") === "en").count() >= 250L)
    assert(docs.filter(col("source") === "src0").count() >= 166L)
    val badNc = docs.filter(col("n_chars") =!= length(col("text"))).count()
    assert(badNc == 0L, s"n_chars out of sync on $badNc rows")
  }

  test("embeddings: identical-direction clusters in 11 variants, " +
      "dominant label, dims preserved") {
    val emb = graft.model.Tables.load(spark, dir, "embeddings")
    // the twin must keep the PRIMARY fixture's physical element type —
    // a silent float→double promotion would stop exercising the float
    // kernel paths and double the table
    assert(emb.schema("embedding").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, true),
      emb.schema("embedding").dataType.toString)
    val hot = emb.filter(col("vec_id") % 7 === 0)
    assert(hot.count() == 72L)
    // constant vectors: max == min within each hot row, 64 dims kept
    val flat = hot.filter(size(col("embedding")) === 64 &&
      array_max(col("embedding")) === array_min(col("embedding")))
    assert(flat.count() == 72L)
    assert(hot.select(array_max(col("embedding"))).distinct().count() == 11L)
    assert(emb.filter(col("label") === 1).count() >= 167L)
  }

  test("events/orders/lineitem/customer: hot user, hot fact keys, " +
      "dominant segment — all inside existing domains") {
    val ev = graft.model.Tables.load(spark, dir, "events")
    assert(ev.filter(col("user_id") === 42L).count() >= 250L)
    val ord = graft.model.Tables.load(spark, dir, "orders")
    assert(ord.filter(col("o_custkey") === 0L).count() >= 375L)
    val li = graft.model.Tables.load(spark, dir, "lineitem")
    assert(li.filter(col("l_partkey") === 0L).count() >= 1200L)
    assert(li.filter(col("l_suppkey") === 0L).count() >= 1200L)
    val cust = graft.model.Tables.load(spark, dir, "customer")
    assert(cust.filter(col("c_mktsegment") === "BUILDING").count() >= 75L)
    // referential integrity: the hot keys resolve in their dimensions
    assert(graft.model.Tables.load(spark, dir, "part")
      .filter(col("p_partkey") === 0L).count() == 1L)
    assert(cust.filter(col("c_custkey") === 0L).count() == 1L)
  }

  test("regeneration is bit-identical (no RNG anywhere)") {
    val d2 = java.nio.file.Files.createTempDirectory("skewfix2").toString
    SkewFixture.generate(spark, "/root/testdata/sf0.001", d2)
    for (t <- Seq("documents", "embeddings", "events", "lineitem")) {
      val a = graft.model.Tables.load(spark, dir, t)
      val b = graft.model.Tables.load(spark, d2, t)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, t)
    }
  }
}
