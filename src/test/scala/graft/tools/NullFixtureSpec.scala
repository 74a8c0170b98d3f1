package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the null-fixture generator's injection contract (VERDICT r12
  * item 1): deterministic key-mod rules, single-file layout readable by
  * both `Tables.load` and the DuckDB oracle, and the exact null/empty
  * surfaces the 207-query nulls gate exercises.
  */
class NullFixtureSpec extends SparkSpec {

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("nullfix").toString
    NullFixture.generate(spark, "/root/testdata/sf0.001", d)
    d
  }

  test("documents: null text / empty text / null lang / null source by key-mod") {
    val docs = graft.model.Tables.load(spark, dir, "documents")
    val r = docs.agg(
      count(lit(1)).as("n"), count(col("text")).as("t"),
      sum(when(col("text") === "", 1L).otherwise(0L)).as("empty"),
      count(col("lang")).as("l"), count(col("source")).as("s"),
      // n_chars must stay consistent with the injected text
      sum(when(col("text").isNull && col("n_chars").isNotNull, 1L)
        .otherwise(0L)).as("bad_nc"),
      sum(when(col("text") === "" && col("n_chars") =!= 0L, 1L)
        .otherwise(0L)).as("bad_nc0")).collect().head
    assert(r.getAs[Long]("n") == 500L)
    // doc_id%19==3 -> NULL text (27 ids), %19==7 -> empty (26 ids)
    assert(r.getAs[Long]("n") - r.getAs[Long]("t") == 27L)
    assert(r.getAs[Long]("empty") == 26L)
    assert(r.getAs[Long]("l") == 478L && r.getAs[Long]("s") == 478L)
    assert(r.getAs[Long]("bad_nc") == 0L && r.getAs[Long]("bad_nc0") == 0L)
  }

  test("embeddings and events: null/empty vectors, null ts/user_id/value/props") {
    val emb = graft.model.Tables.load(spark, dir, "embeddings")
    val re = emb.agg(count(lit(1)).as("n"), count(col("embedding")).as("e"),
      sum(when(size(col("embedding")) === 0, 1L).otherwise(0L)).as("empty"),
      sum(when(size(col("embedding")) === 64 &&
        !exists(col("embedding"), _ =!= 0.0f), 1L).otherwise(0L)).as("zero"),
      sum(when(size(col("embedding")) === 32, 1L).otherwise(0L))
        .as("ragged"),
      count(col("label")).as("lb")).collect().head
    assert(re.getAs[Long]("n") == 500L)
    assert(re.getAs[Long]("n") - re.getAs[Long]("e") == 18L) // %29==3
    assert(re.getAs[Long]("empty") == 17L)                   // %29==7
    assert(re.getAs[Long]("zero") == 17L)                    // %29==11
    assert(re.getAs[Long]("ragged") == 17L)                  // %29==17
    val ev = graft.model.Tables.load(spark, dir, "events")
    val rv = ev.agg(count(lit(1)).as("n"), count(col("ts")).as("ts"),
      count(col("user_id")).as("u"), count(col("value")).as("v"),
      count(col("props")).as("p")).collect().head
    assert(rv.getAs[Long]("n") == 1000L)
    assert(rv.getAs[Long]("n") - rv.getAs[Long]("ts") == 10L) // %101==13
    assert(rv.getAs[Long]("n") - rv.getAs[Long]("u") == 53L)  // %19==7
    assert(rv.getAs[Long]("n") - rv.getAs[Long]("v") == 44L)  // %23==5
    // events.ts ships as TIMESTAMP_NTZ — one of the three encodings
    // TablesSpec pins; Tables.load must normalize it to TimestampType
    assert(ev.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
  }

  test("generation is deterministic: a second run is bit-identical") {
    val d2 = java.nio.file.Files.createTempDirectory("nullfix2").toString
    NullFixture.generate(spark, "/root/testdata/sf0.001", d2)
    for (t <- Seq("documents", "embeddings", "events", "customer", "orders")) {
      val a = spark.read.parquet(s"$dir/$t.parquet")
      val b = spark.read.parquet(s"$d2/$t.parquet")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"$t differs between runs")
    }
  }
}
