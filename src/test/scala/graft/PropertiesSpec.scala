package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.ops.{Relational, Scalars, Windows}

/** Property-based invariants (SURVEY.md §5.3) beyond the per-module
  * specs: idempotence of dedup, survivor stability, and path-remap
  * round trips.
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(15)

  test("dedupBySubset is idempotent: dedup(dedup(x)) == dedup(x)") {
    val rows = Gen.listOfN(50,
      Gen.zip(Gen.choose(0, 8), Gen.choose(0, 50), Gen.alphaStr.map(_.take(4))))
    val prop = Prop.forAll(rows) { data =>
      val df = data.toDF("k", "p", "v")
      val once = Relational.dedupBySubset(df, Seq(col("k")), Seq(col("p"), col("v")))
      val twice = Relational.dedupBySubset(once, Seq(col("k")), Seq(col("p"), col("v")))
      once.as[(Int, Int, String)].collect().sorted.toSeq ==
        twice.as[(Int, Int, String)].collect().sorted.toSeq
    }
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("findFirst survivor is stable under input shuffling") {
    val rows = Gen.listOfN(40,
      Gen.zip(Gen.choose(0, 5), Gen.choose(0, 30), Gen.choose(0, 9)))
    val prop = Prop.forAll(rows) { data =>
      def run(d: Seq[(Int, Int, Int)]) =
        Windows.findFirst(d.toDF("k", "p", "v"),
            Seq(col("k")), Seq(col("p"), col("v")))
          .as[(Int, Int, Int)].collect().sorted.toSeq
      run(data) == run(scala.util.Random.shuffle(data))
    }
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("replacePrefix round-trips: apply then invert restores the path") {
    val seg = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(8))
    val paths = Gen.listOfN(20, Gen.listOfN(3, seg).map(_.mkString("/")))
    val prop = Prop.forAll(paths) { ps =>
      val df = ps.toDF("p")
      val there = Scalars.PathOps.replacePrefix(col("p"), "", "zone-a/")
      val back = Scalars.PathOps.replacePrefix(there, "zone-a/", "")
      df.select(back.as("r")).as[String].collect().toSeq == ps
    }
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("route falls through to default exactly when no prefix matches") {
    val seg = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(8))
    val prop = Prop.forAll(Gen.listOfN(20, seg)) { ps =>
      val branches = Seq("raw/" -> "a/", "cal/" -> "b/")
      val out = ps.toDF("p")
        .select(col("p"), Scalars.PathOps.route(col("p"), branches, "dflt/").as("r"))
        .as[(String, String)].collect()
      out.forall { case (p, r) =>
        if (p.startsWith("raw/")) r == s"a/$p"
        else if (p.startsWith("cal/")) r == s"b/$p"
        else r == s"dflt/$p"
      }
    }
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }
}
