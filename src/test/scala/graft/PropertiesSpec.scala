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

  test("skylineMinMin equals brute-force dominance on random point sets") {
    import graft.ops.Aggregates
    val pts = Gen.listOfN(30, Gen.zip(Gen.choose(0, 12), Gen.choose(0L, 40L)))
    val prop = Prop.forAll(pts) { data =>
      val out = Aggregates.skylineMinMin(data.toDF("x", "y"), col("x"), col("y"))
        .as[(Int, Long)].collect().toSet
      val mins = data.groupBy(_._1).map { case (x, g) => x -> g.map(_._2).min }
      val brute = mins.collect { case (x, y) if !mins.exists { case (x2, y2) =>
        x2 <= x && y2 <= y && (x2 < x || y2 < y) } => (x, y) }.toSet
      out == brute
    }
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("pagerankFixedPoint: mass conserved within floor loss; uniform on regular graphs") {
    import graft.ext.Graph
    // ring graphs are 2-regular: PR must stay exactly uniform; mass loss
    // is bounded by n units per division step
    val sizes = Gen.choose(3, 30)
    val prop = Prop.forAll(sizes) { n =>
      val ring = (0L until n.toLong).map(i => (i, (i + 1) % n)).toDF("u", "v")
      val pr = Graph.pagerankFixedPoint(ring, col("u"), col("v"), iters = 2)
        .as[(Long, Long)].collect()
      val scale = 100000000L
      val uniform = pr.map(_._2).distinct.length == 1
      val mass = pr.map(_._2).sum
      // each of init + 2 iterations floors ≤ ~3 units per node
      uniform && mass <= scale && mass >= scale - 10L * n
    }
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("dedupSpansCorpus keepFirst: appending a copy of the corpus fully " +
      "cuts every long copy and never cuts MORE from the originals") {
    import graft.ext.Dedup
    // copies come after every original in (doc_id, off) order, so no
    // copy window is ever elected: long copies are scrubbed to nothing,
    // short ones (< spanLen, no windows) pass untouched. In the
    // originals, doubling turns previously-unique windows into elected
    // duplicates — protection only GROWS, so the original cut set can
    // only shrink (equality is not guaranteed: a new elected window can
    // shield a token an intra-original duplicate had cut).
    val word = Gen.oneOf("a", "b", "c", "d")
    val doc = Gen.choose(2, 12).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    val corpus = Gen.listOfN(8, doc)
    val prop = Prop.forAll(corpus) { texts =>
      val orig = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val copies = texts.zipWithIndex.map { case (t, i) => (100L + i, t) }
      def flags(rows: Seq[(Long, String)]) =
        Dedup.spanCutFlags(rows.toDF("doc_id", "text"),
            col("doc_id"), col("text"), spanLen = 4)
          .select("doc_id", "pos", "cut")
          .as[(Long, Long, Int)].collect()
          .map(r => (r._1, r._2) -> r._3).toMap
      val alone = flags(orig)
      val doubled = flags(orig ++ copies)
      val origShrinks = alone.forall { case (k, c1) => doubled(k) <= c1 }
      val copiesCut = copies.forall { case (i, t) =>
        val nTok = t.split(" ").length
        val cuts = (0L until nTok.toLong).map(p => doubled((i, p)))
        if (nTok >= 4) cuts.forall(_ == 1) else cuts.forall(_ == 0)
      }
      origShrinks && copiesCut
    }
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("spanCutFlags remove-all mode is span-idempotent: re-running over " +
      "the kept spans cuts nothing") {
    import graft.ext.Dedup
    // every window surviving pass 1 was corpus-unique, and spans add no
    // new windows — so a second pass over the spans finds no duplicates
    val word = Gen.oneOf("a", "b", "c")
    val doc = Gen.choose(2, 14).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    val corpus = Gen.listOfN(10, doc)
    val prop = Prop.forAll(corpus) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val flags = Dedup.spanCutFlags(df, col("doc_id"), col("text"),
          spanLen = 3, keepFirst = false)
        .select("doc_id", "pos", "tk", "cut")
        .as[(Long, Long, String, Int)].collect()
      // maximal runs of kept tokens per doc become standalone span-docs
      val spans = flags.groupBy(_._1).toSeq.flatMap { case (d, rows) =>
        val toks = rows.sortBy(_._2)
        val runs = scala.collection.mutable.ListBuffer.empty[List[String]]
        var cur = List.empty[String]
        toks.foreach { r =>
          if (r._4 == 0) cur = cur :+ r._3
          else { if (cur.nonEmpty) runs += cur; cur = Nil }
        }
        if (cur.nonEmpty) runs += cur
        runs.zipWithIndex.map { case (run, j) =>
          (d * 1000 + j, run.mkString(" ")) }
      }
      spans.isEmpty || {
        val again = Dedup.spanCutFlags(spans.toDF("doc_id", "text"),
            col("doc_id"), col("text"), spanLen = 3, keepFirst = false)
        again.agg(sum("cut")).as[Long].head() == 0L
      }
    }
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("dedupPassagesCorpus: every distinct passage survives exactly once, " +
      "and the clean corpus is passage-dedup idempotent") {
    import graft.ext.Dedup
    // random docs over a tiny vocabulary so passage collisions are common
    val word = Gen.oneOf("a", "b", "c", "d")
    val doc = Gen.choose(4, 16).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    val corpus = Gen.listOfN(12, doc)
    val prop = Prop.forAll(corpus) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val clean = Dedup.dedupPassagesCorpus(df, col("doc_id"), col("text"),
        win = 4)
      val kept = clean.filter(col("clean_text") =!= "")
        .select(col("doc_id"), col("clean_text").as("text"))
      // surviving passages are globally unique...
      val keptPassages = Dedup.dedupPassagesCorpus(kept, col("doc_id"),
        col("text"), win = 4)
      val stable = keptPassages.select("doc_id", "n_kept", "clean_text")
        .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
      val before = clean.filter(col("clean_text") =!= "")
        .select("doc_id", "n_kept", "clean_text")
        .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
      // ...so re-running the dedup changes nothing (idempotence), and
      // every distinct original passage appears in the cleaned corpus
      val originals = texts.zipWithIndex.flatMap { case (t, _) =>
        t.split(" ").grouped(4).map(_.mkString(" ")) }.toSet
      val survivors = before.flatMap(_._3.split(" ").grouped(4)
        .map(_.mkString(" "))).toSet
      stable == before && originals == survivors
    }
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("ngramContainmentPairs: exact dup has containment 1.0 both ways; values in (0,1]") {
    import graft.ext.Dedup
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g h"),          // exact dup of 1
      (3L, "a b c d e f g h i j k l m n o p q r"), // contains 1's grams
      (4L, "z y x w v u t s")).toDF("doc_id", "text")
    val out = Dedup.ngramContainmentPairs(docs, col("text"), col("doc_id"),
        n = 3, threshold = 0.5)
      .as[(Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out((1L, 2L)) == ((1.0, 1.0)))
    assert(out((1L, 3L))._1 == 1.0)   // all of 1's shingles inside 3
    assert(out((1L, 3L))._2 < 1.0)    // but 3 has many more
    assert(out.values.forall { case (a, b) =>
      a > 0.0 && a <= 1.0 && b > 0.0 && b <= 1.0 })
    assert(!out.contains((1L, 4L)))
  }
}
