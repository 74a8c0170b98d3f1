package graft.ext

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("native dot product matches the interpreted zip_with/aggregate form") {
    val interpreted = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x)
    val vecs = Gen.listOfN(20,
      Gen.zip(Gen.listOfN(8, Gen.choose(-10f, 10f)), Gen.listOfN(8, Gen.choose(-10f, 10f))))
    val prop = Prop.forAll(vecs) { data =>
      val df = data.toDF("a", "b")
      val out = df.select(
        Similarity.dot(col("a"), col("b")).as("native"),
        interpreted(col("a"), col("b")).as("interp"))
        .as[(Double, Double)].collect()
      out.forall { case (n, i) => n == i } // bit-identical, not approx
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("integer dot kernel matches the interpreted form and exact long arithmetic") {
    val vecs = Gen.listOfN(20,
      Gen.zip(Gen.listOfN(8, Gen.choose(-127L, 127L)), Gen.listOfN(8, Gen.choose(-127L, 127L))))
    val prop = Prop.forAll(vecs) { data =>
      val df = data.toDF("a", "b")
      val out = df.select(
        graft.functions.VectorFunctions.dotIntNative(col("a"), col("b")).as("native"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0L), (acc, x) => acc + x).as("interp"))
        .as[(Long, Long)].collect()
      out.forall { case (n, i) => n == i } &&
        out.zip(data).forall { case ((n, _), (a, b)) =>
          n == a.zip(b).map { case (x, y) => x * y }.sum }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("quantizedTopK equals brute force over the dequantized vectors") {
    val rnd = new scala.util.Random(31)
    val emb = (0 until 60)
      .map(i => (i.toLong, Seq.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val qn = Similarity.withQuantNorm(emb, col("vec_id"), col("embedding"))
    val quant = Similarity.quantizedTopK(qn.filter(col("vec_id") < 5), qn, k = 5)
      .select("qid", "vec_id", "rnk").as[(Long, Long, Int)].collect().toSet
    // scales cancel: quantized cosine = exact cosine of q/s vectors
    val deq = Similarity.quantizeInt8(emb, col("vec_id"), col("embedding"))
      .select(col("vec_id"),
        transform(col("q"), x => (x / col("scale")).cast("float")).as("embedding"))
    val n = Similarity.withNorm(deq, col("vec_id"), col("embedding"))
    val float = Similarity.bruteForceTopK(n.filter(col("vec_id") < 5), n, k = 5)
      .select("qid", "vec_id", "rnk").as[(Long, Long, Int)].collect().toSet
    assert(quant == float)
  }

  test("asymmetricTopK: float-query x int8-corpus recall vs full-float brute force") {
    val rnd = new scala.util.Random(37)
    val emb = (0 until 80)
      .map(i => (i.toLong, Seq.fill(12)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val fq = Similarity.withNorm(emb, col("vec_id"), col("embedding"))
    val qc = Similarity.withQuantNorm(emb, col("vec_id"), col("embedding"))
    val asym = Similarity.asymmetricTopK(fq.filter(col("vec_id") < 8), qc, k = 8)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val exact = Similarity.bruteForceTopK(fq.filter(col("vec_id") < 8), fq, k = 8)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(asym).size.toDouble / exact.size
    assert(recall >= 0.9, f"asymmetric int8 recall@8 dropped to $recall%.2f")
  }

  test("dot/norm basics: orthogonal = 0, self = |v|^2") {
    val df = Seq((Seq(1f, 0f, 2f), Seq(0f, 3f, 0f))).toDF("a", "b")
    val (ab, aa) = df.select(
      Similarity.dot(col("a"), col("b")).as("ab"),
      Similarity.dot(col("a"), col("a")).as("aa"))
      .as[(Double, Double)].head()
    assert(ab == 0.0 && aa == 5.0)
  }

  test("cosinePairs finds identical vectors at cos 1.0, a < b only") {
    val emb = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(1f, 0f)), (3L, Seq(0f, 1f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.cosinePairs(emb, col("vec_id"), col("embedding"), 0.9)
      .select("va", "vb", "cos").as[(Long, Long, Double)].collect()
    assert(out.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    assert(math.abs(out.head._3 - 1.0) < 1e-12)
  }

  test("signLshPairs finds near-identical vectors that brute force finds") {
    val rnd = new scala.util.Random(7)
    val dim = 16
    // 15 well-separated random vectors + a near-dup of each of the first 5
    val base = (0 until 15).map(i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq))
    val dups = (0 until 5).map(i =>
      (100L + i, base(i)._2.map(x => x + rnd.nextGaussian().toFloat * 0.01f)))
    val emb = (base ++ dups).toDF("vec_id", "embedding")
    val lsh = Similarity.signLshPairs(emb, col("vec_id"), col("embedding"),
        dim, threshold = 0.99)
      .select("va", "vb").as[(Long, Long)].collect().toSet
    val brute = Similarity.cosinePairs(emb, col("vec_id"), col("embedding"), 0.99)
      .select("va", "vb").as[(Long, Long)].collect().toSet
    // all 5 planted near-dup pairs exist in brute force, and LSH (8 bits
    // x 4 tables at cos >= 0.99) recovers every one of them
    assert((0 until 5).forall(i => brute.contains((i.toLong, 100L + i))))
    assert(lsh == brute)
  }

  test("signLshPairs recall at the threshold boundary matches OR-amplification theory (property)") {
    // Adversarial regime: pairs at controlled angles where the
    // (1-(1-(1-θ/π)^bits)^tables) math actually bites (cos 0.5), not
    // just near-identical vectors. Pairs are uniformly oriented, so
    // per-plane separation probability is exactly θ/π; pooling three
    // seeded plane draws approximates the expectation the formula
    // takes over planes. Bound = 4 binomial sigma + 3pp plane-draw
    // allowance; everything is seeded, so the test is deterministic.
    val dim = 16; val bits = 4; val tables = 2; val nPairs = 400; val seeds = 3
    def measure(cosTheta: Double): (Double, Double) = {
      val theta = math.acos(cosTheta)
      val p1 = math.pow(1.0 - theta / math.Pi, bits)
      val theory = 1.0 - math.pow(1.0 - p1, tables)
      val found = (0 until seeds).map { s =>
        val rnd = new scala.util.Random(1000 + s)
        def gauss() = Array.fill(dim)(rnd.nextGaussian())
        def unit(a: Array[Double]) = {
          val nm = math.sqrt(a.map(x => x * x).sum); a.map(_ / nm)
        }
        val rows = (0 until nPairs).flatMap { i =>
          val u = unit(gauss())
          val w0 = gauss()
          val proj = w0.zip(u).map { case (x, y) => x * y }.sum
          val w = unit(w0.zip(u).map { case (x, ux) => x - proj * ux })
          val v = u.zip(w).map { case (ux, wx) =>
            math.cos(theta) * ux + math.sin(theta) * wx }
          Seq((2L * i, u.map(_.toFloat).toSeq), (2L * i + 1, v.map(_.toFloat).toSeq))
        }
        val pairs = Similarity.signLshPairs(
          rows.toDF("vec_id", "embedding"), col("vec_id"), col("embedding"),
          dim = dim, threshold = cosTheta - 0.05, bits = bits, tables = tables,
          seed = 7L + s)
          .select("va", "vb").as[(Long, Long)].collect().toSet
        (0 until nPairs).count(i => pairs.contains((2L * i, 2L * i + 1)))
      }.sum
      (found.toDouble / (seeds * nPairs), theory)
    }
    for (c <- Seq(0.5, 0.9)) {
      val (measured, theory) = measure(c)
      val sigma = math.sqrt(theory * (1 - theory) / (seeds * nPairs))
      assert(math.abs(measured - theory) < 4 * sigma + 0.03,
        f"cos=$c%.1f measured=$measured%.3f theory=$theory%.3f")
    }
  }

  test("ivfTopK recall grows with nprobe and is exact at nprobe = nlist") {
    // Seeded Gaussian corpus: cells are arbitrary Voronoi regions, so
    // single-probe provably loses boundary neighbors; probing more
    // cells must recover them monotonically, and probing every cell
    // makes the candidate set identical to brute force (same tiebreak
    // ordering -> identical top-k, not just identical recall).
    val rnd = new scala.util.Random(11)
    val dim = 8
    val emb = (0 until 200)
      .map(i => (i.toLong, Seq.fill(dim)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val n = Similarity.withNorm(emb, col("vec_id"), col("embedding"))
    val queries = n.filter(col("vec_id") < 10)
    val centroids = n.filter(col("vec_id") % 20 === 0) // nlist = 10
    val k = 10
    val truth = Similarity.bruteForceTopK(queries, n, k)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    def hits(nprobe: Int): Int =
      Similarity.ivfTopK(n, centroids, queries, k, nprobe)
        .select("qid", "vec_id").as[(Long, Long)].collect().toSet
        .intersect(truth).size
    val (h1, h3, hAll) = (hits(1), hits(3), hits(10))
    assert(h1 < truth.size, "single probe already exact: seed gives no boundary loss")
    assert(h3 > h1, s"nprobe=3 must recover boundary neighbors: $h1 -> $h3 of ${truth.size}")
    assert(hAll == truth.size, s"nprobe=nlist must equal brute force ($hAll/${truth.size})")
  }

  test("ivfTopK broadcastQueries=false: same rows via the shuffled candidate join") {
    val rnd = new scala.util.Random(23)
    val emb = (0 until 150)
      .map(i => (i.toLong, Seq.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val n = Similarity.withNorm(emb, col("vec_id"), col("embedding"))
    val queries = n.filter(col("vec_id") < 12)
    val centroids = n.filter(col("vec_id") % 30 === 0)
    def rows(bcast: Boolean) =
      Similarity.ivfTopK(n, centroids, queries, k = 5, nprobe = 2,
        broadcastQueries = bcast)
        .select("qid", "vec_id", "rnk").as[(Long, Long, Int)].collect().toSet
    val shuffled = Similarity.ivfTopK(n, centroids, queries, k = 5, nprobe = 2,
      broadcastQueries = false)
    assert(rows(bcast = true) == rows(bcast = false))
    // the large-batch path must not broadcast the probe frame: its
    // candidate join on cid is a ShuffledHashJoin
    shuffled.collect()
    assert(shuffled.queryExecution.executedPlan.toString
      .contains("ShuffledHashJoin [cid"))
  }

  test("int8-quantized vectors preserve neighbor ranking (recall@10 vs float)") {
    // dequantize q/scale back to floats and re-run the exact top-k: at
    // 8 bits the cosine error is ~1/254 per component, so the top-10
    // neighbor sets should overlap almost completely on seeded data
    val rnd = new scala.util.Random(23)
    val dim = 16
    val emb = (0 until 120)
      .map(i => (i.toLong, Seq.fill(dim)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val deq = Similarity.quantizeInt8(emb, col("vec_id"), col("embedding"))
      .select(col("vec_id"),
        transform(col("q"), x =>
          when(col("scale") === 0.0, lit(0.0f))
            .otherwise((x / col("scale")).cast("float"))).as("embedding"))
    def topk(e: org.apache.spark.sql.DataFrame) = {
      val n = Similarity.withNorm(e, col("vec_id"), col("embedding"))
      Similarity.bruteForceTopK(n.filter(col("vec_id") < 10), n, k = 10)
        .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    }
    val exact = topk(emb)
    val quant = topk(deq)
    val recall = exact.intersect(quant).size.toDouble / exact.size
    assert(recall >= 0.9, f"int8 recall@10 dropped to $recall%.2f")
  }

  test("kmeansRefine: planted clusters recovered, exact fixed-point means, " +
      "tied seed empties and drops") {
    // two planted clusters; seed 200 is PARALLEL to seed 0, so every
    // vector ties between them and the cid tiebreak sends all members
    // to 0 -- cluster 200 must empty out and disappear (deterministic
    // Lloyd degeneracy)
    val emb = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(0.9f, 0.1f)), (2L, Seq(1f, 0.1f)),
      (100L, Seq(0f, 1f)), (101L, Seq(0.1f, 0.9f)), (102L, Seq(0.1f, 1f)),
      (200L, Seq(2f, 0f))).toDF("vec_id", "embedding")
    val n = Similarity.withNorm(emb, col("vec_id"), col("embedding"))
    val out = Similarity.kmeansRefine(
        n, n.filter(col("vec_id") % 100 === 0), iters = 2)
      .select("cid", "dim", "n", "mean")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out.keySet.map(_._1) == Set(0L, 100L), out.keySet)
    // cluster 0 absorbs ids 0,1,2,200: quantized dim sums are exact
    assert(out((0L, 0L)) == ((4L, 49000.0 / 40000)), out((0L, 0L)))
    assert(out((0L, 1L)) == ((4L, 2000.0 / 40000)), out((0L, 1L)))
    assert(out((100L, 0L)) == ((3L, 2000.0 / 30000)), out((100L, 0L)))
    assert(out((100L, 1L)) == ((3L, 29000.0 / 30000)), out((100L, 1L)))
    // stable fixture: a second pass re-derives the identical centroids,
    // so iters = 1 and iters = 2 agree exactly
    val one = Similarity.kmeansRefine(
        n, n.filter(col("vec_id") % 100 === 0), iters = 1)
      .select("cid", "dim", "n", "mean")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(one == out)
  }

  test("kmeansInertia: exact fixed-point mean cosine per cluster") {
    // one cluster: two vectors PARALLEL to the centroid (cos exactly 1,
    // even in floating point: scaling num and den by the same power of
    // two) and one orthogonal (cos exactly 0) -> mean is exactly 2/3
    val emb = Seq((0L, Seq(1f, 0f)), (1L, Seq(2f, 0f)), (2L, Seq(0f, 1f)))
      .toDF("vec_id", "embedding")
    val n = Similarity.withNorm(emb, col("vec_id"), col("embedding"))
    val cent = n.filter(col("vec_id") === 0)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nm").as("cn"))
    val out = Similarity.kmeansInertia(n, cent)
      .select("cid", "n", "s", "mean_cos")
      .as[(Long, Long, Long, Double)].collect()
    assert(out.toSeq == Seq((0L, 3L, 2000000L, 2000000.0 / 3000000)), out.toSeq)
  }

  test("mrrAt: exact reciprocal ranks; a missed truth scores 0") {
    val truth = Seq((1L, 10L, 1), (1L, 11L, 2),
      (2L, 20L, 1), (3L, 30L, 1)).toDF("qid", "vec_id", "rnk")
    val approx = Seq(
      (1L, 10L, 1),            // truth #1 found at rank 1 -> 1e6
      (2L, 99L, 1), (2L, 20L, 3), // found at rank 3 -> 333333
      (3L, 98L, 1)             // truth #1 missing -> 0
    ).toDF("qid", "vec_id", "rnk")
    val out = Similarity.mrrAt(truth, approx)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == ((1L, 1000000L)), out)
    assert(out(2L) == ((3L, 333333L)), out) // exact floor division
    assert(out(3L) == ((0L, 0L)), out)
  }

  test("standardize: exact z-scores; constant dimension maps to 0") {
    val emb = Seq((1L, Seq(1f, 5f)), (2L, Seq(3f, 5f)), (3L, Seq(5f, 5f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.standardize(emb, col("vec_id"), col("embedding"))
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("dim")) ->
        r.getAs[Long]("z_micro")).toMap
    // dim 0: mean 3, population sd sqrt(8/3) -> z = ±1.224745, 0
    assert(out((1L, 0L)) == -1224745L && out((2L, 0L)) == 0L &&
      out((3L, 0L)) == 1224745L, out)
    // dim 1 constant -> sd 0 -> z 0 by contract, never NaN
    assert(Seq(1L, 2L, 3L).forall(v => out((v, 1L)) == 0L), out)
  }

  test("silhouette: separated clusters near 1, boundary vector low, k=1 is 0") {
    // centroids on the two axes; members hug their own axis except
    // vec 4 which sits exactly on the diagonal (boundary: c1 = c2)
    val emb = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(10f, 1f)),
      (2L, Seq(0f, 1f)), (3L, Seq(1f, 10f)),
      (4L, Seq(1f, 1f))
    ).toDF("vec_id", "embedding")
    val n = Similarity.withNorm(emb, col("vec_id"), col("embedding"))
    val cent = n.filter(col("vec_id") isin (0L, 2L))
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nm").as("cn"))
    val out = Similarity.silhouette(n, cent).orderBy("cid")
      .select("cid", "n", "mean_sil")
      .as[(Long, Long, Double)].collect().toSeq
    assert(out.map(_._1) == Seq(0L, 2L) && out.map(_._2) == Seq(3L, 2L))
    // the boundary vector (cos equal to both centroids -> sil 0, ties
    // to cid 0) drags cluster 0's mean below cluster 2's
    assert(out.head._3 < out.last._3 && out.forall(_._3 > 0.5), out)
    // single centroid: no c2 -> sil 0 by contract for every member
    val one = Similarity.silhouette(n,
        cent.filter(col("cid") === 0L))
      .select("cid", "n", "s").as[(Long, Long, Long)].collect().toSeq
    assert(one == Seq((0L, 5L, 0L)), one)
  }

  test("hardNegativeTopK: same-label neighbors excluded, rank follows cosine") {
    // id 1 is the closest vector to the query but shares its label, so
    // it must never appear; ranks cover only the other-label vectors
    val emb = Seq(
      (0L, Seq(1f, 0f), 0), (1L, Seq(1f, 0.01f), 0),
      (2L, Seq(0.9f, 0.1f), 1), (3L, Seq(0f, 1f), 1))
      .toDF("vec_id", "embedding", "label")
    val n = emb.select(col("vec_id"), col("embedding").as("v"),
      Similarity.norm(col("embedding")).as("nm"), col("label"))
    val out = Similarity.hardNegativeTopK(
        n.filter(col("vec_id") === 0), n, k = 2)
      .select("qid", "vec_id", "rnk").as[(Long, Long, Int)].collect()
      .sortBy(_._3)
    assert(out.map(_._2).toSeq == Seq(2L, 3L), out.toSeq)
    assert(out.forall(_._1 == 0L))
  }

  test("rrfFuse: consensus top-1 wins; one-list-only candidates score " +
      "half; missing ranks contribute zero") {
    val a = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L))
      .toDF("qid", "vec_id", "rnk")
    val b = Seq((1L, 10L, 1L), (1L, 12L, 2L), (1L, 13L, 3L))
      .toDF("qid", "vec_id", "rnk")
    val out = Similarity.rrfFuse(a, b, kConst = 60, k = 10)
      .select("vec_id", "frnk", "rrf")
      .as[(Long, Int, Double)].collect().sortBy(_._2)
    // 10 is rank-1 in BOTH lists -> must fuse first
    assert(out.head._1 == 10L)
    assert(math.abs(out.head._3 - 2.0 / 61) < 1e-12)
    // 13 only in list b at rank 3 -> exactly one reciprocal term
    val thirteen = out.find(_._1 == 13L).get
    assert(math.abs(thirteen._3 - 1.0 / 63) < 1e-12)
    // all four distinct candidates survive the union
    assert(out.map(_._1).toSet == Set(10L, 11L, 12L, 13L))
  }

  test("tripletMine: positive is nearest same-label, negative nearest " +
      "other-label, margin is their gap") {
    val emb = Seq(
      (0L, Seq(1f, 0f), 0), (1L, Seq(0.95f, 0.05f), 0),
      (2L, Seq(0.9f, 0.1f), 1), (3L, Seq(0f, 1f), 1))
      .toDF("vec_id", "embedding", "label")
    val n = emb.select(col("vec_id"), col("embedding").as("v"),
      Similarity.norm(col("embedding")).as("nm"), col("label"))
    val out = Similarity.tripletMine(n.filter(col("vec_id") === 0), n)
      .select("qid", "pos_id", "neg_id", "margin")
      .as[(Long, Long, Long, Double)].collect()
    assert(out.length == 1)
    val (qid, pos, neg, margin) = out.head
    assert(qid == 0L && pos == 1L && neg == 2L)
    // vec 1 (same label) is closer to 0 than vec 2 -> positive margin
    assert(margin > 0)
  }

  test("bruteForceTopK: k neighbors, self excluded, rank follows cosine") {
    val emb = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(0.9f, 0.1f)), (2L, Seq(0f, 1f)), (3L, Seq(1f, 0.05f)))
      .toDF("vec_id", "embedding")
    val n = Similarity.withNorm(emb, col("vec_id"), col("embedding"))
    val out = Similarity.bruteForceTopK(n.filter(col("vec_id") === 0), n, k = 2)
      .select("qid", "vec_id", "rnk").as[(Long, Long, Int)].collect().sortBy(_._3)
    assert(out.length == 2)
    assert(out.forall(_._1 == 0L))
    assert(!out.exists(_._2 == 0L))        // no self-match
    assert(out.map(_._2).toSeq == Seq(3L, 1L)) // 3 is closer to 0 than 1
  }

  test("pq: exact on cluster-degenerate corpora — codes reconstruct, ADC ranks right") {
    // two seed clusters (ids 0 and 100, the %100 seeding rule), each
    // with exact copies: Lloyd keeps centroids at the duplicates, so
    // ADC scores are exact dots and ranking is fully determined
    val v0 = Array(1f, 0f, 0f, 1f)
    val v1 = Array(0f, 1f, 1f, 0f)
    val emb = Seq((0L, v0), (1L, v0), (2L, v0),
      (100L, v1), (101L, v1), (102L, v1)).toDF("vec_id", "embedding")
    val n = Similarity.withNorm(emb, col("vec_id"), col("embedding"))
    val cent = Similarity.pqTrain(n, m = 2, subDim = 2)
    // centroids must sit exactly on the duplicated vectors
    val c = cent.orderBy("s", "cid")
      .select("s", "cid", "cv").as[(Int, Long, Seq[Double])].collect()
    assert(c.toSeq == Seq((0, 0L, Seq(1.0, 0.0)), (0, 100L, Seq(0.0, 1.0)),
      (1, 0L, Seq(0.0, 1.0)), (1, 100L, Seq(1.0, 0.0))), c.toSeq)
    val codes = Similarity.pqAssign(
      Similarity.pqSubvectors(n, 2, 2), cent)
      .select(col("vec_id"), col("s"), col("cid"))
    val out = Similarity.pqSearch(n.filter(col("vec_id") === 1), cent,
        codes, m = 2, subDim = 2, k = 3)
      .orderBy("rnk").select("vec_id", "score")
      .as[(Long, Long)].collect().toSeq
    // own cluster first (score 2.0 -> 2e6 micro), ties by vec_id; the
    // orthogonal cluster scores exactly 0
    assert(out == Seq((0L, 2000000L), (2L, 2000000L), (100L, 0L)), out)
  }

  test("ivfPqTopK: probing every cell degenerates to the plain ADC scan; " +
      "nprobe=1 restricts candidates to the probed cell") {
    val v0 = Array(1f, 0f, 0f, 1f)
    val v1 = Array(0f, 1f, 1f, 0f)
    val emb = Seq((0L, v0), (1L, v0), (2L, v0),
      (100L, v1), (101L, v1), (102L, v1)).toDF("vec_id", "embedding")
    val n = Similarity.withNorm(emb, col("vec_id"), col("embedding"))
    val cent = Similarity.pqTrain(n, m = 2, subDim = 2)
    val codes = Similarity.pqAssign(
      Similarity.pqSubvectors(n, 2, 2), cent)
      .select(col("vec_id"), col("s"), col("cid"))
    val ivfCent = n.filter(col("vec_id") % 100 === 0) // 2 cells: 0, 100
    val q = n.filter(col("vec_id") === 1)
    // nprobe = nlist: IVF pruning is a no-op, so the composition must
    // reproduce pqSearch's ADC ranking exactly
    val full = Similarity.ivfPqTopK(n, ivfCent, q, cent, codes,
        m = 2, subDim = 2, k = 3, nprobe = 2)
      .orderBy("rnk").select("vec_id", "score")
      .as[(Long, Long)].collect().toSeq
    val adc = Similarity.pqSearch(q, cent, codes, m = 2, subDim = 2, k = 3)
      .orderBy("rnk").select("vec_id", "score")
      .as[(Long, Long)].collect().toSeq
    assert(full == adc, s"full-probe $full vs ADC $adc")
    // nprobe = 1: only the query's own cell is scanned — the orthogonal
    // cluster (cell 100) must vanish from the candidate set
    val pruned = Similarity.ivfPqTopK(n, ivfCent, q, cent, codes,
        m = 2, subDim = 2, k = 3, nprobe = 1)
      .select("vec_id").as[Long].collect().toSet
    assert(pruned == Set(0L, 2L), s"probed-cell candidates: $pruned")
  }

  test("semanticScreen: flags only vectors near an eval vector, names the offender") {
    // eval = {10}; 1 is a scaled copy of 10 (cos 1.0), 2 is orthogonal,
    // 3 is a near-copy; eval vectors themselves screen against each other
    val emb = Seq(
      (10L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(2f, 0f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(0.9f, 0.1f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val n = Similarity.withNorm(emb, col("vec_id"), col("embedding"))
    val out = Similarity.semanticScreen(n, n.filter(col("vec_id") === 10),
        threshold = 0.9, excludeSameId = true)
      .select("vec_id", "eid").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 10L, 3L -> 10L), s"flagged set: $out")
    // threshold is respected: orthogonal vector never flagged
    val all = Similarity.semanticScreen(n, n.filter(col("vec_id") === 10),
        threshold = -1.0, excludeSameId = true)
      .select("vec_id").as[Long].collect().toSet
    assert(all == Set(1L, 2L, 3L), "argmax emits every non-eval vector")
  }

  test("ndcgAt: perfect ranking scores exactly 1.0; reversal and misses degrade") {
    val truth = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("qid", "vec_id", "rnk")
    val perfect = Similarity.ndcgAt(truth, truth, k = 3).collect().head
    // gains line up with ideal positions → dcg == ideal, exactly 1.0
    assert(perfect.getAs[Double]("ndcg") == 1.0, perfect.toString)
    assert(perfect.getAs[Long]("dcg_micro") ==
      Similarity.ndcgIdealMicro(3))
    val reversed = Seq((1L, 12L, 1), (1L, 11L, 2), (1L, 10L, 3))
      .toDF("qid", "vec_id", "rnk")
    val rev = Similarity.ndcgAt(truth, reversed, k = 3)
      .collect().head.getAs[Double]("ndcg")
    assert(rev > 0.0 && rev < 1.0, s"reversed ranking scored $rev")
    val misses = Seq((1L, 97L, 1), (1L, 98L, 2), (1L, 99L, 3))
      .toDF("qid", "vec_id", "rnk")
    assert(Similarity.ndcgAt(truth, misses, k = 3)
      .collect().head.getAs[Long]("dcg_micro") == 0L,
      "all-miss ranking must earn zero credit")
  }

  test("ndcgAt: approx positions deeper than k carry zero credit, not nulls") {
    val truth = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("qid", "vec_id", "rnk")
    // a caller passing a 5-deep ranking to @3: positions 4 and 5 are
    // outside the metric's window — they must contribute exactly
    // nothing (same score as the truncated list), never poison the
    // sum with a null element_at lookup past the discount array
    val deep = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
        (1L, 13L, 4), (1L, 10L, 5))
      .toDF("qid", "vec_id", "rnk")
    val r = Similarity.ndcgAt(truth, deep, k = 3).collect().head
    assert(r.getAs[Double]("ndcg") == 1.0, r.toString)
    assert(r.getAs[Long]("dcg_micro") == Similarity.ndcgIdealMicro(3))
  }

  test("ndcgAt: order matters more at the top (rank-1 swap costs more than rank-k swap)") {
    val truth = (1 to 4).map(r => (1L, (9 + r).toLong, r))
      .toDF("qid", "vec_id", "rnk")
    def swapped(a: Int, b: Int) = (1 to 4).map { r =>
      val v = if (r == a) 9 + b else if (r == b) 9 + a else 9 + r
      (1L, v.toLong, r)
    }.toDF("qid", "vec_id", "rnk")
    def score(ap: org.apache.spark.sql.DataFrame): Double =
      Similarity.ndcgAt(truth, ap, k = 4).collect().head.getAs[Double]("ndcg")
    // swapping ranks 1↔2 must cost strictly more than swapping 3↔4
    assert(score(swapped(1, 2)) < score(swapped(3, 4)),
      "top-of-list inversions must be penalized harder")
  }

  test("signProject: one-hot vectors read the sign matrix back verbatim") {
    val dim = 16
    val signs = Similarity.jlSigns(dim)
    val oneHots = (0 until dim).map(j =>
      (j.toLong, Seq.tabulate(dim)(i => if (i == j) 1.0f else 0.0f)))
    val df = oneHots.toDF("vec_id", "embedding")
    val out = Similarity.signProject(df, col("vec_id"), col("embedding"),
        inDim = dim)
      .orderBy("vec_id").collect()
    out.zipWithIndex.foreach { case (row, j) =>
      (0 until Similarity.JlOutDim).foreach { k =>
        assert(row.getAs[Double](s"p$k") == signs(k)(j).toDouble,
          s"one-hot dim $j, output $k")
      }
    }
  }

  test("signProject: linear in the input and sign-flip symmetric") {
    val dim = 8
    val vecs = Gen.listOfN(10, Gen.listOfN(dim, Gen.choose(-8f, 8f)))
    val prop = Prop.forAll(vecs) { data =>
      val rows = data.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val df = rows.toDF("vec_id", "embedding")
      val neg = rows.map { case (i, v) => (i, v.map(x => -x)) }
        .toDF("vec_id", "embedding")
      val p = Similarity.signProject(df, col("vec_id"), col("embedding"), dim)
        .orderBy("vec_id").collect()
      val pn = Similarity.signProject(neg, col("vec_id"), col("embedding"), dim)
        .orderBy("vec_id").collect()
      // P(−x) = −P(x) component-wise (modulo the ±0.0 of rounding)
      p.zip(pn).forall { case (a, b) =>
        (0 until Similarity.JlOutDim).forall { k =>
          math.abs(a.getAs[Double](s"p$k") + b.getAs[Double](s"p$k")) == 0.0
        }
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("covarianceCells + principalComponent: recovers a planted direction") {
    // points t·(0.6, 0.8), t ∈ {±1, ±2}: population covariance is
    // 2.5·d·dᵀ → cells (.9, 1.2, 1.6), top eigenpair (d, 2.5)
    val dir = Array(0.6, 0.8)
    val pts = Seq(-2.0, -1.0, 1.0, 2.0).zipWithIndex.map { case (t, i) =>
      (i.toLong, Seq((t * dir(0)).toFloat, (t * dir(1)).toFloat))
    }
    val df = pts.toDF("vec_id", "embedding")
    val cov = Similarity.covarianceCells(df, col("embedding"), dim = 2)
    val cells = cov.orderBy("i", "j").collect()
    assert(cells.length == 3, "upper triangle of a 2×2 has 3 cells")
    val m = cells.map(r =>
      (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(math.abs(m((0L, 0L)) - 0.9) < 0.01, m.toString)
    assert(math.abs(m((0L, 1L)) - 1.2) < 0.01, m.toString)
    assert(math.abs(m((1L, 1L)) - 1.6) < 0.01, m.toString)
    val (pc, l) = Similarity.principalComponent(cov, dim = 2)
    assert(math.abs(math.abs(pc(0) * dir(0) + pc(1) * dir(1)) - 1.0) < 1e-6,
      s"PC1 ${pc.toSeq} must align with the planted direction")
    assert(math.abs(l - 2.5) < 0.02, s"eigenvalue $l")
    // componentScores projects each point back to (a sign of) its t
    val scores = Similarity.componentScores(df, col("vec_id"),
        col("embedding"), pc)
      .orderBy("vec_id").collect().map(_.getAs[Double]("score"))
    scores.zip(Seq(-2.0, -1.0, 1.0, 2.0)).foreach { case (s, t) =>
      assert(math.abs(math.abs(s) - math.abs(t)) < 0.01, s"score $s vs $t")
    }
  }

  test("mmrSelect: picks the diverse candidate a pure-relevance top-k would skip") {
    // 10 is the best hit (NOT identical to the query — a pick-1 equal
    // to q makes every step-2 criterion collapse to 0); 11 is 10's
    // near-duplicate and marginally more relevant than 12; 12 is
    // diverse. Relevance-only top-2 = {10, 11}; MMR must swap the
    // redundant 11 for 12.
    val emb = Seq(
      (1L, Seq(1f, 0f)),
      (10L, Seq(0.9f, 0.1f)),
      (11L, Seq(0.9f, 0.105f)),
      (12L, Seq(0.7f, -0.7f))
    ).toDF("vec_id", "embedding")
    val n = Similarity.withNorm(emb, col("vec_id"), col("embedding"))
    val q = n.filter(col("vec_id") === 1)
    val relOnly = Similarity.bruteForceTopK(q, n, k = 2)
      .select("vec_id").as[Long].collect().toSet
    assert(relOnly == Set(10L, 11L), s"relevance-only picked $relOnly")
    val mmr = Similarity.mmrSelect(q, n, c = 3, k = 2, lambda = 0.5)
      .orderBy("pick").collect()
    assert(mmr.map(_.getAs[Long]("vec_id")).toSeq == Seq(10L, 12L),
      mmr.mkString(", "))
    // pick 1 carries raw relevance; later picks carry the MMR criterion
    assert(mmr.head.getAs[Double]("score") > 0.99, mmr.head.toString)
    assert(mmr.last.getAs[Double]("score") <= 0.5, mmr.last.toString)
  }

  test("new embedding operators degrade gracefully on empty input") {
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val n = Similarity.withNorm(empty, col("vec_id"), col("embedding"))
    assert(Similarity.mmrSelect(n, n, c = 4, k = 2).count() == 0)
    assert(Similarity.covarianceCells(empty, col("embedding"), dim = 2)
      .count() == 0)
    assert(Similarity.signProject(empty, col("vec_id"), col("embedding"),
      inDim = 2).count() == 0)
    val noTruth = Seq.empty[(Long, Long, Int)].toDF("qid", "vec_id", "rnk")
    assert(Similarity.ndcgAt(noTruth, noTruth, k = 3).count() == 0)
  }

  test("principalComponent: zero covariance degenerates gracefully") {
    val zeros = Seq((0L, Seq(0f, 0f)), (1L, Seq(0f, 0f)))
      .toDF("vec_id", "embedding")
    val cov = Similarity.covarianceCells(zeros, col("embedding"), dim = 2)
    val (pc, l) = Similarity.principalComponent(cov, dim = 2)
    assert(l == 0.0 && pc.forall(!_.isNaN),
      "zero matrix must not divide by zero")
  }

  test("withNorm declared-dim rule: ragged rows are corrupt and dropped; " +
      "without a declared dim they pass through (back-compat)") {
    val emb = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)), // well-formed
      (2L, Seq(1f, 2f)), // RAGGED: truncated write
      (3L, Seq(1f, 2f, 3f, 4f, 5f)), // RAGGED: overlong
      (4L, Seq(0f, 0f, 0f, 0f))) // zero-norm (dropped by both forms)
      .toDF("vec_id", "embedding")
    val gated = Similarity.withNorm(emb, col("vec_id"), col("embedding"),
      dim = 4)
    assert(gated.select("vec_id").as[Long].collect().toSet == Set(1L))
    val ungated = Similarity.withNorm(emb, col("vec_id"), col("embedding"))
    assert(ungated.select("vec_id").as[Long].collect().toSet ==
      Set(1L, 2L, 3L))
    // the quantized twin applies the same rule
    val qgated = Similarity.withQuantNorm(emb, col("vec_id"),
      col("embedding"), dim = 4)
    assert(qgated.select("vec_id").as[Long].collect().toSet == Set(1L))
  }

  test("marginMine matches a driver-side replay of the µ-quantized " +
      "margin pipeline on random sides") {
    val rnd = new scala.util.Random(77)
    def side(ids: Range) = ids
      .map(i => (i.toLong, Seq.fill(6)(rnd.nextGaussian().toFloat)))
    val xs = side(0 until 15)
    val ys = side(100 until 125)
    val (k, thr) = (3, 0.0) // thr 0 keeps every best-margin pair visible
    val nx = Similarity.withNorm(xs.toDF("vec_id", "embedding"),
      col("vec_id"), col("embedding"))
    val ny = Similarity.withNorm(ys.toDF("vec_id", "embedding"),
      col("vec_id"), col("embedding"))
    val got = Similarity.marginMine(nx, ny, k = k, threshold = thr)
      .select("xid", "yid", "margin").as[(Long, Long, Double)]
      .collect().toSet
    // driver-side replay with the exact same µ-quantization
    def nrm(v: Seq[Float]) = math.sqrt(v.map(x => x.toDouble * x).sum)
    def qcos(a: Seq[Float], b: Seq[Float]): Long =
      math.round(a.zip(b).map { case (x, y) => x.toDouble * y }.sum /
        (nrm(a) * nrm(b)) * 1e6)
    val scored = for ((xi, xv) <- xs; (yi, yv) <- ys)
      yield (xi, yi, qcos(xv, yv))
    val fs = scored.groupBy(_._1).map { case (xi, rs) =>
      xi -> rs.sortBy(r => (-r._3, r._2)).take(k).map(_._3).sum }
    val bs = scored.groupBy(_._2).map { case (yi, rs) =>
      yi -> rs.sortBy(r => (-r._3, r._1)).take(k).map(_._3).sum }
    val want = scored.groupBy(_._1).map { case (xi, rs) =>
      val best = rs.map { case (_, yi, q) =>
        (yi, 2.0 * k * q / (fs(xi) + bs(yi))) }
        .minBy { case (yi, m) => (-m, yi) }
      (xi, best._1, BigDecimal(best._2)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
    assert(got == want)
  }

  test("marginMine demotes a hub: the margin denominator strips a " +
      "query whose cosine is high against EVERYTHING") {
    // y=100 is a hub direction every x is near (its bwd neighborhood
    // sum saturates); y=101 is x=1's exclusive partner with a slightly
    // LOWER absolute cosine. Absolute-cosine mining hands x=1 to the
    // hub; the margin criterion must flip to the partner.
    val xs = Seq(
      (1L, Seq(0.9f, 0.436f, 0f, 0f)), // cos 0.900 to hub, 0.892 to 101
      (2L, Seq(1f, 0.03f, 0f, 0f)), // hub-aligned
      (3L, Seq(1f, -0.03f, 0f, 0f)), // hub-aligned
      (4L, Seq(1f, 0.02f, 0.01f, 0f))) // hub-aligned
    val ys = Seq(
      (100L, Seq(1f, 0f, 0f, 0f)), // the hub
      (101L, Seq(0.6f, 0.79f, 0f, 0f)), // x=1's partner
      (102L, Seq(0f, 0f, 1f, 0f)),
      (103L, Seq(0f, 0f, 0f, 1f)))
    val nx = Similarity.withNorm(xs.toDF("vec_id", "embedding"),
      col("vec_id"), col("embedding"))
    val ny = Similarity.withNorm(ys.toDF("vec_id", "embedding"),
      col("vec_id"), col("embedding"))
    // absolute cosine genuinely prefers the hub (the trap is armed)
    val byCos = Similarity.bruteForceTopK(
      nx.filter(col("vec_id") === 1), ny, k = 1)
      .select("vec_id").as[Long].collect()
    assert(byCos.sameElements(Array(100L)),
      "test construction broken: absolute cosine must pick the hub")
    val mined = Similarity.marginMine(nx, ny, k = 2, threshold = 0.0)
      .select("xid", "yid").as[(Long, Long)].collect().toMap
    assert(mined(1L) == 101L,
      s"margin must prefer the exclusive partner over the hub: $mined")
  }

  test("marginMineIvf: probing every cell with exhaustive candidate " +
      "lists degenerates to the exact cross-product marginMine") {
    val rnd = new scala.util.Random(13)
    def side(ids: Range) = ids
      .map(i => (i.toLong, Seq.fill(6)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val nx = Similarity.withNorm(side(0 until 12), col("vec_id"),
      col("embedding"))
    val ny = Similarity.withNorm(side(100 until 120), col("vec_id"),
      col("embedding"))
    val cents = Similarity.withNorm(side(200 until 205), col("vec_id"),
      col("embedding"))
    val exact = Similarity.marginMine(nx, ny, k = 3, threshold = 0.0)
      .collect().map(_.toSeq).toSet
    val ivf = Similarity.marginMineIvf(nx, ny, cents, k = 3, cand = 20,
      nprobe = 5, threshold = 0.0)
      .collect().map(_.toSeq).toSet
    assert(ivf == exact,
      "exhaustive probing must reproduce the exact margin mining")
    // pruned probing returns a SUBSET-shaped approximation: per-x best
    // pairs still deterministic, margins computed from retrieved lists
    val pruned = Similarity.marginMineIvf(nx, ny, cents, k = 3,
      cand = 4, nprobe = 1, threshold = 0.0)
    assert(pruned.count() > 0)
    val again = Similarity.marginMineIvf(nx, ny, cents, k = 3,
      cand = 4, nprobe = 1, threshold = 0.0)
    assert(pruned.collect().map(_.toSeq).toSet ==
      again.collect().map(_.toSeq).toSet, "pruned mining is deterministic")
  }

  test("knnClassify: planted clusters vote their label; exact vote " +
      "ties break to the smaller label") {
    // two tight clusters along axes e0 (label 0) and e1 (label 1)
    val rnd = new scala.util.Random(5)
    def jig = rnd.nextFloat() * 0.05f
    val corpus = (0 until 8).map(i =>
      (10L + i, Seq(1f, jig, jig), 0)) ++ (0 until 8).map(i =>
      (30L + i, Seq(jig, 1f, jig), 1))
    val queries = Seq(
      (1L, Seq(0.95f, 0.02f, 0.01f)), // in cluster 0
      (2L, Seq(0.03f, 0.97f, 0.02f))) // in cluster 1
    val nq = Similarity.withNorm(queries.toDF("vec_id", "embedding"),
      col("vec_id"), col("embedding"))
    val nc = Similarity.withNorm(
      corpus.toDF("vec_id", "embedding", "label"),
      col("vec_id"), col("embedding"), keep = Seq(col("label")))
    val pred = Similarity.knnClassify(nq, nc, k = 5)
      .select("qid", "pred_label", "votes")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3))
      .toMap
    assert(pred(1L) == (0L, 5L) && pred(2L) == (1L, 5L), pred.toString)
    // exact tie: k=2 with one neighbor from each cluster equidistant —
    // the diagonal query sits at cos equality; label 0 must win the tie
    val corpus2 = Seq((10L, Seq(1f, 0f), 7), (20L, Seq(0f, 1f), 3))
      .toDF("vec_id", "embedding", "label")
    val q2 = Seq((1L, Seq(1f, 1f))).toDF("vec_id", "embedding")
    val tied = Similarity.knnClassify(
      Similarity.withNorm(q2, col("vec_id"), col("embedding")),
      Similarity.withNorm(corpus2, col("vec_id"), col("embedding"),
        keep = Seq(col("label"))), k = 2)
      .select("pred_label", "votes").as[(Long, Long)].collect()
    assert(tied.sameElements(Array((3L, 1L))),
      "1-vote-each tie must break to the smaller label")
    // NULL-label corpus rows ABSTAIN: they cannot vote, and a NULL
    // vote group surviving to the tie-break would diverge cross-engine
    // (Spark sorts NULLS FIRST ascending, DuckDB NULLS LAST)
    val corpus3 = Seq(
      (10L, Seq(1f, 0f), Some(7)), (20L, Seq(0f, 1f), Some(3)),
      (30L, Seq(0.9f, 0.9f), None), (40L, Seq(0.9f, 0.9f), None))
      .toDF("vec_id", "embedding", "label")
    val nullPred = Similarity.knnClassify(
      Similarity.withNorm(q2, col("vec_id"), col("embedding")),
      Similarity.withNorm(corpus3, col("vec_id"), col("embedding"),
        keep = Seq(col("label"))), k = 2)
      .select("pred_label", "votes").as[(Long, Long)].collect()
    assert(nullPred.sameElements(Array((3L, 1L))),
      "the two nearest (unlabeled) rows must abstain, not win the vote")
  }

  test("knnMeanCos: a planted far-away vector scores lowest and the " +
      "mean equals the hand-computed µ-quantized value") {
    val base = (0 until 6).map(i =>
      (i.toLong, Seq(1f, 0.01f * i, 0f)))
    val outlier = (99L, Seq(-0.1f, -0.1f, 1f))
    val emb = (base :+ outlier).toDF("vec_id", "embedding")
    val n = Similarity.withNorm(emb, col("vec_id"), col("embedding"))
    val rows = Similarity.knnMeanCos(n, k = 3)
      .select("vec_id", "sc", "cnt", "knn_cos")
      .as[(Long, Long, Long, Double)].collect()
    val worst = rows.minBy(_._2)
    assert(worst._1 == 99L, s"outlier must rank last: ${rows.mkString}")
    // hand-check the outlier's mean over its 3 nearest
    def nrm(v: Seq[Float]) = math.sqrt(v.map(x => x.toDouble * x).sum)
    def qcos(a: Seq[Float], b: Seq[Float]): Long =
      math.round(a.zip(b).map { case (x, y) => x.toDouble * y }.sum /
        (nrm(a) * nrm(b)) * 1e6)
    val ov = outlier._2
    val top3 = base.map { case (_, v) => qcos(ov, v) }.sorted.reverse.take(3)
    assert(worst._2 == top3.sum && worst._3 == 3L)
    val wantMean = BigDecimal(top3.sum.toDouble / (3 * 1e6))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(worst._4 == wantMean)
  }

  test("marginMine / knnClassify / knnMeanCos degrade gracefully on " +
      "empty sides") {
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val n = Similarity.withNorm(empty, col("vec_id"), col("embedding"))
    val nl = Similarity.withNorm(
      Seq.empty[(Long, Seq[Float], Int)].toDF("vec_id", "embedding", "label"),
      col("vec_id"), col("embedding"), keep = Seq(col("label")))
    assert(Similarity.marginMine(n, n, k = 2, threshold = 0.0).count() == 0)
    assert(Similarity.knnClassify(n, nl, k = 3).count() == 0)
    assert(Similarity.knnMeanCos(n, k = 3).count() == 0)
  }
}
