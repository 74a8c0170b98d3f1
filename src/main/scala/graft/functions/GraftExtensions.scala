package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.ext.TextHash

/** SparkSessionExtensions registration for the native kernels, making
  * them SQL-callable:
  *
  * {{{
  * val spark = graft.Sessions.tuned(           // engine conf posture:
  *   SparkSession.builder()                    // codegen cache sized to
  *     .withExtensions(new GraftExtensions))   // the operator registry,
  *   .master(...)                              // committer v2, UTC
  *   .getOrCreate()
  * spark.sql("SELECT graft_dot(a.embedding, b.embedding) FROM ...")
  * }}}
  *
  * Build sessions through [[graft.Sessions]] (`tuned` composes with any
  * builder): a bare `SparkSession.builder()` silently reverts to the
  * 100-entry codegen cache and committer v1 — both measured engine
  * costs, not cosmetic defaults.
  *
  * The Column API (`HashFunctions`/`VectorFunctions`) works without
  * registration; this is the surface for SQL users and for tools that
  * only speak SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    register(ext, "graft_dot", "codegen'd double dot product of two numeric arrays",
      args => DotProduct(args(0), args(1)))
    register(ext, "graft_md5_48", "first 48 bits of md5 as BIGINT",
      args => Md5Prefix48(args(0)))
    register(ext, "graft_shingle_hash_48", "48-bit hashes of word n-gram shingles",
      args => ShingleHash48(args(0), expectInt(args(1), "n")))
    register(ext, "graft_minhash_sig", "MinHash signature over base hashes (k from arg 2)",
      args => {
        val k = expectInt(args(1), "k")
        // loud bound: take(k) would silently TRUNCATE to the 8-member
        // hash family, returning a shorter signature than requested
        if (k < 1 || k > TextHash.Params.size)
          throw new IllegalArgumentException(
            s"graft_minhash_sig: k must be in [1, ${TextHash.Params.size}], got $k")
        MinHashSig(args(0), TextHash.Params.take(k).map(_._1),
          TextHash.Params.take(k).map(_._2))
      })
    register(ext, "graft_simhash", "fused SimHash fingerprint of a text column (bits from arg 2)",
      args => SimHashFp(args(0), expectInt(args(1), "bits")))
    register(ext, "graft_dot_int", "codegen'd exact long dot product of two bigint arrays",
      args => DotProductLong(args(0), args(1)))
    register(ext, "graft_nfc", "Unicode NFC normalization (canonical composition)",
      args => NfcNormalize(args(0)))
    register(ext, "graft_approx_distinct",
      "mergeable HLL approximate distinct count (precision from optional arg 2)",
      args =>
        if (args.size >= 2) ApproxDistinct(args(0), expectInt(args(1), "precision"))
        else ApproxDistinct(args(0)))
    register(ext, "graft_freq_items",
      "mergeable Misra-Gries heavy-hitters summary (capacity from optional arg 2)",
      args =>
        if (args.size >= 2) FreqItems(args(0), expectInt(args(1), "capacity"))
        else FreqItems(args(0)))
    register(ext, "graft_approx_quantiles",
      "mergeable log-histogram quantile estimates (probs as array literal arg 2)",
      args => ApproxQuantiles(args(0), expectDoubleArray(args(1), "probs")))
    register(ext, "graft_cms",
      "mergeable Count-Min sketch of a string column (optional depth, width)",
      args => args match {
        case Seq(c) => CountMin(c)
        case Seq(c, d) => CountMin(c, expectInt(d, "depth"))
        case Seq(c, d, w) => CountMin(c, expectInt(d, "depth"), expectInt(w, "width"))
        case other => throw new IllegalArgumentException(
          s"graft_cms takes 1-3 arguments, got ${other.size}")
      })
    register(ext, "graft_cms_estimate",
      "point-query a graft_cms sketch: estimated count of item (never an undercount)",
      args => CmsEstimate(args(0), args(1)))
    register(ext, "graft_wordpiece",
      "greedy longest-prefix wordpiece segmentation (pieces space-joined)",
      args => WordpieceSegment(args(0)))
    register(ext, "graft_quality_bps",
      "fused exact-BIGINT quality score (length + function-word credits)",
      args => QualityBps(args(0), graft.ext.TextAnalysis.StopWords))
    register(ext, "graft_text_stats",
      "fused per-row text stats struct(n_tok, stop, alpha)",
      args => TextStats(args(0), graft.ext.TextAnalysis.StopWords))
    register(ext, "graft_zorder",
      "Morton z-order interleave of 2 or 3 normalized BIGINT dimensions",
      args => args match {
        case Seq(a, b) => ZOrder2(a, b)
        case Seq(a, b, c) => ZOrder3(a, b, c)
        case other => throw new IllegalArgumentException(
          s"graft_zorder takes 2 or 3 dimensions, got ${other.size}")
      })
  }

  private def register(ext: SparkSessionExtensions, name: String, usage: String,
                       builder: Seq[Expression] => Expression): Unit =
    ext.injectFunction((
      FunctionIdentifier(name),
      new ExpressionInfo("graft.functions", name, usage),
      builder))

  private def expectInt(e: Expression, what: String): Int = e match {
    case lit: org.apache.spark.sql.catalyst.expressions.Literal =>
      lit.value.toString.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def expectDoubleArray(e: Expression, what: String): Seq[Double] = {
    // the parser wraps array elements in type-unifying casts:
    // array(0.5, 1.0) -> CreateArray(Cast(0.5 as decimal), ...) — peel them
    def numOf(el: Expression): Double = el match {
      case lit: org.apache.spark.sql.catalyst.expressions.Literal =>
        lit.value.toString.toDouble
      case c: org.apache.spark.sql.catalyst.expressions.Cast => numOf(c.child)
      case other => throw new IllegalArgumentException(
        s"$what must be an array of numeric literals, got element $other")
    }
    e match {
      case arr: org.apache.spark.sql.catalyst.expressions.CreateArray =>
        arr.children.map(numOf)
      case other => throw new IllegalArgumentException(
        s"$what must be an array literal, got $other")
    }
  }
}
