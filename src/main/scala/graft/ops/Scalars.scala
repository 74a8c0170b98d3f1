package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar helpers: path/string remaps, timespan interval logic, exact
  * money arithmetic. All return `Column` built from built-in (codegen'd)
  * expressions — no UDFs, so pushdown and whole-stage codegen stay intact
  * (SURVEY.md §2.11).
  */
object Scalars {

  /** Path/string transforms mirroring the reference's URI munging. */
  object PathOps {

    /** Strip a `#fragment` suffix (e.g. `#unzip=...`):
      * generate_dp1_file_tree.py:67-72.
      */
    def stripFragment(path: Column): Column = substring_index(path, "#", 1)

    /** The fragment itself (empty-safe would need a contains-check at the
      * call site; the reference only splits when '#' is present).
      */
    def fragment(path: Column): Column = substring_index(path, "#", -1)

    /** Replace a literal prefix (import_dp1.py:83-90 — rewrite
      * `file:///sdf/data/rubin/` to `external/rubin/`). Anchored regexp so
      * mid-string occurrences survive.
      */
    def replacePrefix(path: Column, from: String, to: String): Column =
      regexp_replace(path, "^" + java.util.regex.Pattern.quote(from), to)

    /** Multi-branch prefix routing (import_dp1.py:106-118 rucio layout):
      * first matching prefix wins, otherwise prepend the default prefix.
      */
    def route(path: Column, branches: Seq[(String, String)], defaultPrefix: String): Column =
      branches.foldRight(concat(lit(defaultPrefix), path)) {
        case ((prefix, target), elseCol) =>
          when(path.startsWith(prefix), concat(lit(target), path)).otherwise(elseCol)
      }
  }

  /** Validity-interval logic over the reference's Timespan struct
    * (nullable begin_nsec/end_nsec int64 nanoseconds,
    * datasets_parquet.py:119-121). Null bound = open-ended
    * (SURVEY.md §7.4.1), null struct = "no validity constraint".
    */
  object TimespanOps {

    def make(beginNsec: Column, endNsec: Column): Column =
      struct(beginNsec.as("begin_nsec"), endNsec.as("end_nsec"))

    /** t in [begin, end), open-ended on null bounds. */
    def contains(span: Column, tNsec: Column): Column = {
      val b = span.getField("begin_nsec")
      val e = span.getField("end_nsec")
      (b.isNull || tNsec >= b) && (e.isNull || tNsec < e)
    }

    /** Half-open interval overlap, open-ended on null bounds. */
    def overlaps(a: Column, b: Column): Column = {
      val ab = a.getField("begin_nsec"); val ae = a.getField("end_nsec")
      val bb = b.getField("begin_nsec"); val be = b.getField("end_nsec")
      (ab.isNull || be.isNull || ab < be) && (bb.isNull || ae.isNull || bb < ae)
    }
  }

  /** Exact additive money aggregation: per-row scale-to-integer then sum
    * as BIGINT. Per-row IEEE double arithmetic is bit-identical across
    * engines for the same expression, and integer sums are
    * order-independent — so hash-stable vs the DuckDB oracle at any scale
    * (SURVEY.md §7.5), unlike floating sums whose error grows with row
    * count. 2^63 head-room: 1e9 rows x 1e9 scaled units.
    */
  def moneyCents(x: Column): Column = floor(x * lit(100) + lit(0.5)).cast("long")

  def sumCents(x: Column): Column = sum(moneyCents(x))
}
