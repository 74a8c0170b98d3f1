package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** HyperLogLog approximate-distinct sketch as a custom partial+final
  * aggregate — the mergeable-sketch slot SURVEY.md §2.4/§2.11 reserves.
  *
  * Why not exact `countDistinct`: at 100 TB, exact distinct per
  * high-cardinality key is a full shuffle of every distinct value
  * (the dedup map IS the data). This sketch is a fixed 2^p-byte
  * register array per group — partials combine by register max, so the
  * map-side combine is total and the shuffle carries kilobytes per
  * group regardless of input size. Standard error ~= 1.04/sqrt(2^p)
  * (~0.8% at the default p=14, 16 KiB per group); prefer exact
  * countDistinct only when groups are few and small.
  *
  * Spark's own approx_count_distinct is the same HLL++ family; this
  * implementation exists as the reference-free, property-tested custom
  * `TypedImperativeAggregate` surface (per-group byte-buffer state,
  * serialize/merge/eval contract) that user-defined sketches (quantile
  * digests, Bloom/theta sketches) follow. No cross-engine oracle is
  * possible — register layouts differ per engine — so the contract is
  * pinned by properties instead: error bound vs exact, merge = union,
  * insensitivity to duplication and split order (SketchSpec).
  *
  * Estimator: classic Flajolet HLL bias-corrected raw estimate with
  * linear counting below 2.5m (the empty-register regime where raw HLL
  * biases high). 64-bit XxHash64 leaves no practical large-range
  * correction regime.
  */
case class ApproxDistinct(
    child: Expression,
    precision: Int = ApproxDistinct.DefaultPrecision,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  require(precision >= 4 && precision <= 18,
    s"precision must be in [4, 18], got $precision")

  private val m = 1 << precision

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = XxHash64Function.hash(v, child.dataType, ApproxDistinct.Seed)
      val idx = (h >>> (64 - precision)).toInt
      val rest = h << precision
      // rank = 1 + leading zeros of the non-index bits; rest == 0 means
      // all 64-p suffix bits are zero -> maximal rank 64-p+1 (fits a byte)
      val rank = (if (rest == 0L) 64 - precision
                  else java.lang.Long.numberOfLeadingZeros(rest)) + 1
      if (rank > buf(idx)) buf(idx) = rank.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      invSum += java.lang.Double.longBitsToDouble((1023L - buf(i)) << 52) // 2^-buf(i)
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    val alpha = precision match {
      case 4 => 0.673
      case 5 => 0.697
      case 6 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    val raw = alpha * m * m / invSum
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    math.round(est)
  }

  // the register array IS its own wire format (merge is index-aligned max)
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_approx_distinct"

  override def withNewMutableAggBufferOffset(offset: Int): ApproxDistinct =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ApproxDistinct =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): ApproxDistinct =
    copy(child = newChild)
}

object ApproxDistinct {
  val DefaultPrecision = 14
  val Seed = 42L
}

/** Misra-Gries frequent-items ("heavy hitters") summary as a mergeable
  * partial+final aggregate — the second entry in the custom-sketch family
  * beside [[ApproxDistinct]].
  *
  * Why not exact per-value counts: finding the top domains / tokens /
  * user-agents over 100 TB with `GROUP BY value` shuffles every distinct
  * value; when only the heavy tail matters, a Misra-Gries summary of
  * `capacity` counters per partial answers it with fixed memory and a
  * proven bound. Guarantees (Misra-Gries 1982; merge per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012):
  *  - every item with true frequency > n/(capacity+1) is in the summary;
  *  - each reported counter c satisfies true - n/(capacity+1) <= c <= true
  *    (counters are undercounts; n = total non-null rows).
  * Both bounds survive arbitrary partitioning/merge order, which is what
  * the property suite pins (counter VALUES may legitimately differ by
  * split — only the bounds are the contract, so the output column is
  * named `count_lo`).
  *
  * Output: array<struct<item string, count_lo bigint>> sorted by
  * (count_lo desc, item asc) — deterministic given the same counter
  * state. String-typed input (route other types through cast).
  */
case class FreqItems(
    child: Expression,
    capacity: Int = FreqItems.DefaultCapacity,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(capacity >= 1 && capacity <= 100000,
    s"capacity must be in [1, 100000], got $capacity")

  private type Buf = java.util.HashMap[String, Long]

  override def createAggregationBuffer(): Buf = new Buf()

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) addCount(buf, v.toString, 1L)
    buf
  }

  private def addCount(buf: Buf, item: String, n: Long): Unit = {
    val cur = buf.get(item)
    if (cur != 0L || buf.containsKey(item)) buf.put(item, cur + n)
    else if (buf.size < capacity) buf.put(item, n)
    else {
      // decrement all counters by the insert weight (capped at the
      // smallest counter, iterated until the weight is absorbed or a
      // slot frees) — classic MG generalized to weighted inserts
      var remaining = n
      while (remaining > 0 && buf.size >= capacity) {
        var minC = Long.MaxValue
        val it0 = buf.values().iterator()
        while (it0.hasNext) minC = math.min(minC, it0.next())
        val dec = math.min(remaining, minC)
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val nv = e.getValue - dec
          if (nv <= 0L) it.remove() else e.setValue(nv)
        }
        remaining -= dec
      }
      if (remaining > 0) buf.put(item, remaining)
    }
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    // add counters pairwise, then shrink back to `capacity` by
    // subtracting the (capacity+1)-th largest count from everything
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.get(e.getKey)
      buf.put(e.getKey, cur + e.getValue)
    }
    if (buf.size > capacity) {
      val counts = new Array[Long](buf.size)
      var i = 0
      val vit = buf.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(buf.size - capacity - 1) // (capacity+1)-th largest
      val eit = buf.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        val nv = e.getValue - cut
        if (nv <= 0L) eit.remove() else e.setValue(nv)
      }
    }
    buf
  }

  override def eval(buf: Buf): Any = {
    import scala.jdk.CollectionConverters._
    val rows = buf.asScala.toSeq
      .sortBy { case (item, c) => (-c, item) }
      .map { case (item, c) =>
        InternalRow(org.apache.spark.unsafe.types.UTF8String.fromString(item), c)
      }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Buf()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.put(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count_lo", LongType, nullable = false))))
  override def nullable: Boolean = false
  override def prettyName: String = "graft_freq_items"

  override def withNewMutableAggBufferOffset(offset: Int): FreqItems =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): FreqItems =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): FreqItems =
    copy(child = newChild)
}

object FreqItems {
  val DefaultCapacity = 64
}

/** Mergeable quantile sketch on an exponential (HDR-histogram-style)
  * bucket grid — the third entry in the custom-sketch family beside
  * [[ApproxDistinct]] and [[FreqItems]].
  *
  * Why not exact percentiles: an exact per-group quantile sorts (or
  * rank-walks) every value — at 100 TB that is a full shuffle of the
  * measure column per group. This sketch is a fixed vector of bucket
  * counts per group: partials merge by vector ADD (associative,
  * order-insensitive — map-side combine is total), and the shuffle
  * carries a few KiB per group regardless of input size.
  *
  * Grid: non-negative longs; values < 2^subBits go to exact unit
  * buckets, larger values to sub/2 log-linear subbuckets per octave
  * (the HdrHistogram layout, ~30 KiB per group at the default). Each
  * log bucket spans a relative width <= 2/sub, so a reported quantile
  * VALUE is within a factor (1 + 2/sub) (~1.6% at the default
  * subBits=7) of a value whose rank brackets the requested quantile —
  * a relative-error-on-value bound, deterministic for a given input
  * multiset (no RNG, no order dependence; the property suite pins both
  * bounds across partitionings). Negative inputs are rejected (shift
  * upstream); nulls are ignored like every aggregate.
  *
  * Query: returns array<double> of the estimated quantile values (each
  * bucket reports its upper edge, clamped to the observed max) for the
  * requested probabilities.
  */
case class ApproxQuantiles(
    child: Expression,
    probs: Seq[Double],
    subBits: Int = ApproxQuantiles.DefaultSubBits,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
    s"probabilities must lie in [0, 1], got $probs")
  require(subBits >= 2 && subBits <= 12,
    s"subBits must be in [2, 12], got $subBits")

  // update() reads the child with asInstanceOf[Long]: require BIGINT so
  // a mistyped column (e.g. INT through the SQL registration) fails at
  // ANALYSIS time, matching ZOrder2/ZOrder3, instead of as an opaque
  // execution-time ClassCastException
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT input, got ${child.dataType.sql}")

  // bucket math lives on the companion so the streaming twin
  // (graft.streaming.TwsQuantiles) replays the IDENTICAL grid
  private val sub = 1 << subBits           // subbuckets per octave
  private val nBuckets = ApproxQuantiles.nBucketsOf(subBits)
  // trailing slots: [nBuckets] = total count, [nBuckets+1] = observed max
  private val bufLen = nBuckets + 2

  private def bucketOf(v: Long): Int = ApproxQuantiles.bucketOf(v, subBits)

  /** Upper edge of bucket i (its largest representable value). */
  private def bucketHigh(i: Int): Long =
    ApproxQuantiles.bucketHigh(i, subBits)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bufLen)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      if (x < 0) throw new IllegalArgumentException(
        s"graft_approx_quantiles: negative input $x (shift upstream)")
      buf(bucketOf(x)) += 1
      buf(nBuckets) += 1
      if (x > buf(nBuckets + 1)) buf(nBuckets + 1) = x
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i <= nBuckets) { buf(i) += other(i); i += 1 }
    if (other(nBuckets + 1) > buf(nBuckets + 1))
      buf(nBuckets + 1) = other(nBuckets + 1)
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val total = buf(nBuckets)
    if (total == 0) return null
    val mx = buf(nBuckets + 1)
    val out = new Array[Any](probs.size)
    var pi = 0
    while (pi < probs.size) {
      // nearest-rank walk, shared with the streaming twin
      out(pi) = ApproxQuantiles.quantileValue(buf(_), total, mx,
        probs(pi), subBits)
      pi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(bufLen * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = new Array[Long](bufLen)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(buf)
    buf
  }

  override def dataType: DataType = ArrayType(DoubleType)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_approx_quantiles"

  override def withNewMutableAggBufferOffset(offset: Int): ApproxQuantiles =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ApproxQuantiles =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): ApproxQuantiles =
    copy(child = newChild)
}

object ApproxQuantiles {
  val DefaultSubBits = 7 // 128 subbuckets -> ~1.6% relative value error

  /** Bucket count of the grid (unit segment + log-linear octaves). */
  def nBucketsOf(subBits: Int): Int = {
    val sub = 1 << subBits
    sub + (63 - subBits + 1) * (sub / 2)
  }

  /** Bucket index of value `v` on the `subBits` grid: values < 2^subBits
    * go to exact unit buckets, larger values to sub/2 log-linear
    * subbuckets per octave (the HdrHistogram layout).
    */
  def bucketOf(v: Long, subBits: Int): Int = {
    val sub = 1 << subBits
    if (v < sub) v.toInt
    else {
      val octave = 63 - java.lang.Long.numberOfLeadingZeros(v) // >= subBits
      val width = octave - subBits + 1
      val offsetInOctave = ((v >>> width) - (sub / 2)).toInt
      sub + (octave - subBits) * (sub / 2) + offsetInOctave
    }
  }

  /** Upper edge of bucket i (its largest representable value). */
  def bucketHigh(i: Int, subBits: Int): Long = {
    val sub = 1 << subBits
    if (i < sub) i.toLong
    else {
      val octave = subBits + (i - sub) / (sub / 2)
      val width = octave - subBits + 1
      val offsetInOctave = (i - sub) % (sub / 2)
      (((sub / 2) + offsetInOctave + 1L) << width) - 1
    }
  }

  /** Nearest-rank quantile walk over bucket counts — the exact
    * evaluation the aggregate's eval() performs, exposed so the
    * streaming twin is bit-identical by construction. `counts` is a
    * total function over bucket indices (0 for untouched buckets).
    */
  def quantileValue(counts: Int => Long, total: Long, mx: Long,
                    p: Double, subBits: Int): Double = {
    val nB = nBucketsOf(subBits)
    val target = math.max(1L, math.ceil(p * total).toLong)
    var acc = 0L
    var i = 0
    var found = -1
    while (i < nB && found < 0) {
      acc += counts(i)
      if (acc >= target) found = i
      i += 1
    }
    math.min(bucketHigh(found, subBits).toDouble, mx.toDouble)
  }
}

/** Column-API surface for the sketch aggregates. */
object SketchFunctions {

  /** Mergeable approximate distinct count of `c` (see [[ApproxDistinct]]).
    * Usable anywhere an aggregate Column is: `groupBy(...).agg(...)`,
    * window frames, cube/rollup.
    */
  def approxDistinct(c: Column,
                     precision: Int = ApproxDistinct.DefaultPrecision): Column =
    GraftBridge.column(
      ApproxDistinct(GraftBridge.expression(c), precision).toAggregateExpression())

  /** Mergeable Misra-Gries heavy-hitters summary of `c` (see
    * [[FreqItems]]): array of (item, count_lo) with every item of
    * frequency > n/(capacity+1) guaranteed present.
    */
  def freqItems(c: Column,
                capacity: Int = FreqItems.DefaultCapacity): Column =
    GraftBridge.column(
      FreqItems(GraftBridge.expression(c), capacity).toAggregateExpression())

  /** Mergeable log-histogram quantile estimates of non-negative long
    * `c` at `probs` (see [[ApproxQuantiles]]): array<double> within
    * ~1.6% relative value error at the default grid.
    */
  def approxQuantiles(c: Column, probs: Seq[Double],
                      subBits: Int = ApproxQuantiles.DefaultSubBits): Column =
    GraftBridge.column(
      ApproxQuantiles(GraftBridge.expression(c), probs, subBits)
        .toAggregateExpression())

  /** Mergeable Count-Min sketch of string column `c` (see
    * [[CountMin]]): array<bigint> of [depth, width, N, counters…],
    * point-queried later with [[cmsEstimate]].
    */
  def countMin(c: Column, depth: Int = CountMin.DefaultDepth,
               width: Int = CountMin.DefaultWidth): Column =
    GraftBridge.column(
      CountMin(GraftBridge.expression(c), depth, width)
        .toAggregateExpression())

  /** Point query against a [[countMin]] sketch: estimated count of
    * `item`, never an undercount, at most ε·N over.
    */
  def cmsEstimate(sketch: Column, item: Column): Column =
    GraftBridge.column(
      CmsEstimate(GraftBridge.expression(sketch), GraftBridge.expression(item)))
}
