package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Window-function operators.
  *
  * Two of the reference's core semantics are window queries:
  *  - find_first (exporter.py:75-87): per data ID, take the dataset from
  *    the first collection in the chain that has it.
  *  - first-datastore-wins (datastore_parquet.py:66-76): per dataset_id,
  *    keep the record from the highest-priority datastore.
  *
  * Both are `row_number() over (partition by keys order by priority)` = 1.
  * Catalyst rewrites the rn=1 filter into WindowGroupLimit (Spark >= 3.5),
  * so only the top row per key is materialized — no full sort of each
  * partition group. At 100 TB this is a single hash-shuffle on the keys.
  */
object Windows {

  private val RN = "__graft_rn"

  /** Keep exactly one row per key: the first under `priority` ordering.
    * Callers MUST make the ordering total (append a unique tiebreak
    * column) — the reference can't have ties (one dataset per collection)
    * but determinism here is a contract (SURVEY.md §7.5).
    */
  def findFirst(df: DataFrame, keys: Seq[Column], priority: Seq[Column]): DataFrame =
    df.withColumn(RN, row_number().over(Window.partitionBy(keys: _*).orderBy(priority: _*)))
      .filter(col(RN) === 1)
      .drop(RN)

  /** first-datastore-wins (datastore_parquet.py:66-76) — same shape as
    * findFirst; kept as a named alias for call-site clarity.
    */
  def firstWins(df: DataFrame, keys: Seq[Column], priority: Seq[Column]): DataFrame =
    findFirst(df, keys, priority)

  /** Top-k rows per key under `priority`, keeping the 1-based rank as
    * `rankName`. Same WindowGroupLimit-optimized shape as findFirst.
    */
  def findFirstK(df: DataFrame, keys: Seq[Column], priority: Seq[Column],
                 k: Int, rankName: String): DataFrame =
    df.withColumn(rankName,
      row_number().over(Window.partitionBy(keys: _*).orderBy(priority: _*)))
      .filter(col(rankName) <= k)

  /** Rank-based per-group top-k KEEPING ties (`rank() <= k`) — the
    * "everything tied at the cutoff makes the list" semantic
    * row_number-based findFirstK deliberately breaks. Same
    * WindowGroupLimit pushdown: Spark stops scanning a group once the
    * rank bound is provably passed, so per-group cost is O(k + ties),
    * not O(group).
    */
  def rankTopK(df: DataFrame, keys: Seq[Column], order: Seq[Column],
               k: Int, rankName: String): DataFrame =
    df.withColumn(rankName,
      rank().over(Window.partitionBy(keys: _*).orderBy(order: _*)))
      .filter(col(rankName) <= k)

  /** Running aggregate over an ordered, partitioned frame
    * (rows from start of partition to current row).
    */
  def running(agg: Column, partition: Seq[Column], order: Seq[Column]): Column =
    agg.over(Window.partitionBy(partition: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow))

  /** Moving-frame aggregate (e.g. trailing moving average over the last
    * `preceding`+1 rows).
    */
  def movingFrame(agg: Column, partition: Seq[Column], order: Seq[Column],
                  preceding: Int): Column =
    agg.over(Window.partitionBy(partition: _*).orderBy(order: _*)
      .rowsBetween(-preceding, Window.currentRow))

  /** Ranking spec shared by rank / dense_rank / row_number call sites. */
  def rankSpec(partition: Seq[Column], order: Seq[Column]): WindowSpec =
    Window.partitionBy(partition: _*).orderBy(order: _*)

  /** Offset navigation: value of `c` `offset` rows before the current row
    * in the partition ordering, or `default` at the partition head.
    * Same shuffle/sort shape as the ranking ops — one hash exchange on
    * the partition keys, one sort; all navigation columns that share the
    * spec collapse into a single Window exec.
    */
  def lagOf(c: Column, offset: Int, default: Any,
            partition: Seq[Column], order: Seq[Column]): Column =
    lag(c, offset, default).over(rankSpec(partition, order))

  /** Offset navigation: `offset` rows after the current row. */
  def leadOf(c: Column, offset: Int, default: Any,
             partition: Seq[Column], order: Seq[Column]): Column =
    lead(c, offset, default).over(rankSpec(partition, order))

  /** Equi-depth bucket index (1..n) within the partition ordering.
    * Callers MUST make the ordering total or bucket assignment at tie
    * boundaries is nondeterministic (same contract as findFirst).
    */
  def ntileOf(n: Int, partition: Seq[Column], order: Seq[Column]): Column =
    ntile(n).over(rankSpec(partition, order))

  /** Exact global ntile(k) WITHOUT the single-task collapse.
    *
    * `ntile(k).over(Window.orderBy(...))` (empty PARTITION BY) moves the
    * ENTIRE input through one task — fine on a fixture, fatal on 100 TB.
    * This computes the identical bucket assignment scalably:
    *
    *  1. range-partition on the total ordering and sort within each
    *     partition (explicit partition count, so AQE never re-coalesces
    *     it — partition layout must be identical for both readers of
    *     the exchange);
    *  2. `monotonically_increasing_id()` over the sorted partitions is
    *     (partitionIndex << 33) + rowIndex by its documented encoding —
    *     so LOCAL row numbers and partition ids are pure bit projections
    *     of one column, no window exec and no pid hash exchange at all;
    *  3. a prefix-sum of per-partition counts — a `partitions`-row side
    *     table riding the SAME range exchange (ReusedExchange), windowed
    *     single-task at catalog size and broadcast back — turns local
    *     row numbers into exact global ranks;
    *  4. the closed-form ntile bucket of a global rank: the first
    *     n mod k buckets take ceil(n/k) rows, the rest floor(n/k).
    *
    * Cost: ONE exchange of the data (the range partitioning; read twice
    * via exchange reuse), one in-partition sort, and a broadcast of
    * `partitions` rows — every stage parallel, nothing data-sized on
    * the driver or in one task. The id projection is deterministic
    * because both its inputs are: partition layout (explicit range
    * partitioning) and intra-partition order (the sort below it).
    * Doubles are exact for the rank arithmetic up to 2^53 rows. Same
    * determinism contract as [[ntileOf]]: the ordering must be total.
    */
  def globalNtile(df: DataFrame, k: Int, order: Seq[Column],
                  partitions: Int, bucketName: String): DataFrame = {
    require(k >= 1, s"globalNtile needs k >= 1, got $k")
    val MONO = "__graft_mono"
    val PID = "__graft_pid"
    val exchanged = df.repartitionByRange(partitions, order: _*)
    val ranged = exchanged
      .sortWithinPartitions(order: _*)
      .withColumn(MONO, monotonically_increasing_id())
      .withColumn(PID, shiftright(col(MONO), 33))
    // tiny (pid, count, offset, total) table: `partitions` rows; empty
    // range partitions simply don't appear (they contribute offset 0).
    // Counts come off the UNSORTED exchange output (spark_partition_id
    // over the reused exchange — same layout, counts don't need order),
    // so the side branch skips the in-partition sort entirely.
    val wPrefix = Window.orderBy(col(PID))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTotal = Window.orderBy(col(PID))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = exchanged
      .select(spark_partition_id().cast("long").as(PID))
      .groupBy(col(PID)).agg(count(lit(1)).as("__cnt"))
      .withColumn("__offset", coalesce(sum(col("__cnt")).over(wPrefix), lit(0L)))
      .withColumn("__n", sum(col("__cnt")).over(wTotal))
      .drop("__cnt")
    // 1-based global rank: local row index (low 33 bits) + prefix offset
    val r = col(MONO).bitwiseAND(lit((1L << 33) - 1)) + lit(1L) + col("__offset")
    val q = floor(col("__n") / k).cast("long")       // small-bucket size
    val rem = col("__n") % k                          // # of (q+1) buckets
    val bigSpan = rem * (q + lit(1L))                 // rows they cover
    val bucket = when(col("__n") < k, r)              // n < k: one row each
      .when(r <= bigSpan, floor((r - 1) / (q + lit(1L))) + 1)
      .otherwise(rem + floor((r - bigSpan - lit(1L)) / q) + 1)
    ranged.join(broadcast(offsets), Seq(PID))
      .withColumn(bucketName, bucket.cast("int"))     // ntile's return type
      .drop(PID, MONO, "__offset", "__n")
  }

  /** Value-range frame: aggregate over rows whose `order` value lies in
    * [current - precedingUnits, current + followingUnits].
    *
    * Spark 4's WindowSpec.rangeBetween takes long offsets against the
    * single ORDER BY expression, so interval frames are expressed by
    * ordering on the epoch projection of the temporal column —
    * `unix_date(d)` with units = days, or `unix_micros(ts)` with units =
    * microseconds. Both are exact (dates/timestamps are stored at that
    * granularity), so `RANGE BETWEEN INTERVAL '30' DAY PRECEDING` ==
    * rangeFrame(_, _, unix_date(d), 30). Unlike ROWS frames, peers
    * (equal order values) all enter the frame, so no tiebreak columns
    * are needed for determinism.
    */
  def rangeFrame(agg: Column, partition: Seq[Column], order: Column,
                 precedingUnits: Long, followingUnits: Long = 0L): Column =
    agg.over(Window.partitionBy(partition: _*).orderBy(order)
      .rangeBetween(-precedingUnits, followingUnits))
}
