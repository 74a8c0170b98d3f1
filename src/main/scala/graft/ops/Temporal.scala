package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators.
  *
  * The backward as-of join ("attach the most recent right row at or before
  * each left row's timestamp, per key") is the temporal analogue of the
  * reference's validity-interval lookup (exporter.py:81-84 — a calibration
  * is valid from its certify time until superseded); expressed as-of, the
  * interval end never needs materializing.
  *
  * Scale posture: the naive formulation is a range join (left x right
  * per key), quadratic in per-key row counts. This implementation is the
  * union-sort variant: tag both sides, union, and carry the right payload
  * forward with `last(_, ignoreNulls) OVER (PARTITION BY key ORDER BY ts,
  * side ROWS UNBOUNDED PRECEDING)`. One hash exchange on the key, one
  * sort, linear work — the plan a 1000-executor cluster wants, with no
  * broadcast requirement on either side.
  */
object Temporal {

  private val SIDE = "__asof_side"
  private val T = "__asof_t"
  private val P = "__asof_payload"

  /** Backward as-of join. Left keeps all its rows (left-outer semantics;
    * set `inner = true` to drop left rows with no prior right row).
    *
    * Contract: `left` and `right` share exactly the `keys` column names
    * (any other shared name is rejected — silently merging it would
    * corrupt left values); every non-key right column (including
    * `rightTs`) is carried onto the matching left rows. A right row at
    * the same timestamp as a left row matches (`leftTs >= rightTs`
    * semantics). The right side must be unique per (keys, rightTs) —
    * pre-aggregate it otherwise, or the choice among equal-timestamp
    * right rows is nondeterministic. Right rows with a null `rightTs`
    * are dropped (no timestamp can never match backward).
    *
    * The whole right payload is packed into ONE struct and carried with
    * a single `last(_, ignoreNulls) OVER w`, then unpacked — so the
    * attached columns always come from the SAME right row, even when
    * individual payload values are null (per-column carries would mix
    * rows / resurrect older non-null values past a newer null).
    */
  def asofJoinBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                       leftTs: String, rightTs: String,
                       inner: Boolean = false): DataFrame =
    asofJoin(left, right, keys, leftTs, rightTs, inner, backward = true)

  /** Forward as-of join: attach the EARLIEST right row at or after each
    * left row's timestamp (`leftTs <= rightTs` semantics) — the "next
    * calibration / next event" lookup. Same union-sort shape, contract,
    * and guards as [[asofJoinBackward]], mirrored in time.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTs: String, rightTs: String,
                      inner: Boolean = false): DataFrame =
    asofJoin(left, right, keys, leftTs, rightTs, inner, backward = false)

  /** Nearest as-of join: attach the right row closest in time to each
    * left row, in either direction; at equal distance the backward
    * (earlier) row wins. Both directional carries ride the SAME union
    * and key exchange — one shuffle, two window sorts — and the
    * per-row winner is a null-safe comparison of the two candidate
    * distances (timestamp subtraction yields a comparable day-time
    * interval, so the same code serves long and timestamp axes).
    */
  def asofJoinNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTs: String, rightTs: String,
                      inner: Boolean = false): DataFrame = {
    val payload = right.columns.filterNot(keys.contains).toSeq
    val collisions = left.columns.toSeq.intersect(payload)
    require(collisions.isEmpty,
      s"asofJoin: right payload column(s) ${collisions.mkString(", ")} " +
        "collide with left columns — rename them on one side " +
        "(only the join keys may be shared)")
    val PB = P + "_b"
    val PF = P + "_f"
    val l = left.withColumn(SIDE, lit(1)).withColumn(T, col(leftTs))
    val r = right.filter(col(rightTs).isNotNull)
      .withColumn(P, struct(payload.map(col): _*))
      .withColumn(SIDE, lit(0)).withColumn(T, col(rightTs))
      .select((keys ++ Seq(P, SIDE, T)).map(col): _*)
    val u = l.unionByName(r, allowMissingColumns = true)
    val wB = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(T), col(SIDE))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(T), col(SIDE).desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val attached = u
      .withColumn(PB, last(col(P), ignoreNulls = true).over(wB))
      .withColumn(PF, first(col(P), ignoreNulls = true).over(wF))
      .filter(col(SIDE) === 1)
    val distB = col(T) - col(PB).getField(rightTs)
    val distF = col(PF).getField(rightTs) - col(T)
    val chosen = when(col(PB).isNull, col(PF))
      .when(col(PF).isNull, col(PB))
      .when(distB <= distF, col(PB))
      .otherwise(col(PF))
    // same null-match contract as the directional carries
    val withChoice = attached.withColumn(P,
      when(asofMatchable(keys), chosen))
    val unpacked = payload.foldLeft(withChoice) { (df, c) =>
      df.withColumn(c, col(P).getField(c))
    }.drop(SIDE, T, P, PB, PF)
    if (inner) unpacked.filter(col(rightTs).isNotNull) else unpacked
  }

  /** Regularize a keyed daily series onto a dense per-key date spine and
    * forward-fill observation gaps — the resample step every time-series
    * consumer runs before modeling ("one row per key per day, carrying
    * the last known value").
    *
    * `observed` has one row per (keys, dateCol) — pre-aggregate it
    * otherwise. Each key's spine spans ITS OWN [min, max] observed date
    * (no global calendar — a key that appeared for a week doesn't get
    * years of padding); `fill` columns forward-fill from the most recent
    * observed row, other observation columns stay null on gap days, and
    * `gapCol` marks spine-generated rows.
    *
    * Scale posture: the spine is groupBy(min, max) + `sequence()` +
    * explode — generated distributed, never on the driver — and the
    * spine/observed alignment plus the forward-fill carry ride the SAME
    * (keys, date) sort order, so the whole operator is one aggregate
    * exchange, one key-partitioned join, one window sort. Spine volume
    * is sum(per-key span), bounded by keys x observed horizon; a key
    * with a pathological span pays only for itself.
    */
  def resampleDailyFfill(observed: DataFrame, keys: Seq[String],
                         dateCol: String, fill: Seq[String],
                         gapCol: String = "is_gap"): DataFrame = {
    val MARK = "__obs_mark"
    val keyCols = keys.map(col)
    val spine = observed
      .groupBy(keyCols: _*)
      .agg(min(col(dateCol)).as("__mn"), max(col(dateCol)).as("__mx"))
      .select(keyCols :+
        explode(sequence(col("__mn"), col("__mx"),
          expr("interval 1 day"))).as(dateCol): _*)
    val joined = spine
      .join(observed.withColumn(MARK, lit(true)), keys :+ dateCol, "left")
      .withColumn(gapCol, coalesce(col(MARK), lit(false)) === false)
      .drop(MARK)
    val w = Window.partitionBy(keyCols: _*).orderBy(col(dateCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fill.foldLeft(joined) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }

  /** Regularize like [[resampleDailyFfill]] but LINEARLY INTERPOLATE one
    * numeric column across gaps instead of carrying the last value:
    * `interp = prev + (next - prev) * (day - prevDay)/(nextDay - prevDay)`,
    * the standard resampling for continuous measures (prices, sensor
    * readings) where a step function would bias downstream windows.
    * Observed days keep their exact value; leading/trailing gap days
    * (no observation on one side) stay null — interpolation never
    * extrapolates.
    *
    * Determinism: with `valueCol` integer-valued (fixed-point upstream,
    * e.g. cents) and day distances integral, the interpolation is one
    * double expression over exact integers — bit-stable at any
    * parallelism, and reproducible in any engine that evaluates the
    * same formula (the DuckDB oracle does exactly that). Output rounded
    * to 4 decimals per the §7.5 float contract.
    *
    * Scale posture: identical to resampleDailyFfill — the backward and
    * forward carries are two frames over the SAME (keys, date) sort, so
    * the whole operator stays one aggregate exchange, one join, one
    * window sort.
    */
  def resampleDailyInterp(observed: DataFrame, keys: Seq[String],
                          dateCol: String, valueCol: String,
                          as: String = "interp",
                          gapCol: String = "is_gap"): DataFrame = {
    val filledMark = resampleDailyFfill(observed, keys, dateCol, fill = Nil,
      gapCol = gapCol)
    val keyCols = keys.map(col)
    val day = unix_date(col(dateCol)).cast("double")
    // BOTH carries gate on the same predicate (observed AND valued):
    // an observed row with a NULL value otherwise advances the
    // neighbor DAY while the neighbor VALUE still comes from an
    // earlier row — a line through mismatched (day, value) pairs
    val obsOk = !col(gapCol) && col(valueCol).isNotNull
    val obsDay = when(obsOk, unix_date(col(dateCol)))
    val obsVal = when(obsOk, col(valueCol))
    val wB = Window.partitionBy(keyCols: _*).orderBy(col(dateCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(keyCols: _*).orderBy(col(dateCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val pd = last(obsDay, ignoreNulls = true).over(wB).cast("double")
    val pv = last(obsVal, ignoreNulls = true).over(wB).cast("double")
    val nd = first(obsDay, ignoreNulls = true).over(wF).cast("double")
    val nv = first(obsVal, ignoreNulls = true).over(wF).cast("double")
    filledMark.withColumn(as,
      // an observed day with a NULL value interpolates like a gap day
      // (same obsOk gate as the carries — it contributed no point)
      when(obsOk, round(col(valueCol).cast("double"), 4))
        .otherwise(round(pv + (nv - pv) * (day - pd) / (nd - pd), 4)))
  }

  /** Exponentially-weighted moving average over a BOUNDED lookback of
    * the last `k` rows per key: ewma = Σ αⁱ·x_{t-i} / Σ αⁱ over the
    * available lags (short prefixes renormalize over what exists,
    * matching pandas `ewm(adjust=True)` truncated to a window). The
    * standard smoother for noisy per-entity series.
    *
    * Why bounded instead of the textbook infinite recursion: the
    * recursive form is inherently sequential per key (breaks window
    * parallelism and any cross-engine oracle), while the k-term form
    * is ONE window over k `lag`s — a single partition-sort exec, no
    * self-joins — and with α a power of two the αⁱ·x products are
    * exact binary scalings, so the left-associated sum is bit-identical
    * in any IEEE engine evaluating the same expression. α = 0.5, k = 8
    * leaves a residual tail weight < 0.4%, well under the 4-decimal
    * output rounding.
    */
  def ewmaBounded(df: DataFrame, keys: Seq[String], order: Seq[String],
                  value: Column, k: Int = 8, as: String = "ewma"): DataFrame = {
    require(k >= 1 && k <= 16, s"k out of [1,16]: $k")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(col): _*)
    def weight(i: Int): Double = math.pow(0.5, i)
    val num = (1 until k).foldLeft(value.cast("double")) { (acc, i) =>
      acc + when(lag(value, i).over(w).isNotNull,
        lit(weight(i)) * lag(value, i).over(w).cast("double")).otherwise(lit(0.0))
    }
    val den = (1 until k).foldLeft(lit(1.0)) { (acc, i) =>
      acc + when(lag(value, i).over(w).isNotNull, lit(weight(i)))
        .otherwise(lit(0.0))
    }
    df.withColumn(as, round(num / den, 4))
  }

  /** Gap detection: per series, the adjacent event pairs whose
    * event-time distance exceeds `minGapUs` — the time-series QA
    * operator behind "which sensors went dark" / "where did the feed
    * stall". `tiebreak` must make the per-key ordering total
    * ((key, ts) alone is rarely unique; a nondeterministic order
    * makes gap endpoints flap between runs).
    *
    * Scale posture: one shuffle on the series key into one window exec
    * (both lags share the frame); the filter drops non-gaps before
    * anything downstream materializes.
    */
  def gaps(df: DataFrame, keys: Seq[String], tsUs: Column, tiebreak: Column,
           minGapUs: Long): DataFrame = {
    require(minGapUs > 0, "minGapUs must be positive")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsUs, tiebreak)
    df.withColumn("__tus", tsUs)
      .withColumn("__ptus", lag(tsUs, 1).over(w))
      .withColumn("prev_id", lag(tiebreak, 1).over(w))
      .filter(col("__ptus").isNotNull &&
        col("__tus") - col("__ptus") > minGapUs)
      .withColumn("gap_us", col("__tus") - col("__ptus"))
      .drop("__tus", "__ptus")
  }

  private def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                       leftTs: String, rightTs: String,
                       inner: Boolean, backward: Boolean): DataFrame = {
    val payload = right.columns.filterNot(keys.contains).toSeq
    val collisions = left.columns.toSeq.intersect(payload)
    require(collisions.isEmpty,
      s"asofJoin: right payload column(s) ${collisions.mkString(", ")} " +
        "collide with left columns — rename them on one side " +
        "(only the join keys may be shared)")
    val l = left.withColumn(SIDE, lit(1)).withColumn(T, col(leftTs))
    val r = right.filter(col(rightTs).isNotNull)
      .withColumn(P, struct(payload.map(col): _*))
      .withColumn(SIDE, lit(0)).withColumn(T, col(rightTs))
      .select((keys ++ Seq(P, SIDE, T)).map(col): _*)
    val u = l.unionByName(r, allowMissingColumns = true)
    // Equal-timestamp right rows must be visible to the left row in
    // both directions (>= / <= semantics): backward puts side=0 first
    // and carries the LAST struct from the preceding frame; forward
    // puts side=1 first and carries the FIRST struct from the following
    // frame. The struct is null on left rows and never null on right
    // rows, so ignoreNulls picks exactly the adjacent whole right row —
    // payload columns can never mix across right rows.
    val (ord, frame) =
      if (backward)
        (Seq(col(T), col(SIDE)),
          (Window.unboundedPreceding, Window.currentRow))
      else
        (Seq(col(T), col(SIDE).desc),
          (Window.currentRow, Window.unboundedFollowing))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(frame._1, frame._2)
    val carry =
      if (backward) last(col(P), ignoreNulls = true)
      else first(col(P), ignoreNulls = true)
    val attached = u.withColumn(P, carry.over(w))
    val joined = attached.filter(col(SIDE) === 1)
      // null-match contract: a left row with an UNKNOWN key or time has
      // no defined as-of partner — SQL-equality semantics, like the
      // equi-join every as-of degenerates to. Without this, the window
      // PARTITION BY groups null keys TOGETHER (a null-key left would
      // silently match null-key rights), and a null-ts left under the
      // forward sort sees the whole partition as "after" it.
      .withColumn(P, when(asofMatchable(keys), col(P)))
    val unpacked = payload.foldLeft(joined) { (df, c) =>
      df.withColumn(c, col(P).getField(c))
    }.drop(SIDE, T, P)
    if (inner) unpacked.filter(col(rightTs).isNotNull) else unpacked
  }

  /** True when every join key and the left timestamp are known — the
    * rows an as-of match is defined for (the null-match contract at
    * each carry site).
    */
  private def asofMatchable(keys: Seq[String]): Column =
    (keys.map(col(_).isNotNull) :+ col(T).isNotNull).reduce(_ && _)
}
