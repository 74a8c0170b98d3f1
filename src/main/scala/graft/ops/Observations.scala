package graft.ops

import org.apache.spark.sql.Observation

/** Bounded reads of in-job `observe()` metrics.
  *
  * `Observation.get` blocks forever if the listener event carrying the
  * metric row is dropped; every call site here instead polls with a
  * deadline and falls back to an explicit (one extra job, rare path)
  * recomputation. The poll loop lives in one place because the
  * workaround is subtle enough to drift if copied — callers supply
  * only their fallback.
  */
object Observations {

  /** The observation's single BIGINT metric, or None if the listener
    * event never arrives within `timeoutMs`. A null cell (e.g. sum()
    * over an empty input) reads as 0.
    */
  def boundedLong(obs: Observation, timeoutMs: Long = 10000L): Option[Long] = {
    import org.apache.spark.sql.GraftBridge.observationRow
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var row = observationRow(obs) // waits ~100ms internally when empty
    while (row.isEmpty && System.nanoTime() < deadline) row = observationRow(obs)
    // a ZERO-length metrics row can arrive when the observed subtree
    // sits under a join/union branch the executor never produced rows
    // for — treat it like a lost event (caller recomputes), not an
    // index-out-of-bounds crash
    row.filter(_.length > 0)
      .map(r => if (r.isNullAt(0)) 0L else r.getLong(0))
  }
}
