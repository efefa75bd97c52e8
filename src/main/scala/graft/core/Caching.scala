package graft.core

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Session-wide registry of DataFrames persisted inside operators, so
  * long-lived sessions can reclaim storage memory deterministically.
  *
  * Operators that must persist an intermediate (LSH signatures, IVF
  * assignments, shingle sets) register it here via `persistTracked`;
  * harness loops (Bench / Verify, or any caller running many one-shot
  * queries) call `releaseAll()` after materializing each result. Without
  * this, every near-dup/ANN query leaks its cached blocks for the
  * lifetime of the session (spillable, but storage memory still shrinks
  * run over run).
  */
object Caching {
  private val tracked =
    new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()

  /** Persist `ds` at `level` and register it for later `releaseAll`. */
  def persistTracked[T](
      ds: Dataset[T],
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Dataset[T] = {
    val p = ds.persist(level)
    tracked.add(p)
    p
  }

  /** Register an ALREADY-persisted frame for `releaseAll` (for callers
    * that manage persist timing themselves, e.g. iterative loops). */
  def track[T](ds: Dataset[T]): Dataset[T] = {
    tracked.add(ds)
    ds
  }

  /** Run `f`, then unpersist ONLY the frames tracked DURING it,
    * leaving frames tracked before (other queries' caches in a shared
    * session) untouched. The polite form of `releaseAll` for
    * long-running hosts of one-shot work — e.g. StreamingIngest
    * releases each micro-batch's signature caches this way without
    * dropping a concurrently-held index. Frames tracked by OTHER
    * threads while `f` runs are also released (identity snapshot, not
    * thread ownership) — callers running genuinely concurrent tracked
    * work should own their persists explicitly instead. */
  def scopedRelease[T](f: => T): T = {
    val before = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[Dataset[_], java.lang.Boolean]())
    tracked.forEach(d => before.add(d))
    try f
    finally {
      val it = tracked.iterator()
      while (it.hasNext) {
        val d = it.next()
        if (!before.contains(d)) { it.remove(); d.unpersist(false) }
      }
    }
  }

  /** Unpersist every tracked frame; returns how many were released.
    * Harness-loop API: call BETWEEN one-shot queries (Bench/Verify do),
    * not concurrently with work that still wants its cache — releasing
    * is always safe for correctness (plans recompute) but a release
    * mid-computation silently costs the recompute the persist was
    * avoiding. Long-lived caches (e.g. a reused IVF index) should
    * persist untracked and be released by their owner. */
  def releaseAll(blocking: Boolean = false): Int = {
    var n = 0
    var d = tracked.poll()
    while (d != null) { d.unpersist(blocking); n += 1; d = tracked.poll() }
    n
  }
}
