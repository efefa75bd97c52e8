package graft.core

import org.apache.spark.sql.SparkSession

/** Shared store-lifecycle plumbing for the parquet side-stores (LM,
  * BM25 stats, signature indexes): never rewrite a serving store in
  * place — land the successor beside it and swap.
  */
object Stores {

  /** Swap a named set of Hive partitions of `liveDir` for their
    * successors under `nextDir` (which holds `partCol=v` subdirs for
    * the partitions that still have rows): each live `partCol=v` dir
    * moves ASIDE (under `nextDir/_old_…`) before its successor renames
    * in — nothing is DELETED until its replacement is in place, so no
    * crash window loses a partition's rows (a crash mid-swap leaves
    * the pre-swap data recoverable under the `_old_` name; the
    * promoteNext discipline applied per partition). A partition with
    * NO successor dir stays out, which is how a removal empties one.
    * Untouched partitions are never listed, read, or moved. Re-running
    * the same logical operation converges (the caller re-derives
    * `nextDir` from the already-partially-updated live data, so
    * converged partitions rewrite to themselves). One writer at a
    * time; `nextDir` — asides included — is removed at the end. */
  def swapPartitions(spark: SparkSession, liveDir: String,
                     nextDir: String, partCol: String,
                     values: Seq[Long], who: String): Unit = {
    val live = new org.apache.hadoop.fs.Path(liveDir)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    values.foreach { v =>
      val lp = new org.apache.hadoop.fs.Path(s"$liveDir/$partCol=$v")
      val op = new org.apache.hadoop.fs.Path(s"$nextDir/_old_$partCol=$v")
      val np = new org.apache.hadoop.fs.Path(s"$nextDir/$partCol=$v")
      if (fs.exists(lp))
        require(fs.rename(lp, op), s"$who: could not move $lp aside")
      if (fs.exists(np))
        require(fs.rename(np, lp), s"$who: could not swap $np into $lp")
      require(fs.delete(op, true) || !fs.exists(op),
        s"$who: could not remove superseded $op")
    }
    fs.delete(new org.apache.hadoop.fs.Path(nextDir), true)
    ()
  }

  /** Crash-safe promotion of `${path}_next` over `path`: the old store
    * moves ASIDE before the new one promotes, so no failure window
    * leaves the store absent — a crash leaves either the old store in
    * place, or both (`_old` recoverable). Hadoop rename/delete report
    * failure as a false RETURN, not an exception — an unchecked false
    * would leave the stale store serving after the successor was
    * already built. Fail loudly instead. One writer at a time, the
    * usual append contract. */
  def promoteNext(spark: SparkSession, path: String, who: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(s"${path}_old")
    require(fs.delete(old, true) || !fs.exists(old),
      s"$who: could not clear stale $old")
    require(fs.rename(p, old),
      s"$who: could not move $p aside to $old")
    require(fs.rename(new org.apache.hadoop.fs.Path(s"${path}_next"), p),
      s"$who: could not promote ${path}_next to $p " +
        s"(old store recoverable at $old)")
    require(fs.delete(old, true) || !fs.exists(old),
      s"$who: could not remove superseded $old")
    ()
  }
}
