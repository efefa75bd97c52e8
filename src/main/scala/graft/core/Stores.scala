package graft.core

import org.apache.spark.sql.SparkSession

/** Shared store-lifecycle plumbing for the parquet side-stores (LM,
  * BM25 stats, signature indexes): never rewrite a serving store in
  * place — land the successor beside it and swap.
  */
object Stores {

  /** Swap a named set of Hive partitions of `liveDir` for their
    * successors under `nextDir` (which holds `partCol=v` subdirs for
    * the partitions that still have rows): each live `partCol=v` dir is
    * deleted and the successor renamed in — a partition with NO
    * successor dir stays deleted, which is how a removal empties one.
    * Untouched partitions are never listed, read, or moved. The loop
    * is idempotent under re-runs of the same logical operation (the
    * caller re-derives `nextDir` from the already-partially-updated
    * live data, so converged partitions rewrite to themselves). One
    * writer at a time; `nextDir` is removed afterwards. */
  def swapPartitions(spark: SparkSession, liveDir: String,
                     nextDir: String, partCol: String,
                     values: Seq[Long], who: String): Unit = {
    val live = new org.apache.hadoop.fs.Path(liveDir)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    values.foreach { v =>
      val lp = new org.apache.hadoop.fs.Path(s"$liveDir/$partCol=$v")
      val np = new org.apache.hadoop.fs.Path(s"$nextDir/$partCol=$v")
      require(fs.delete(lp, true) || !fs.exists(lp),
        s"$who: could not clear $lp")
      if (fs.exists(np))
        require(fs.rename(np, lp), s"$who: could not swap $np into $lp")
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
