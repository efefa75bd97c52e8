package graft.core

import org.apache.spark.sql.SparkSession

/** Shared store-lifecycle plumbing for the parquet side-stores (LM,
  * BM25 stats, signature indexes): never rewrite a serving store in
  * place — land the successor beside it and swap.
  */
object Stores {

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
