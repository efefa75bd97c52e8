package graft

/** Throwaway local harness: run named SparkEntry queries at a given sf
  * dir and dump parquet + oracle SQL for a DuckDB spot-check. Not part
  * of the driver contract; deleted before commit when obsolete. */
object ScratchRunner {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2)
    val spark = graft.core.Sessions.local(8)
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      println(f"[scratch] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      SparkEntry.oracleSql.get(name).foreach { sql =>
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/$name.sql"), sql)
      }
      graft.core.Caching.releaseAll()
    }
    spark.stop()
  }
}
