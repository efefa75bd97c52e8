package graft

/** Plan-capture tool for the optimization rounds: writes
  * `.explain("formatted")` for selected SparkEntry queries to
  * `<outDir>/<key>_<suffix>.txt` — the evidence files the round
  * deliverables require (plans/r18/<query>_before.txt / _after.txt).
  *
  * Usage: runMain graft.Plans <sfDir> <outDir> <suffix> [k1,k2,...]
  * (no key list = every declared query).
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse("plans/r18")
    val suffix = args.lift(2).getOrElse("before")
    val only: Option[Set[String]] = args.lift(3)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = graft.core.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.forall(_.contains(name))) {
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
            txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          println(s"[plans] wrote $name")
        } catch { case e: Throwable =>
          System.err.println(s"[plans] $name failed: ${e.getMessage}")
        } finally { graft.core.Caching.releaseAll(); () }
      }
    }
    spark.stop()
  }
}
