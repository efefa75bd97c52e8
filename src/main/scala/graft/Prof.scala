package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Per-stage profile of one SparkEntry query — the optimization-round
  * stand-in for the Spark UI's stage table (the UI is off in the
  * harness session). Prints, for each completed stage of the timed
  * run: wall duration, task count, total task time, shuffle read/write
  * bytes, spill, and the first line of the stage name.
  *
  * Usage: runMain graft.Prof <key> [sfDir] [passes]
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val key = args.headOption.getOrElse("q01_pricing_summary")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = graft.core.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val fn = SparkEntry.queries(key)

    case class Row(id: Int, name: String, ms: Long, tasks: Int,
                   taskMs: Long, shRead: Long, shWrite: Long,
                   spill: Long, input: Long)
    val rows = mutable.ArrayBuffer.empty[Row]
    val listener = new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted)
          : Unit = {
        val si = ev.stageInfo
        val m = si.taskMetrics
        val dur = (for {
          s <- si.submissionTime; c <- si.completionTime
        } yield c - s).getOrElse(-1L)
        rows += Row(si.stageId, si.name.linesIterator.next(), dur,
          si.numTasks, m.executorRunTime,
          m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten,
          m.memoryBytesSpilled, m.inputMetrics.bytesRead)
      }
    }

    (1 to passes).foreach { p =>
      rows.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      graft.core.Caching.releaseAll()
      spark.sparkContext.removeSparkListener(listener)
      // let straggler stage-completed events land before printing
      Thread.sleep(300)
      println(f"== pass $p: $key wall=$wall%.2f s, ${rows.length} stages")
      rows.sortBy(-_.ms).take(25).foreach { r =>
        println(f"  stage ${r.id}%4d ${r.ms}%6d ms tasks=${r.tasks}%4d " +
          f"taskTime=${r.taskMs}%7d ms shR=${r.shRead}%9d shW=${r.shWrite}%9d " +
          f"spill=${r.spill} in=${r.input}%9d  ${r.name.take(70)}")
      }
    }
    spark.stop()
  }
}
