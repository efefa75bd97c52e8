package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.score.Autoencoder

/** Runnable demo of the streaming scoring pipeline (the library's
  * streaming surface, driven end-to-end): feed JSON flow events through
  * a MemoryStream micro-batch query, print what each sink received.
  * Run: sbt "Test/runMain graft.streaming.StreamDemo"
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val sc = spark.sqlContext
    import spark.implicits._

    val weights = Autoencoder.seededWeights(Seq(4, 4, 2, 4, 4), seed = 1L)
    val stream = MemoryStream[String]
    val normal = new StreamPipeline.CollectingSink
    val anomaly = new StreamPipeline.CollectingSink
    val ckpt = java.nio.file.Files.createTempDirectory("demo_ckpt").toString

    val q = StreamPipeline.run(stream.toDF().toDF("value"), weights,
      threshold = 0.5, normal, anomaly, ckpt)

    def ev(id: Int, dur: Double, label: String): String =
      s"""{"event_id":"e$id","event_type":"network_flow","timestamp":"2026-01-01T00:00:0$id","flow_id":"f$id","flow_duration":$dur,"total_fwd_packets":0.2,"flow_bytes_s":0.1,"packet_length_mean":0.05,"label":"$label"}"""

    stream.addData(ev(1, 0.1, "BENIGN"), ev(2, 500.0, "DoS Hulk"),
      ev(3, 0.05, "BENIGN"))
    q.processAllAvailable()
    stream.addData(ev(4, 800.0, "PortScan"))
    q.processAllAvailable()
    q.stop()

    println(s"[demo] normal rows: ${normal.totalRows}  " +
      s"anomaly rows: ${anomaly.totalRows}")
    (normal.batches ++ anomaly.batches).flatten
      .sortBy(_.getAs[String]("event_id"))
      .foreach { r =>
        println(f"[demo] ${r.getAs[String]("event_id")}%s  " +
          f"label=${r.getAs[String]("label")}%-10s " +
          f"score=${r.getAs[Double]("anomaly_score")}%12.4f  " +
          f"pred=${r.getAs[String]("prediction")}%s  " +
          f"conf=${r.getAs[Double]("confidence")}%.4f")
      }
    spark.stop()
  }
}
