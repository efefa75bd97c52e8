package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Custom cross-batch state (SURVEY.md §2.8 ST7 extension): the
  * reference is deliberately stateless per micro-batch; the natural
  * next capability a production detector needs is "alert only after k
  * CONSECUTIVE anomalous flows from the same source", which requires
  * keyed state that survives batches — `KeyValueGroupedDataset
  * .mapGroupsWithState`, the idiomatic Structured Streaming primitive.
  *
  * State is O(active keys); a processing-time timeout evicts idle keys
  * so the state store cannot grow unboundedly (the scale failure mode
  * of naive keyed state).
  */
object Stateful {

  /** Per-key run-length state. */
  final case class RunState(current: Int, max: Int)

  /** (key, current consecutive-anomaly run, historical max run). */
  final case class RunUpdate(key: String, run: Int, max_run: Int)

  /** Track consecutive-anomaly runs per key across micro-batches.
    * `scored` must carry `keyCol` and a `prediction` column
    * ("anomaly"/"normal"). Emits one update per key per batch. Use with
    * outputMode("update").
    *
    * `timeout = Some("10 minutes")` evicts idle keys (bounded state) —
    * note a processing-time timeout makes the engine schedule EXTRA
    * empty micro-batches on the trigger cadence to fire evictions, so
    * pair it with a real `Trigger.ProcessingTime`, never the default
    * 0ms trigger (a busy loop — and `processAllAvailable` in tests will
    * never settle). `None` keeps state until explicitly reset. */
  def anomalyRuns(scored: DataFrame, keyCol: String,
                  timeout: Option[String] = None): Dataset[RunUpdate] = {
    val spark = scored.sparkSession
    import spark.implicits._
    val conf =
      if (timeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    scored.selectExpr(keyCol, "prediction").as[(String, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[RunState, RunUpdate](conf) {
        (key: String, rows: Iterator[(String, String)],
         state: GroupState[RunState]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            RunUpdate(key, 0, last.max)
          } else {
            var st = state.getOption.getOrElse(RunState(0, 0))
            rows.foreach { case (_, pred) =>
              st =
                if (pred == "anomaly") {
                  val run = st.current + 1
                  RunState(run, math.max(st.max, run))
                } else RunState(0, st.max)
            }
            state.update(st)
            timeout.foreach(state.setTimeoutDuration)
            RunUpdate(key, st.current, st.max)
          }
      }
  }
}
