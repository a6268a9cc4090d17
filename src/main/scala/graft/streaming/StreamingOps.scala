package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured-Streaming online learners (reference polars_ts/streaming/):
  * the reference's `partial_fit` state dicts become per-key
  * `flatMapGroupsWithState` state; watermark/event-time semantics are new
  * capability on top (SURVEY §2.13 notes the reference has none).
  */
object StreamingOps {

  case class Obs(uniqueId: String, ts: Timestamp, y: Double)
  case class EtsState(level: Double, trend: Double, n: Long)
  case class EtsOutput(uniqueId: String, ts: Timestamp, y: Double,
      level: Double, trend: Double, forecastNext: Double)

  /** Streaming Holt (SES when beta=0): folds each new observation through
    * the update equations, emitting the one-step-ahead forecast
    * (reference streaming/ets.py:13-280 `partial_fit`/`predict`). */
  def streamingEts(input: Dataset[Obs], alpha: Double = 0.3, beta: Double = 0.1)
      : Dataset[EtsOutput] = {
    import input.sparkSession.implicits._
    input.groupByKey(_.uniqueId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (id: String, rows: Iterator[Obs], state: GroupState[EtsState]) => {
          var s = state.getOption.getOrElse(EtsState(0.0, 0.0, 0L))
          val out = rows.toSeq.sortBy(_.ts.getTime).map { o =>
            s =
              if (s.n == 0L) EtsState(o.y, 0.0, 1L)
              else if (s.n == 1L) EtsState(o.y, o.y - s.level, 2L) // two-point init, matches Ets.holt
              else {
                val prevLevel = s.level
                val level = alpha * o.y + (1.0 - alpha) * (s.level + s.trend)
                val trend = beta * (level - prevLevel) + (1.0 - beta) * s.trend
                EtsState(level, trend, s.n + 1)
              }
            EtsOutput(id, o.ts, o.y, s.level, s.trend, s.level + s.trend)
          }
          state.update(s)
          out.iterator
        })
  }

  case class KalmanState(x: Double, p: Double, n: Long)
  case class KalmanOutput(uniqueId: String, ts: Timestamp, y: Double,
      filtered: Double, variance: Double)

  /** Streaming local-level Kalman filter: predict/update per observation
    * (reference streaming/kalman.py:8-158). q = process var, r = obs var. */
  def streamingKalman(input: Dataset[Obs], q: Double = 1e-3, r: Double = 1.0)
      : Dataset[KalmanOutput] = {
    import input.sparkSession.implicits._
    input.groupByKey(_.uniqueId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (id: String, rows: Iterator[Obs], state: GroupState[KalmanState]) => {
          var s = state.getOption.getOrElse(KalmanState(0.0, 1e6, 0L))
          val out = rows.toSeq.sortBy(_.ts.getTime).map { o =>
            val pPred = s.p + q
            val k = pPred / (pPred + r)
            val x = s.x + k * (o.y - s.x)
            val p = (1.0 - k) * pPred
            s = KalmanState(x, p, s.n + 1)
            KalmanOutput(id, o.ts, o.y, x, p)
          }
          state.update(s)
          out.iterator
        })
  }

  /** Convenience: run a batch panel through the same update equations (the
    * reference's incremental-batch mode) — used by tests and the query
    * contract, where no streaming source exists. */
  def etsBatch(spark: SparkSession, df: DataFrame, idCol: String, tsCol: String,
      yCol: String, alpha: Double = 0.3, beta: Double = 0.1): DataFrame = {
    import spark.implicits._
    val ds = df.select(col(idCol).cast("string").as("uniqueId"),
      col(tsCol).cast("timestamp").as("ts"), col(yCol).cast("double").as("y"))
      .as[Obs]
    // same fold, expressed over grouped batch data
    val folded = ds.groupByKey(_.uniqueId).flatMapGroups { (id, rows) =>
      var s = EtsState(0.0, 0.0, 0L)
      rows.toSeq.sortBy(_.ts.getTime).map { o =>
        s =
          if (s.n == 0L) EtsState(o.y, 0.0, 1L)
          else if (s.n == 1L) EtsState(o.y, o.y - s.level, 2L) // two-point init, matches Ets.holt
          else {
            val prevLevel = s.level
            val level = alpha * o.y + (1.0 - alpha) * (s.level + s.trend)
            val trend = beta * (level - prevLevel) + (1.0 - beta) * s.trend
            EtsState(level, trend, s.n + 1)
          }
        EtsOutput(id, o.ts, o.y, s.level, s.trend, s.level + s.trend)
      }.iterator
    }
    folded.toDF()
  }
}
