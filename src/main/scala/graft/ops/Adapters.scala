package graft.ops

import graft.core.{Panel, PanelCols}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frame-conversion adapters (reference polars_ts/adapters/huggingface.py:
  * `to_hf_dataset` — one row per series with the target as a list, the
  * format foundation time-series models consume). The external-model
  * integrations themselves (Chronos/TimesFM/torch bridges) are
  * environment-dependent and descoped; the conversion surface is the
  * portable part. */
object Adapters {

  /** Long panel → one nested row per series:
    * `[id (string), target array<double>, ts array, start (string)]`. */
  def toSeriesDataset(df: DataFrame)(implicit pc: PanelCols): DataFrame =
    Panel.grouped(df)
      .select(pc.idCol.cast("string").as("id"),
        col("ys").as("target"), col("ts"),
        date_format(element_at(col("ts"), 1), "yyyy-MM-dd HH:mm:ss").as("start"))

  /** Inverse: nested series rows → long panel `[id, ds, y]`. */
  def fromSeriesDataset(ds: DataFrame)(implicit pc: PanelCols): DataFrame =
    ds.select(col("id").as(pc.id),
        posexplode(arrays_zip(col("ts"), col("target"))).as(Seq("__i", "__s")))
      .select(pc.idCol, col("__s.ts").as(pc.time), col("__s.target").as(pc.target))

  /** RL environment for forecast-based decision making (reference
    * adapters/rl_env.py:10-86): observation = `windowSize` recent values
    * + the current forecast; `step(action)` returns (obs, reward, done,
    * (actual, forecast)) with reward defaulting to −|actual − action|.
    * The reference exposes the gymnasium step/reset protocol — the
    * Python-gym binding itself is the only part that cannot exist on the
    * JVM; the environment contract is this class. */
  final class ForecastEnv(
      data: Array[Double], forecasts: Array[Double], windowSize: Int = 10,
      rewardFn: (Double, Double, Double) => Double =
        (action, actual, _) => -math.abs(actual - action)) extends Serializable {
    require(data.length > windowSize, "data must be longer than windowSize")
    private var step0 = 0
    val maxSteps: Int = data.length - windowSize

    final case class Step(obs: Array[Double], reward: Double, done: Boolean,
        actual: Double, forecast: Double)

    private def obs(): Array[Double] = {
      val recent = data.slice(step0, step0 + windowSize)
      val f = if (step0 + windowSize < forecasts.length)
        forecasts(step0 + windowSize) else 0.0
      recent :+ f
    }

    def reset(): Array[Double] = { step0 = 0; obs() }

    def step(action: Double): Step = {
      val idx = windowSize + step0
      val actual = data(idx)
      val forecast = forecasts(idx)
      val reward = rewardFn(action, actual, forecast)
      step0 += 1
      val done = step0 >= maxSteps
      Step(if (done) new Array[Double](windowSize + 1) else obs(),
        reward, done, actual, forecast)
    }
  }

  /** Distributed policy rollout: one [[ForecastEnv]] episode per series
    * (naive one-step forecasts; policy acts on the observation). Runs the
    * real reset/step loop inside a per-series map — embarrassingly
    * parallel, no shuffle beyond the grouped panel. Output:
    * `[id, steps, total_reward]`. */
  def rolloutNaive(df: DataFrame, windowSize: Int = 10,
      policy: Array[Double] => Double = o => o.last)(
      implicit pc: PanelCols): DataFrame = {
    val rollUdf = udf((ys: Seq[Double]) => {
      val data = ys.toArray
      // naive forecast: previous value (index 0 has no predecessor → 0.0)
      val fc = Array.tabulate(data.length)(i => if (i == 0) 0.0 else data(i - 1))
      val env = new ForecastEnv(data, fc, windowSize)
      var o = env.reset()
      var total = 0.0
      var steps = 0
      var done = false
      while (!done) {
        val s = env.step(policy(o))
        total += s.reward
        steps += 1
        o = s.obs
        done = s.done
      }
      (steps, total)
    })
    Panel.grouped(df).select(pc.idCol.as(pc.id), col("ys"))
      .select(col(pc.id), rollUdf(col("ys")).as("__r"))
      .select(col(pc.id), col("__r._1").as("steps"),
        round(col("__r._2") + lit(1e-9), 6).as("total_reward"))
  }
}
