package graft.kernels

/** Local-level Kalman filter + RTS smoother (reference
  * polars_ts/bayesian/kalman.py:54-265, scalar state case). */
object Kalman {

  /** Returns (filtered, smoothed) state means per observation. */
  def filterSmooth(y: Array[Double], q: Double = 1e-3, r: Double = 1.0)
      : (Array[Double], Array[Double]) = {
    val n = y.length
    if (n == 0) return (Array.empty, Array.empty)
    val xf = new Array[Double](n) // filtered mean
    val pf = new Array[Double](n) // filtered var
    val xp = new Array[Double](n) // predicted mean
    val pp = new Array[Double](n) // predicted var
    var x = y(0); var p = 1.0
    var t = 0
    while (t < n) {
      // predict
      val xPred = x
      val pPred = p + q
      xp(t) = xPred; pp(t) = pPred
      // update
      val k = pPred / (pPred + r)
      x = xPred + k * (y(t) - xPred)
      p = (1.0 - k) * pPred
      xf(t) = x; pf(t) = p
      t += 1
    }
    // RTS smoother
    val xs = new Array[Double](n)
    xs(n - 1) = xf(n - 1)
    var ps = pf(n - 1)
    t = n - 2
    while (t >= 0) {
      val c = pf(t) / pp(t + 1)
      xs(t) = xf(t) + c * (xs(t + 1) - xp(t + 1))
      ps = pf(t) + c * c * (ps - pp(t + 1))
      t -= 1
    }
    (xf, xs)
  }
}
