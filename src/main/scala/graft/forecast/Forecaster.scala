package graft.forecast

import java.time.LocalDate

/** Deterministic univariate forecaster replacing the reference's Prophet
  * dependency (reference time_series.py:7-67; SURVEY.md §2.9).
  *
  * The reference's CI never diffs forecast *content* (only existence and
  * schema, .gitlab-ci.yml:178-179), so parity requires the same interface
  * — fit / predict / metrics — not the same numbers. This implementation is
  * Prophet's additive-model skeleton (cf. Taylor & Letham, "Forecasting at
  * Scale", 2017) reduced to its deterministic core: ordinary-least-squares
  * linear trend plus day-of-week seasonal offsets estimated from residual
  * means. Fully reproducible across platforms, no native deps.
  *
  * Driver-side by design: the input is one row per business day (a few
  * thousand points at most after the daily rollup), so distribution would
  * be overhead — mirrors the reference's collect-then-fit shape
  * (data_processor.py:533-547) without Prophet's Stan subprocess.
  */
object Forecaster {

  final case class Metrics(mae: Double, mse: Double)

  final case class Fitted(
      intercept: Double,
      slope: Double,
      dowOffsets: Array[Double], // index = java.time.DayOfWeek ordinal (0=Mon)
      dates: Array[LocalDate],
      values: Array[Double]) {

    private def predictAt(t: Int, date: LocalDate): Double =
      intercept + slope * t + dowOffsets(date.getDayOfWeek.getValue - 1)

    /** Forecast `horizon` days past the last training date. */
    def predict(horizon: Int): Seq[(LocalDate, Double)] = {
      val last = dates.last
      val n = values.length
      (1 to horizon).map { i =>
        val d = last.plusDays(i.toLong)
        d -> predictAt(n - 1 + i, d)
      }
    }

    /** In-sample MAE/MSE (reference time_series.py:45-67, printed there too). */
    def metrics: Metrics = {
      val errs = dates.zip(values).zipWithIndex.map { case ((d, y), t) =>
        y - predictAt(t, d)
      }
      Metrics(
        mae = errs.map(math.abs).sum / errs.length,
        mse = errs.map(e => e * e).sum / errs.length)
    }
  }

  /** Prophet-structure additive fit: piecewise-linear trend with
    * changepoints plus Fourier weekly (and, when the span supports it,
    * yearly) seasonality — the full model family of the reference's
    * Prophet call (time_series.py:7-67), estimated deterministically.
    *
    * Model (Taylor & Letham 2017, §3):
    *   y(t) = g(t) + s(t),
    *   g(t) = k·t + m + Σ_j δ_j·max(0, t − s_j)        (trend, changepoints s_j)
    *   s(t) = Σ_k a_k sin(2πkt/P) + b_k cos(2πkt/P)    (per seasonal period P)
    * Prophet fits this by MAP with a Laplace prior on δ via Stan; here the
    * same design matrix is solved in closed form with a ridge penalty on
    * the changepoint slopes (the L2 analogue of Prophet's sparsity prior),
    * which keeps the fit exactly reproducible across platforms. The time
    * axis is calendar days since the first observation, so gapped series
    * (business days) phase the Fourier terms correctly, as Prophet does.
    *
    * Defaults mirror Prophet's: changepoints uniform over the first 80% of
    * the history (≤25), weekly order 3, yearly order 6 enabled only when
    * the span covers ≥ two periods.
    */
  final case class SeasonalFitted(
      beta: Array[Double],
      changepoints: Array[Double], // in day-offset units
      weeklyOrder: Int,
      yearlyOrder: Int,
      dates: Array[LocalDate],
      values: Array[Double]) {

    import java.time.temporal.ChronoUnit.DAYS

    private[forecast] def features(t: Double): Array[Double] = {
      val out = Array.newBuilder[Double]
      out += 1.0
      out += t
      changepoints.foreach(s => out += math.max(0.0, t - s))
      for (k <- 1 to weeklyOrder) {
        val w = 2.0 * math.Pi * k * t / 7.0
        out += math.sin(w); out += math.cos(w)
      }
      for (k <- 1 to yearlyOrder) {
        val w = 2.0 * math.Pi * k * t / 365.25
        out += math.sin(w); out += math.cos(w)
      }
      out.result()
    }

    private def predictAt(t: Double): Double = {
      val x = features(t)
      var acc = 0.0
      var i = 0
      while (i < x.length) { acc += x(i) * beta(i); i += 1 }
      acc
    }

    /** Forecast `horizon` calendar days past the last training date. */
    def predict(horizon: Int): Seq[(LocalDate, Double)] = {
      val t0 = dates.head
      (1 to horizon).map { i =>
        val d = dates.last.plusDays(i.toLong)
        d -> predictAt(DAYS.between(t0, d).toDouble)
      }
    }

    /** In-sample MAE/MSE, same contract as [[Fitted.metrics]]. */
    def metrics: Metrics = {
      val t0 = dates.head
      val errs = dates.zip(values).map { case (d, y) =>
        y - predictAt(DAYS.between(t0, d).toDouble)
      }
      Metrics(
        mae = errs.map(math.abs).sum / errs.length,
        mse = errs.map(e => e * e).sum / errs.length)
    }
  }

  def fitSeasonal(
      series: Seq[(LocalDate, Double)],
      maxChangepoints: Int = 25,
      weeklyOrder: Int = 3,
      yearlyOrder: Int = 6): SeasonalFitted = {
    require(series.nonEmpty, "cannot fit an empty series")
    import java.time.temporal.ChronoUnit.DAYS
    val sorted = series.sortBy(_._1)
    val dates = sorted.map(_._1).toArray
    val values = sorted.map(_._2).toArray
    val n = values.length
    val t0 = dates.head
    val t = dates.map(d => DAYS.between(t0, d).toDouble)
    val span = t.last

    // Prophet defaults: changepoints uniform over the first 80% of history;
    // a seasonal component needs ≥ 2 full periods of span to identify.
    val nCp = math.min(maxChangepoints, math.max(0, n / 4))
    val cps = Array.tabulate(nCp)(j => span * 0.8 * (j + 1) / (nCp + 1))
    val wOrd = if (span >= 14.0 && n >= 14) weeklyOrder else 0
    val yOrd = if (span >= 730.5) yearlyOrder else 0

    val fitted = SeasonalFitted(Array.empty, cps, wOrd, yOrd, dates, values)
    val x = t.map(fitted.features)
    val p = x.head.length

    // Normal equations with a two-scale ridge (the L2 analogue of
    // Prophet's priors): the changepoint slopes get a REAL penalty —
    // Prophet's changepoint_prior_scale — because nearly-free relu
    // columns chase seasonal residue and corrupt the final-segment slope
    // that extrapolation rides on; the Fourier block gets only an
    // identifiability epsilon (seasonality_prior_scale is loose in
    // Prophet too). Both scale with the Gram trace so they are unit-free.
    val g = Array.ofDim[Double](p, p + 1)
    for (row <- x.indices; i <- 0 until p) {
      val xi = x(row)(i)
      var j = 0
      while (j < p) { g(i)(j) += xi * x(row)(j); j += 1 }
      g(i)(p) += xi * values(row)
    }
    var trace = 0.0
    for (i <- 0 until p) trace += g(i)(i)
    val cpLambda = 1e-4 * trace / p
    val fourierLambda = 1e-8 * trace / p
    for (i <- 2 until 2 + nCp) g(i)(i) += cpLambda
    for (i <- 2 + nCp until p) g(i)(i) += fourierLambda

    fitted.copy(beta = solve(g, p))
  }

  /** Gaussian elimination with partial pivoting on the p×(p+1) augmented
    * system — deterministic, p ≤ 1+1+25+2·(3+6) = 45 here. Singular pivots
    * (fully degenerate designs, e.g. n=1) zero their coefficient.
    */
  private def solve(g: Array[Array[Double]], p: Int): Array[Double] = {
    for (col <- 0 until p) {
      var piv = col
      for (r <- col + 1 until p)
        if (math.abs(g(r)(col)) > math.abs(g(piv)(col))) piv = r
      val tmp = g(col); g(col) = g(piv); g(piv) = tmp
      val d = g(col)(col)
      if (math.abs(d) > 1e-12) {
        for (r <- 0 until p if r != col) {
          val f = g(r)(col) / d
          if (f != 0.0) {
            var j = col
            while (j <= p) { g(r)(j) -= f * g(col)(j); j += 1 }
          }
        }
      }
    }
    Array.tabulate(p) { i =>
      if (math.abs(g(i)(i)) > 1e-12) g(i)(p) / g(i)(i) else 0.0
    }
  }

  /** Fit trend + weekly seasonality on (date, value) pairs, ordered by date. */
  def fit(series: Seq[(LocalDate, Double)]): Fitted = {
    require(series.nonEmpty, "cannot fit an empty series")
    val sorted = series.sortBy(_._1)
    val dates = sorted.map(_._1).toArray
    val values = sorted.map(_._2).toArray
    val n = values.length

    // OLS on t = 0..n-1
    val tMean = (n - 1) / 2.0
    val yMean = values.sum / n
    val den = (0 until n).map(t => (t - tMean) * (t - tMean)).sum
    val slope =
      if (den == 0) 0.0
      else (0 until n).map(t => (t - tMean) * (values(t) - yMean)).sum / den
    val intercept = yMean - slope * tMean

    // Day-of-week seasonal component = mean detrended residual per weekday.
    val resByDow = Array.fill(7)(List.empty[Double])
    for (t <- 0 until n) {
      val dow = dates(t).getDayOfWeek.getValue - 1
      resByDow(dow) ::= values(t) - (intercept + slope * t)
    }
    val dowOffsets = resByDow.map(rs => if (rs.isEmpty) 0.0 else rs.sum / rs.size)

    Fitted(intercept, slope, dowOffsets, dates, values)
  }
}
