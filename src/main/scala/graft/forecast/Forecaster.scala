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
