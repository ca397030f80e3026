package graft.forecast

import org.scalatest.funsuite.AnyFunSuite

import java.time.LocalDate

class ForecasterSpec extends AnyFunSuite {

  private val start = LocalDate.of(2024, 2, 1)

  test("recovers a pure linear trend exactly") {
    val series = (0 until 28).map(i => (start.plusDays(i.toLong), 100.0 + 5.0 * i))
    val fit = Forecaster.fit(series)
    assert(math.abs(fit.slope - 5.0) < 1e-9)
    val Seq((d, v)) = fit.predict(1)
    assert(d == start.plusDays(28))
    assert(math.abs(v - (100.0 + 5.0 * 28)) < 1e-6)
    assert(fit.metrics.mae < 1e-9 && fit.metrics.mse < 1e-9)
  }

  test("captures day-of-week seasonality on top of trend") {
    // value = 10*t + (50 on Saturdays)
    val series = (0 until 35).map { i =>
      val d = start.plusDays(i.toLong)
      val dow = if (d.getDayOfWeek == java.time.DayOfWeek.SATURDAY) 50.0 else 0.0
      (d, 10.0 * i + dow)
    }
    val fit = Forecaster.fit(series)
    // next Saturday prediction must carry the bump
    val preds = fit.predict(7)
    val sat = preds.find(_._1.getDayOfWeek == java.time.DayOfWeek.SATURDAY).get
    val fri = preds.find(_._1.getDayOfWeek == java.time.DayOfWeek.FRIDAY).get
    assert(sat._2 - fri._2 > 30.0, s"saturday bump lost: $sat vs $fri")
    assert(fit.metrics.mae < 10.0)
  }

  test("seasonal fit recovers a piecewise-linear trend (changepoint)") {
    // slope +4 for 60 days, then slope -2: the relu changepoint columns
    // must bend the trend; a single global OLS line cannot track this.
    val series = (0 until 120).map { i =>
      val y = if (i < 60) 100.0 + 4.0 * i else 100.0 + 4.0 * 60 - 2.0 * (i - 60)
      (start.plusDays(i.toLong), y)
    }
    val fit = Forecaster.fitSeasonal(series, weeklyOrder = 0)
    assert(fit.metrics.mae < 2.0, s"piecewise trend not tracked: ${fit.metrics}")
    // extrapolation carries the FINAL slope (≈ -2), not the average
    val preds = fit.predict(10)
    val drop = preds.head._2 - preds.last._2
    assert(drop > 9.0 && drop < 27.0, s"final slope lost: drop=$drop")
    val straight = Forecaster.fit(series)
    assert(fit.metrics.mae < straight.metrics.mae / 5,
      "changepoints should beat the straight-line fit by a wide margin")
  }

  test("seasonal fit captures weekly shape exactly via Fourier order 3") {
    // order-3 weekly Fourier = 7 parameters on 7 weekday points: any weekly
    // pattern is representable exactly, including a one-day spike.
    val series = (0 until 70).map { i =>
      val d = start.plusDays(i.toLong)
      val bump = if (d.getDayOfWeek == java.time.DayOfWeek.SATURDAY) 50.0 else 0.0
      (d, 10.0 + 2.0 * i + bump)
    }
    val fit = Forecaster.fitSeasonal(series)
    assert(fit.metrics.mae < 1.0, s"weekly shape not captured: ${fit.metrics}")
    val preds = fit.predict(7)
    val sat = preds.find(_._1.getDayOfWeek == java.time.DayOfWeek.SATURDAY).get
    val fri = preds.find(_._1.getDayOfWeek == java.time.DayOfWeek.FRIDAY).get
    assert(sat._2 - fri._2 > 40.0, s"saturday bump lost: $sat vs $fri")
  }

  test("seasonal fit handles gapped (business-day) series via day offsets") {
    // weekdays only — the weekly phase must come from the calendar, not
    // the row index
    val series = (0 until 100).map(i => start.plusDays(i.toLong))
      .filter(d => d.getDayOfWeek.getValue <= 5)
      .zipWithIndex.map { case (d, _) =>
        val mondayBump = if (d.getDayOfWeek == java.time.DayOfWeek.MONDAY) 20.0 else 0.0
        (d, 5.0 + mondayBump)
      }
    val fit = Forecaster.fitSeasonal(series)
    assert(fit.metrics.mae < 1.0, s"gapped weekly fit failed: ${fit.metrics}")
  }

  test("seasonal fit recovers a yearly cycle on a 3-year span") {
    // value = trend + annual sine; with span >= 2 years the yearly
    // Fourier block activates and must absorb the cycle
    val series = (0 until 1096).map { i =>
      val phase = 2.0 * math.Pi * i / 365.25
      (start.plusDays(i.toLong), 200.0 + 0.1 * i + 40.0 * math.sin(phase))
    }
    val fit = Forecaster.fitSeasonal(series, weeklyOrder = 0)
    assert(fit.yearlyOrder > 0, "yearly block must activate at 3 years of span")
    assert(fit.metrics.mae < 4.0, s"annual cycle not absorbed: ${fit.metrics}")
    val straight = Forecaster.fit(series)
    assert(fit.metrics.mae < straight.metrics.mae / 3,
      "yearly Fourier should beat trend+DOW by a wide margin on seasonal data")
    // forecast half a year out lands on the falling side of the sine:
    // prediction must track the cycle, not just the trend
    val pred = fit.predict(183).last._2
    val t = 1095 + 183
    val truth = 200.0 + 0.1 * t + 40.0 * math.sin(2.0 * math.Pi * t / 365.25)
    assert(math.abs(pred - truth) < 15.0, s"6-month-out pred=$pred truth=$truth")
  }

  test("seasonal fit: yearly disabled on short spans, deterministic output") {
    val series = (0 until 90).map(i => (start.plusDays(i.toLong), 50.0 + 0.5 * i))
    val a = Forecaster.fitSeasonal(series)
    val b = Forecaster.fitSeasonal(series)
    assert(a.yearlyOrder == 0, "yearly seasonality must need >= 2 periods of span")
    assert(a.beta.toSeq == b.beta.toSeq, "fit must be bit-deterministic")
    assert(a.predict(5).map(_._2) == b.predict(5).map(_._2))
  }

  test("seasonal fit degenerates gracefully: single point") {
    val one = Forecaster.fitSeasonal(Seq((start, 42.0)))
    assert(one.changepoints.isEmpty && one.weeklyOrder == 0 && one.yearlyOrder == 0)
    assert(math.abs(one.predict(1).head._2 - 42.0) < 1e-9)
  }

  test("degenerate inputs: single point, unsorted input") {
    val one = Forecaster.fit(Seq((start, 42.0)))
    assert(one.slope == 0.0)
    assert(math.abs(one.predict(1).head._2 - 42.0) < 1e-9)
    val shuffled = Seq(
      (start.plusDays(2), 3.0), (start, 1.0), (start.plusDays(1), 2.0))
    val fit = Forecaster.fit(shuffled)
    assert(math.abs(fit.slope - 1.0) < 1e-9) // sorted internally
  }
}
