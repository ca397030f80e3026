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
