package graft.pipeline

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}
import java.time.LocalDate

/** The DAG-shaped orchestration must be a pure re-ordering of the same
  * work: every report it writes is byte-identical to the monolithic
  * [[CandyPipeline]] run over the same inputs.
  */
class CandyStagedRunnerSpec extends AnyFunSuite with SparkTestBase {

  private val dataDir = "/root/reference/data/dataset_5"
  private val files = Seq(
    "order_line_items.csv", "products_updated.csv", "orders.csv",
    "daily_summary.csv", "sales_profit_forecast.csv")

  private def tmp(prefix: String) = {
    val d = Files.createTempDirectory(prefix).toFile
    d.deleteOnExit(); d.getAbsolutePath
  }

  test("staged runner output is byte-identical to CandyPipeline.run()") {
    val outMono = tmp("candy_mono")
    val outStaged = tmp("candy_staged")
    new CandyPipeline(
      spark, dataDir, outMono,
      LocalDate.of(2024, 2, 1), LocalDate.of(2024, 2, 10)).run()
    val cfg = CandyConfig.fromEnv(Map(
      "CANDY_DATA_DIR" -> dataDir,
      "OUTPUT_PATH" -> outStaged,
      "MONGO_START_DATE" -> "20240201",
      "MONGO_END_DATE" -> "20240210"))
    val runner = new CandyStagedRunner(spark, cfg)
    val t = runner.run()
    assert(t.cancelledLines == 122)
    for (f <- files) {
      val a = Files.readAllBytes(Paths.get(s"$outMono/$f"))
      val b = Files.readAllBytes(Paths.get(s"$outStaged/$f"))
      assert(java.util.Arrays.equals(a, b), s"$f differs between orchestrations")
    }
  }

  test("setup stage fails fast on an inverted date range") {
    val cfg = CandyConfig.fromEnv(Map(
      "CANDY_DATA_DIR" -> dataDir,
      "MONGO_START_DATE" -> "20240210",
      "MONGO_END_DATE" -> "20240201"))
    assertThrows[IllegalArgumentException] {
      new CandyStagedRunner(spark, cfg).setupEnvironment()
    }
  }
}
