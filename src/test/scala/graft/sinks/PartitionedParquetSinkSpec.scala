package graft.sinks

import graft.{SparkTestBase, Tables}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class PartitionedParquetSinkSpec extends AnyFunSuite with SparkTestBase {

  test("writes date= partitions; range read prunes at the partition level") {
    val dir = Files.createTempDirectory("day_part").toString
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    PartitionedParquetSink.writeDayPartitioned(events, "ts", dir)

    val dayDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("date=")).map(_.getName).sorted
    assert(dayDirs.length > 1, dayDirs.mkString(","))

    val (d1, d2) = (dayDirs.head.stripPrefix("date="), dayDirs(1).stripPrefix("date="))
    val ranged = PartitionedParquetSink.readDayRange(spark, dir, d1, d2)
    // pruning must reach the scan: PartitionFilters populated, and the
    // count equals exactly the two days' rows
    val plan = ranged.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(date"), plan)
    val full = spark.read.parquet(dir)
    import org.apache.spark.sql.functions.col
    val expected = full.filter(col("date") === d1 || col("date") === d2).count()
    assert(ranged.count() == expected && expected > 0)
    // round-trip preserves the payload columns
    assert(ranged.columns.toSet.contains("event_type"))
  }
}
