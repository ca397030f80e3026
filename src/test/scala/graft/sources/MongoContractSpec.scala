package graft.sources

import graft.SparkTestBase
import graft.model.CandyModel
import graft.pipeline.CandyConfig
import graft.sources.testmongo.FakeMongoProvider
import org.scalatest.funsuite.AnyFunSuite

import java.time.LocalDate
import scala.jdk.CollectionConverters._

/** Machine-checked boundary for the S1 Mongo branch: the sandbox has no
  * MongoDB server or connector jar, so [[FakeMongoProvider]] registers
  * under the connector's `mongodb` short name (test classpath only) and
  * `transactionsDayMongo` EXECUTES against it — pinning everything the
  * engine controls: format resolution, the declared-not-inferred schema,
  * the exact option map (reference `data_processor.py:103-120` parity:
  * URI, comment-stripped database name, `<prefix><yyyyMMdd>` per-day
  * collection), and the decoration columns. What remains unexercised is
  * exactly the wire protocol — the part only a server integration test
  * can cover, and the part the reference delegates to the same
  * connector.
  */
class MongoContractSpec extends AnyFunSuite with SparkTestBase {

  private def cfg(extra: (String, String)*): CandyConfig =
    CandyConfig.fromEnv(Map(
      "MONGODB_URI" -> "mongodb://mongo.example:27017",
      "MONGO_DB" -> "candy_store_5 # production", // comment-stripping quirk
      "MONGO_COLLECTION_PREFIX" -> "tx_",
      "MONGO_ENABLED" -> "true",
      "CANDY_DATA_DIR" -> "/nonexistent") ++ extra.toMap)

  test("transactionsDayMongo executes against format(\"mongodb\") with the reference option map") {
    FakeMongoProvider.lastProperties = null
    val day = LocalDate.of(2024, 2, 4)
    val df = CandySources.transactionsDayMongo(spark, cfg(), day)
    val rows = df.collect()
    assert(rows.isEmpty, "fake connector serves an empty batch")

    val props = FakeMongoProvider.lastProperties
    assert(props != null, "format(\"mongodb\") must resolve to the registered connector")
    val opts = props.asScala
    assert(opts("connection.uri") == "mongodb://mongo.example:27017")
    assert(opts("database") == "candy_store_5") // comment stripped, trimmed
    assert(opts("collection") == "tx_20240204") // <prefix><yyyyMMdd>
  }

  test("declared schema reaches the connector unchanged (no inference pass)") {
    // FakeMongoProvider.inferSchema THROWS — reaching this assertion at
    // all proves no sampling/inference call was made against the server.
    val df = CandySources.transactionsDayMongo(
      spark, cfg(), LocalDate.of(2024, 2, 4))
    val base = df.drop("tx_seq", "day_idx")
    assert(base.schema == CandyModel.transactionSchema,
      "schema must be the declared transaction schema, not inferred")
    assert(df.columns.takeRight(2).toSeq == Seq("tx_seq", "day_idx"),
      "fixture-path decoration columns kept for API parity")
  }

  test("config-selected source union composes one collection per day") {
    val out = CandySources.transactions(
      spark, cfg(), LocalDate.of(2024, 2, 4), LocalDate.of(2024, 2, 6))
    assert(out.collect().isEmpty)
    // the LAST captured getTable call is day 3 of the union
    assert(FakeMongoProvider.lastProperties.asScala("collection") == "tx_20240206")
  }
}
