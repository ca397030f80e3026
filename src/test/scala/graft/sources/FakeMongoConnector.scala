package graft.sources.testmongo

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Test-classpath stand-in for the MongoDB Spark connector, registered
  * under the SAME `mongodb` short name via the DataSourceRegister
  * service file (test resources only — production deployments bring the
  * real connector jar exactly as the reference brings
  * `MYSQL_CONNECTOR_PATH`).
  *
  * Purpose: make `CandySources.transactionsDayMongo` EXECUTABLE in the
  * sandbox so its contract is machine-checked end to end — the
  * `format("mongodb")` resolution, the declared (never inferred) schema,
  * and the exact option map the reader hands the connector. The fake
  * records the properties it receives and serves an empty batch; the
  * only thing left unexercised is the wire protocol itself, which is
  * precisely the boundary a server-backed integration test would cover.
  */
class FakeMongoProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "mongodb"

  // transactionsDayMongo always declares the schema; an inference call
  // would mean the production path regressed into a sampling scan
  // against the server — fail loudly.
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new UnsupportedOperationException(
      "schema must be declared by the caller, never inferred (no sampling pass)")

  override def supportsExternalMetadata(): Boolean = true

  override def getTable(
      declaredSchema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val captured = new util.HashMap[String, String](properties)
    FakeMongoProvider.lastProperties = captured
    new Table with SupportsRead {
      override def name(): String = "fake_mongo"
      override def schema(): StructType = declaredSchema
      override def capabilities(): util.Set[TableCapability] =
        util.EnumSet.of(TableCapability.BATCH_READ)
      override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
        new ScanBuilder {
          override def build(): Scan = new Scan {
            override def readSchema(): StructType = declaredSchema
            override def toBatch: Batch = new Batch {
              override def planInputPartitions(): Array[InputPartition] =
                Array.empty
              override def createReaderFactory(): PartitionReaderFactory =
                (_: InputPartition) =>
                  throw new IllegalStateException("no partitions to read")
            }
          }
        }
    }
  }
}

object FakeMongoProvider {
  /** Properties captured from the most recent getTable call. */
  @volatile var lastProperties: util.Map[String, String] = _
}
