package graft.sources.bi5

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * Spark 4 DataSource V2 entry point for the `bi5` format.
 *
 * The reference implements the pre-3.0 `DataSourceV2 with ReadSupport` API
 * (reference BI5DataSource.scala:24-50); that package was removed in Spark 3,
 * so this is the modern `TableProvider` shape with identical observable
 * behavior: registered under short name "bi5", options validated eagerly at
 * `load()` (inferSchema runs then), fixed 6-column schema, batch read only
 * (the reference is read-only — README.md:17).
 */
class Bi5DataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "bi5"

  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    // Validation must happen here: tests observe IllegalArgumentException
    // surfacing from `.load(...)` (reference BI5DataSourceTestSuite.scala:164-214).
    Bi5Options.from(k => Option(options.get(k)))
    Bi5Schema.schema
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    new Bi5Table(Bi5Options.from(k => Option(options.get(k))))
  }
}

/** Batch-readable bi5 tick table with the fixed schema. */
class Bi5Table(opts: Bi5Options) extends Table with SupportsRead {

  override def name(): String = s"bi5(${opts.path})"

  override def schema(): StructType = Bi5Schema.schema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new Bi5ScanBuilder(opts)
}
