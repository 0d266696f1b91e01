package graft

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Test double for the MongoDB connector swap: a read-only DSv2 source
  * (registered as `graft-mongo-double` via the test-classpath
  * DataSourceRegister service file) whose "collection" content is the
  * reader options it was handed, one (opt_key, opt_value) row each. A
  * SourcesSpec test points `spark.graft.mongo.format` at it and proves
  * `Tables.load`'s mongo branch delivers connection.uri (with
  * credentials), database, and collection to the connector — leaving
  * only the production jar itself untested in this sandbox.
  */
class MongoDoubleProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-mongo-double"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MongoDoubleProvider.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new MongoDoubleTable
}

object MongoDoubleProvider {
  val schema: StructType = StructType(Seq(
    StructField("opt_key", StringType, nullable = false),
    StructField("opt_value", StringType, nullable = false)))
}

final class MongoDoubleTable extends Table with SupportsRead {
  override def name(): String = "graft-mongo-double"
  override def schema(): StructType = MongoDoubleProvider.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  // Reader options arrive HERE (not in getTable's properties) on the
  // spark.read.format(...).option(...).load() path — echo exactly them.
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val opts = options.asScala.toSeq.sortBy(_._1)
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = MongoDoubleProvider.schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        Array(MongoDoublePartition())
      override def createReaderFactory(): PartitionReaderFactory =
        MongoDoubleReaderFactory(opts)
    }
  }
}

final case class MongoDoublePartition() extends InputPartition

final case class MongoDoubleReaderFactory(opts: Seq[(String, String)])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val it = opts.iterator
      private var cur: (String, String) = _
      override def next(): Boolean =
        if (it.hasNext) { cur = it.next(); true } else false
      override def get(): InternalRow = InternalRow(
        UTF8String.fromString(cur._1), UTF8String.fromString(cur._2))
      override def close(): Unit = ()
    }
}
