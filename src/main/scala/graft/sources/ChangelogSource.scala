package graft.sources

import java.util.{Map => JMap}
import scala.collection.mutable.ArrayBuffer

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, IsNotNull}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for the reference's wire format: one JSON
  * `DatabaseEvent` envelope per line (`{"id":..,"seq":..,"op":..,
  * "table":..,"payload":{..}}` — the shape the reference produces at
  * `utils.go:67-90` and ships through Kafka). This is the faithful O1/O8
  * rendering SURVEY §2.1 marks optional: a first-class connector, so
  * `spark.read.format("changelog").load(dir)` (short name via
  * DataSourceRegister; the full class name also works) plans through the
  * same DSv2 machinery as any production source.
  *
  * Scale features a 100 TB source needs, implemented:
  *  - one InputPartition per file → reader parallelism tracks file layout;
  *  - column pruning (`SupportsPushDownRequiredColumns`): un-projected
  *    envelope fields are never materialized per row;
  *  - filter pushdown (`SupportsPushDownFilters`) for the op/table equality
  *    dispatch predicates (O5/O10): rows are dropped inside the reader,
  *    before Spark sees them.
  *
  * The `payload` column stays a raw JSON string — schema application is
  * the downstream `from_json` step (O4/O9), exactly the engine's dynamic-
  * schema model (SURVEY §1.3). Streaming ingestion of the same envelope
  * goes through the file-stream path in [[graft.cdc.ChangelogStream]]; a
  * `MicroBatchStream` here would be the Kafka-backed upgrade.
  */
class ChangelogSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "changelog"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ChangelogSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new ChangelogTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

object ChangelogSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("seq", LongType),
    StructField("op", StringType),
    StructField("table", StringType),
    StructField("payload", StringType)))
}

class ChangelogTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"changelog($path)"
  override def schema(): StructType = ChangelogSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // capture the SESSION Hadoop conf (spark.hadoop.* — S3/ABFS creds,
    // fs overrides) as a serializable map; a bare `new Configuration()`
    // would ignore it and the connector would only work on local paths
    val conf = org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()
    val confMap = {
      val it = conf.iterator()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
      b.result()
    }
    new ChangelogScanBuilder(path, confMap)
  }
}

class ChangelogScanBuilder(path: String, confMap: Map[String, String])
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = ChangelogSource.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept the dispatch predicates the pipeline actually uses: equality on
    * op/table, and IsNotNull on any envelope column. Everything else stays a
    * post-scan filter. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo(a, _: String) => a == "op" || a == "table"
      case IsNotNull(_) => true
      case _ => false
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new ChangelogScan(path, required, pushed, confMap)
}

class ChangelogScan(path: String, required: StructType, filters: Array[Filter],
                    confMap: Map[String, String])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"ChangelogScan(path=$path, pushed=${filters.mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(ChangelogConf.toConfiguration(confMap))
    fs.listStatus(p).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .map(s => ChangelogInputPartition(s.getPath.toString): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ChangelogReaderFactory(required, filters, confMap)
}

case class ChangelogInputPartition(file: String) extends InputPartition

object ChangelogConf {
  def toConfiguration(m: Map[String, String]): org.apache.hadoop.conf.Configuration = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    m.foreach { case (k, v) => c.set(k, v) }
    c
  }
}

class ChangelogReaderFactory(required: StructType, filters: Array[Filter],
                             confMap: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ChangelogPartitionReader(
      partition.asInstanceOf[ChangelogInputPartition].file, required, filters, confMap)
}

/** Per-file reader: stream lines, jackson-parse the envelope, apply pushed
  * filters, emit only the pruned columns. */
class ChangelogPartitionReader(file: String, required: StructType,
                               filters: Array[Filter],
                               confMap: Map[String, String])
    extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val path = new org.apache.hadoop.fs.Path(file)
  private val in = path.getFileSystem(ChangelogConf.toConfiguration(confMap)).open(path)
  private val lines = new java.io.BufferedReader(
    new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
  private var row: InternalRow = _

  private def passes(node: com.fasterxml.jackson.databind.JsonNode): Boolean =
    filters.forall {
      case EqualTo(a, v: String) =>
        val n = node.get(a); n != null && !n.isNull && n.asText() == v
      case IsNotNull(a) =>
        val n = node.get(a); n != null && !n.isNull
      case _ => true
    }

  override def next(): Boolean = {
    var line = lines.readLine()
    while (line != null) {
      if (line.nonEmpty) {
        // corrupt record -> skip, the engine's O9 decode convention
        // (from_json yields null and the pipeline filters it)
        val node = try mapper.readTree(line) catch { case _: Exception => null }
        if (node != null && passes(node)) {
          val values = new ArrayBuffer[Any](required.length)
          required.fields.foreach { f =>
            val n = node.get(f.name)
            values += (if (n == null || n.isNull) null
            else f.dataType match {
              case LongType => n.asLong()
              // payload: keep the raw JSON text (object or scalar)
              case StringType if n.isContainerNode => UTF8String.fromString(n.toString)
              case StringType => UTF8String.fromString(n.asText())
              case dt => throw new IllegalStateException(s"unsupported type $dt")
            })
          }
          row = new GenericInternalRow(values.toArray)
          return true
        }
      }
      line = lines.readLine()
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = lines.close()
}
