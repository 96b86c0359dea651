package graft.sources.v2

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{
  Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan,
  ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns
}
import org.apache.spark.sql.sources.{
  DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual,
  In, LessThan, LessThanOrEqual
}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 implementation of the reference corpus format — documents
  * at `{path}/{i}.txt` for `i ∈ [0, numFiles)` (the same contract as
  * [[graft.sources.DocSource]], reference main.cpp:28-47) — expressed
  * through Spark's connector API rather than the built-in wholetext
  * reader:
  *
  *  - one [[InputPartition]] per document file, so Spark schedules,
  *    retries, and locality-places each document independently — the V2
  *    equivalent of the reference's one-file-per-map-task dispatch
  *    (main.cpp:141-155);
  *  - COLUMN PRUNING pushed into the source
  *    ([[SupportsPushDownRequiredColumns]]): a `select(doc_id)` or a bare
  *    count never opens the files at all — doc ids come from the path
  *    convention — which no wholetext-based reader can do;
  *  - schema is declared, not inferred, so `spark.read.format("graft-docs")`
  *    needs no scan to plan.
  *
  * Usage: `spark.read.format("graft-docs").option("numFiles", "6")
  * .load(dir)` (short name via META-INF service registration).
  */
class DocV2Source extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-docs"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DocV2Source.fullSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new DocTable(properties.asScala.toMap)
  override def supportsExternalMetadata(): Boolean = false
}

object DocV2Source {
  val fullSchema: StructType = new StructType()
    .add("doc_id", LongType, nullable = false)
    .add("content", StringType, nullable = true)
}

private[v2] class DocTable(properties: Map[String, String])
    extends Table with SupportsRead {
  private val dir = properties.getOrElse("path",
    throw new IllegalArgumentException("graft-docs: .load(dir) path required"))
  private val numFiles = properties.getOrElse("numfiles",
    properties.getOrElse("numFiles",
      throw new IllegalArgumentException("graft-docs: numFiles option required"))).toInt
  require(numFiles > 0, s"graft-docs: numFiles must be positive, got $numFiles")

  override def name(): String = s"graft-docs(`$dir`, numFiles=$numFiles)"
  override def schema(): StructType = DocV2Source.fullSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DocScanBuilder(dir, numFiles)
}

private[v2] class DocScanBuilder(dir: String, numFiles: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = DocV2Source.fullSchema
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** doc_id IS the file index, so doc_id predicates prune which FILES get
    * planned at all — pushdown at input-partition granularity, the V2
    * analog of parquet partition pruning. Accepted filters are consumed
    * (not re-evaluated by Spark); everything else stays post-scan. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("doc_id", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThan("doc_id", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThanOrEqual("doc_id", _: java.lang.Long | _: java.lang.Integer) => true
      case GreaterThan("doc_id", _: java.lang.Long | _: java.lang.Integer) => true
      case GreaterThanOrEqual("doc_id", _: java.lang.Long | _: java.lang.Integer) => true
      case In("doc_id", vs) => vs.forall(v =>
        v.isInstanceOf[java.lang.Long] || v.isInstanceOf[java.lang.Integer])
      case _ => false
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new DocScan(dir, numFiles, required, pushed)
}

private[v2] class DocScan(dir: String, numFiles: Int, required: StructType,
    pushed: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-docs dir=$dir numFiles=$numFiles readSchema=${required.simpleString} " +
      s"pushedFilters=[${pushed.mkString(", ")}]"

  private def num(v: Any): Long = v match {
    case l: java.lang.Long => l.longValue
    case i: java.lang.Integer => i.longValue
  }
  private def keep(id: Long): Boolean = pushed.forall {
    case EqualTo("doc_id", v) => id == num(v)
    case LessThan("doc_id", v) => id < num(v)
    case LessThanOrEqual("doc_id", v) => id <= num(v)
    case GreaterThan("doc_id", v) => id > num(v)
    case GreaterThanOrEqual("doc_id", v) => id >= num(v)
    case In("doc_id", vs) => vs.exists(num(_) == id)
    case _ => true
  }

  override def planInputPartitions(): Array[InputPartition] =
    (0 until numFiles).iterator.map(_.toLong).filter(keep)
      .map(i => DocPartition(i, s"$dir/$i.txt").asInstanceOf[InputPartition])
      .toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new DocReaderFactory(required.fieldNames)
}

private[v2] case class DocPartition(docId: Long, path: String) extends InputPartition

/** Serialized to executors; reads one document per partition. Content is
  * opened only when the pruned schema asks for it. */
private[v2] class DocReaderFactory(fieldNames: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[DocPartition]
    new PartitionReader[InternalRow] {
      private var consumed = false
      override def next(): Boolean = !consumed && { consumed = true; true }
      override def get(): InternalRow = {
        val values: Array[Any] = fieldNames.map {
          case "doc_id" => p.docId
          case "content" =>
            UTF8String.fromBytes(
              java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p.path)))
          case other => throw new IllegalStateException(s"unknown column $other")
        }
        InternalRow.fromSeq(values.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
