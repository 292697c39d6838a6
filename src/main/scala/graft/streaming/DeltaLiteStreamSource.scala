package graft.streaming

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.graft.{GraftFileInput, GraftParquetReaderFactory, ParquetRead}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.{DeltaLite, IcebergLite}

/** DSv2 streaming SOURCES over the lake table formats — `spark
  * .readStream.format(classOf[DeltaLiteStreamProvider].getName)
  * .option("path", t).load()` (and the IcebergLite twin) tail the
  * table's commit metadata: each micro-batch is exactly the data files
  * ADDED by the log versions / snapshots in (start, end], read by
  * Spark's own parquet reader on executors. Offsets are version /
  * snapshot ids (exactly-once replay across restarts via the
  * checkpointed offset), maintenance commits are invisible, and a
  * non-append change fails loudly — production Delta's source
  * semantics. `maxVersionsPerTrigger` bounds each batch's admission;
  * the Delta provider additionally supports `readChangeFeed` (rows
  * tagged `_change_type`/`_commit_version`).
  *
  * Scale: planning reads only the NEW commit metadata (O(new versions)
  * driver work, never a snapshot replay); file reads are the standard
  * per-file executor scan, so an unbounded ingest stream costs the
  * same as batch-reading each increment once.
  */
class DeltaLiteStreamProvider extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val base = DeltaLite.streamInfo(SparkSession.active,
      LakeStream.pathOf(options))._1
    if (java.lang.Boolean.parseBoolean(options.get("readChangeFeed")))
      StructType(base.fields ++ LakeStream.CdfFields)
    else base
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    LakeStream.table(LakeStream.pathOf(properties), schema,
      s => DeltaLite.streamInfo(s, LakeStream.pathOf(properties))._2,
      s => DeltaLite.latestVersion(s, LakeStream.pathOf(properties)),
      DeltaLite.addedFilesBetween, cdfCapable = true)
}

/** IcebergLite twin: offsets are snapshot ids; appends-only manifests
  * enforced by [[IcebergLite.addedFilesBetween]]. No CDF mode.
  */
class IcebergLiteStreamProvider extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    IcebergLite.streamInfo(SparkSession.active,
      LakeStream.pathOf(options))._1

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // `ref` confines the stream to a BRANCH's lineage (s43 refs):
    // offsets advance only through the branch head, and snapshots on
    // other branches — or staged WAP snapshots — are invisible.
    val ref = Option(properties.get("ref"))
    LakeStream.table(LakeStream.pathOf(properties), schema,
      s => IcebergLite.streamInfo(s, LakeStream.pathOf(properties), ref)._2,
      s => IcebergLite.streamInfo(s, LakeStream.pathOf(properties), ref)._3,
      (s, t, from, to) => IcebergLite.addedFilesForRef(s, t, from, to, ref),
      cdfCapable = false)
  }
}

/** HudiLite twin: offsets are commit instants; appends-only enforced by
  * [[graft.sources.HudiLite.addedSlicesBetween]] (a COW rewrite in the
  * window fails loudly — update-inclusive consumption is the batch
  * incremental query). `withUpdates=true` switches to
  * [[graft.sources.HudiLite.writtenSlicesBetween]] — the MOR
  * change-stream: each batch delivers every record WRITTEN by its
  * commits (new base groups + log-file upserts), compactions are
  * invisible (they write no new records). No CDF mode.
  */
class HudiLiteStreamProvider extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    graft.sources.HudiLite.streamInfo(SparkSession.active,
      LakeStream.pathOf(options))._1

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val withUpdates =
      java.lang.Boolean.parseBoolean(properties.get("withUpdates"))
    LakeStream.table(LakeStream.pathOf(properties), schema,
      _ => Seq.empty,
      s => graft.sources.HudiLite.streamInfo(s,
        LakeStream.pathOf(properties))._3,
      if (withUpdates) graft.sources.HudiLite.writtenSlicesBetween
      else graft.sources.HudiLite.addedSlicesBetween,
      cdfCapable = false)
  }
}

private[streaming] object LakeStream {
  import org.apache.spark.sql.types.{LongType, StringType, StructField}

  /** CDF metadata columns (the public Delta change-feed read schema's
    * streaming subset — appends are `insert` changes).
    */
  val CdfFields: Array[StructField] = Array(
    StructField("_change_type", StringType, nullable = false),
    StructField("_commit_version", LongType, nullable = false))

  def pathOf(m: java.util.Map[String, String]): String =
    Option(m.get("path")).getOrElse(
      throw new IllegalArgumentException("option 'path' is required"))

  type AddedFiles =
    (SparkSession, String, Long, Long) =>
      Seq[(Long, String, Long, Seq[(String, Option[String])])]

  def table(path: String, schema0: StructType,
      partColsOf: SparkSession => Seq[String],
      latestOf: SparkSession => Long, added: AddedFiles,
      cdfCapable: Boolean): Table = new Table with SupportsRead {
    override def name(): String = s"lake:$path"
    override def schema(): StructType = schema0
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

    override def newScanBuilder(
        options: CaseInsensitiveStringMap): ScanBuilder =
      new ScanBuilder {
        override def build(): Scan = new Scan {
          override def readSchema(): StructType = schema0
          override def description(): String = s"graft-lake-stream $path"
          override def toMicroBatchStream(checkpointLoc: String)
              : MicroBatchStream = {
            val cdf =
              java.lang.Boolean.parseBoolean(options.get("readChangeFeed"))
            require(!cdf || cdfCapable,
              "readChangeFeed is only supported on the DeltaLite source")
            new LakeMicroBatchStream(SparkSession.active, path, schema0,
              Option(options.get("maxVersionsPerTrigger")).map(_.toLong)
                .getOrElse(Long.MaxValue),
              cdf, partColsOf, latestOf, added)
          }
        }
      }
  }
}

private[streaming] case class VersionOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

private[streaming] class LakeMicroBatchStream(spark: SparkSession,
    table: String, schema: StructType, maxVersionsPerTrigger: Long,
    readChangeFeed: Boolean,
    partColsOf: SparkSession => Seq[String],
    latestOf: SparkSession => Long,
    added: LakeStream.AddedFiles)
    extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset = VersionOffset(-1L)

  // Admission control through the API THAT CARRIES THE START OFFSET:
  // rate limiting must be computed from the engine's own progress
  // (which survives a checkpoint restart), never from instance state —
  // a fresh instance's high-water mark starts below the restored
  // offset, and a plain latestOffset() computed from it hands Spark an
  // offset BELOW the committed one, whose backwards "batch" then
  // re-anchors admission and RE-DELIVERS committed versions under a
  // new batch id (StreamingSpec's restart-recovery test pins this).
  // The engine-specific maxVersionsPerTrigger option governs the
  // admitted window; the ReadLimit parameter (row-oriented) is
  // intentionally unused.
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s0 = start.asInstanceOf[VersionOffset].v
    val latest = latestOf(spark)
    VersionOffset(
      if (maxVersionsPerTrigger == Long.MaxValue) latest
      else math.min(latest, s0 + maxVersionsPerTrigger))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset() without a start offset is unsafe under rate " +
        "limiting across restarts; Spark uses the admission-control " +
        "overload on this source")

  // Partition-aware split: the reader reads data columns from the file
  // and appends partition columns from the log's per-file values; when
  // partition columns don't trail the declared schema, a reorder
  // projection restores the table's column order. In CDF mode the
  // `_change_type`/`_commit_version` metadata columns ride the same
  // per-file injection (every appended file is one version's inserts).
  private val partCols = partColsOf(spark) ++
    (if (readChangeFeed) LakeStream.CdfFields.map(_.name).toSeq else Nil)
  private val partitionSchema = StructType(
    schema.fields.filter(f => partCols.contains(f.name)))
  private val dataSchema = StructType(
    schema.fields.filterNot(f => partCols.contains(f.name)))
  private val combined = StructType(dataSchema.fields ++ partitionSchema.fields)
  private val reorder: Option[Array[Int]] =
    if (combined.fieldNames.sameElements(schema.fieldNames)) None
    else Some(schema.fieldNames.map(combined.fieldIndex))

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val (s0, e0) = (start.asInstanceOf[VersionOffset].v,
      end.asInstanceOf[VersionOffset].v)
    if (e0 <= s0) return Array.empty // defensive: never read backwards
    added(spark, table, s0, e0)
      .map { case (v, p, sz, pvs) =>
        val pvMap = pvs.toMap ++ (if (readChangeFeed)
          Map("_change_type" -> Some("insert"),
            "_commit_version" -> Some(v.toString))
        else Map.empty)
        GraftFileInput(p, sz,
          partitionSchema.fieldNames.toSeq.map(n =>
            pvMap.getOrElse(n, None))): InputPartition
      }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftParquetReaderFactory(
      ParquetRead.readerFor(spark, dataSchema, partitionSchema),
      partitionSchema, combined, reorder)

  override def deserializeOffset(json: String): Offset =
    VersionOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
