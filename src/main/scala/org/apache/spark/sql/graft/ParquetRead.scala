package org.apache.spark.sql.graft

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Cast, GenericInternalRow, Literal, UnsafeProjection}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** Parquet row-reader access for graft's DSv2 streaming source (same
  * shim idiom as [[Glue]]: `buildReaderWithPartitionValues` and
  * `PartitionedFile` are `private[sql]`, and this object re-exports
  * exactly the documented connector-building surface — the per-file
  * read closure every file-based source is built on).
  */
object ParquetRead {

  /** Driver-side: build the serializable per-file read closure.
    * `dataSchema` is what the files physically hold (partition columns
    * excluded); `partitionSchema` columns are appended by the reader
    * from each file's [[PartitionedFile]] partition values. The
    * clone-session pins the row-based reader (the vectorized path is a
    * columnar-batch contract with whole-stage codegen, not a row
    * iterator). Missing columns in older files resolve to null, as in
    * any parquet scan.
    */
  def readerFor(spark: SparkSession, dataSchema: StructType,
      partitionSchema: StructType)
      : PartitionedFile => Iterator[InternalRow] = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .cloneSession()
    cs.conf.set("spark.sql.parquet.enableVectorizedReader", "false")
    new ParquetFileFormat().buildReaderWithPartitionValues(
      cs, dataSchema, partitionSchema, dataSchema, Nil,
      Map.empty, cs.sessionState.newHadoopConf())
  }
}

/** One data file of a streaming micro-batch; `partValues` are the
  * file's partition-column values as recorded in the log (aligned to
  * the factory's partitionSchema order).
  */
case class GraftFileInput(path: String, size: Long,
    partValues: Seq[Option[String]] = Nil) extends InputPartition

/** Executor-side factory: wrap the read closure as a DSv2
  * [[PartitionReaderFactory]]. The reader emits `dataSchema ++
  * partitionSchema`; `reorder` (output position → combined position)
  * projects that to the table's declared column order when partition
  * columns don't trail the schema.
  */
class GraftParquetReaderFactory(
    readFunc: PartitionedFile => Iterator[InternalRow],
    partitionSchema: StructType,
    combined: StructType,
    reorder: Option[Array[Int]])
    extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val fp = p.asInstanceOf[GraftFileInput]
    // Log strings → typed partition values (same Cast semantics as the
    // batch read path), bounded per file.
    val pv = new GenericInternalRow(
      partitionSchema.fields.zip(fp.partValues).map {
        case (f, Some(raw)) =>
          Cast(Literal(raw), f.dataType, Some("UTC")).eval(InternalRow.empty)
        case (_, None) => null
      }.toArray[Any])
    val raw = readFunc(PartitionedFile(pv,
      SparkPath.fromPathString(fp.path), 0L, fp.size, Array.empty,
      0L, fp.size, Map.empty))
    val it = reorder match {
      case Some(order) =>
        val proj = UnsafeProjection.create(order.map(i =>
          BoundReference(i, combined(i).dataType,
            combined(i).nullable)).toSeq)
        raw.map(proj)
      case None => raw
    }
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { cur = it.next(); true } else false
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}
