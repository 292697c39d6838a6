package org.apache.spark.sql.graft

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** Parquet row-reader access for graft's DSv2 streaming source (same
  * shim idiom as [[Glue]]: `buildReaderWithPartitionValues` and
  * `PartitionedFile` are `private[sql]`, and this package object
  * re-exports exactly the documented connector-building surface —
  * the per-file read closure every file-based source is built on).
  */
object ParquetRead {

  /** Driver-side: build the serializable per-file read closure for
    * `dataSchema`. The clone-session pins the row-based reader (the
    * vectorized path is a columnar-batch contract with whole-stage
    * codegen, not a row iterator). Missing columns in older files
    * resolve to null, as in any parquet scan.
    */
  def readerFor(spark: SparkSession, dataSchema: StructType)
      : PartitionedFile => Iterator[InternalRow] = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .cloneSession()
    cs.conf.set("spark.sql.parquet.enableVectorizedReader", "false")
    new ParquetFileFormat().buildReaderWithPartitionValues(
      cs, dataSchema, new StructType(), dataSchema, Nil,
      Map.empty, cs.sessionState.newHadoopConf())
  }
}

/** One data file of a streaming micro-batch. */
case class GraftFileInput(path: String, size: Long) extends InputPartition

/** Executor-side factory: wrap the read closure as a DSv2
  * [[PartitionReaderFactory]].
  */
class GraftParquetReaderFactory(
    readFunc: PartitionedFile => Iterator[InternalRow])
    extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val fp = p.asInstanceOf[GraftFileInput]
    val it = readFunc(PartitionedFile(InternalRow.empty,
      SparkPath.fromPathString(fp.path), 0L, fp.size, Array.empty,
      0L, fp.size, Map.empty))
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { cur = it.next(); true } else false
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}
