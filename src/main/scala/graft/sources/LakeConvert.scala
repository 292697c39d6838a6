package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, Metadata, StructType}

/** Metadata-only table-format conversion between the two lake formats
  * (the lakehouse "CONVERT TO" operation; the interop theme of
  * reference:metadata:1-10 taken one step further — not just two
  * formats over parquet, but movement between them without touching a
  * data byte).
  *
  * Both directions write ONLY metadata: the destination's first
  * commit/snapshot references the source's live parquet files by
  * absolute path — the same reference mechanism as Delta shallow CLONE
  * — and carries each file's min/max stats verbatim, so data skipping
  * works on the converted table from its first query. Cost is O(live
  * files) metadata, zero data I/O: a 100 TB table converts in the time
  * it takes to write one manifest, and the converted table then
  * diverges independently (its DML stages new files under its own
  * root; vacuum/expire on it never touches source files).
  *
  * Restrictions, each enforced loudly and each removable by one
  * [[DeltaLite.compact]] / [[IcebergLite.compact]] pass first:
  * unpartitioned sources (partition values are directory-derived at
  * read here, and a foreign directory layout proves nothing), no
  * deletion vectors / position deletes (a row mask has no lossless
  * bare-file expression in the other format), un-evolved Iceberg
  * schemas (foreign readers resolve parquet columns by name).
  */
object LakeConvert {

  /** Convert a DeltaLite table into a new IcebergLite table at `dst`.
    * Returns the created snapshot id.
    */
  def deltaToIceberg(s: SparkSession, src: String, dst: String): Long = {
    val (schemaJson, partCols, files) = DeltaLite.liveFileState(s, src)
    require(partCols.isEmpty,
      "convert supports unpartitioned sources only (compact first)")
    val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    IcebergLite.createFromFiles(s, dst, schema, files)
  }

  /** Convert an IcebergLite table into a new DeltaLite table at `dst`. */
  def icebergToDelta(s: SparkSession, src: String, dst: String): Unit = {
    val (schema, partCols, files) = IcebergLite.liveFileState(s, src)
    require(partCols.isEmpty,
      "convert supports unpartitioned sources only (compact first)")
    // Strip the field-id annotations: they are Iceberg schema state,
    // not part of the logical schema a Delta reader should see.
    val plain = StructType(schema.fields.map(_.copy(metadata = Metadata.empty)))
    DeltaLite.createFromFiles(s, dst, plain.json, files)
  }
}
