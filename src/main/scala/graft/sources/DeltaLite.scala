package graft.sources

import java.util.UUID

import scala.collection.mutable

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Minimal open-table-format support speaking the public Delta Lake
  * transaction-log protocol: a table is a directory of immutable parquet
  * data files plus a `_delta_log/` of JSON commits, each a newline-
  * delimited list of actions (`protocol` / `metaData` / `add` /
  * `remove`). The live snapshot at version v is the add-minus-remove
  * file set after replaying commits 0..v — which also gives time travel
  * for free (replay to an older v). Implemented from the published
  * protocol spec against Spark + Hadoop FileSystem APIs only (the
  * lake-metadata capability of reference:metadata:1-53).
  *
  * Scale notes (100 TB):
  *  - Data-file IO is all distributed Spark parquet read/write; the
  *    driver touches only metadata (the log) and file names.
  *  - Commits are created with `FileSystem.create(path, overwrite =
  *    false)` — atomic put-if-absent, the protocol's optimistic-
  *    concurrency primitive: two racing writers of version v+1 get one
  *    winner and one clean failure.
  *  - [[deleteWhere]] is copy-on-write DML: ONE metadata-column scan
  *    finds the files containing matching rows, and only those files
  *    are rewritten — a selective delete on a 100 TB table rewrites
  *    gigabytes, not the table.
  *  - Log replay here is a driver-side loop over commit files: the log
  *    is O(commits) small JSON, not data. A production implementation
  *    adds checkpoint compaction once logs grow to thousands of
  *    commits; out of scope for the read/write/DML surface shown here.
  */
object DeltaLite {

  private val Json = new ObjectMapper()

  private def fs(s: SparkSession, p: Path): FileSystem =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  private def logDir(table: String) = new Path(table, "_delta_log")
  private def commitPath(table: String, v: Long) =
    new Path(logDir(table), f"$v%020d.json")

  /** Latest committed version; -1 if no table exists at `table`. */
  def latestVersion(s: SparkSession, table: String): Long = {
    val ld = logDir(table)
    val f = fs(s, ld)
    if (!f.exists(ld)) -1L
    else f.listStatus(ld).map(_.getPath.getName)
      .filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toLong)
      .foldLeft(-1L)(math.max)
  }

  private case class State(schemaJson: String, files: Seq[String])

  /** Replay commits 0..version into (schema, live relative file list). */
  private def replay(s: SparkSession, table: String, version: Long): State = {
    val f = fs(s, new Path(table))
    val live = mutable.LinkedHashSet[String]()
    var schemaJson: String = null
    (0L to version).foreach { v =>
      val in = f.open(commitPath(table, v))
      val txt =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      txt.split('\n').filter(_.nonEmpty).foreach { line =>
        val n = Json.readTree(line)
        if (n.has("metaData"))
          schemaJson = n.get("metaData").get("schemaString").asText()
        if (n.has("add")) live += n.get("add").get("path").asText()
        if (n.has("remove")) live -= n.get("remove").get("path").asText()
      }
    }
    require(schemaJson != null, s"delta log at $table has no metaData")
    State(schemaJson, live.toSeq)
  }

  /** Snapshot read; `version < 0` means latest. The schema comes from
    * the log's metaData (not parquet inference), as the protocol
    * requires — files written before a schema evolution still read
    * under the current schema.
    */
  def snapshot(s: SparkSession, table: String, version: Long = -1L): DataFrame = {
    val latest = latestVersion(s, table)
    require(latest >= 0, s"no delta log at $table")
    val v = if (version < 0) latest else version
    require(v <= latest, s"version $v > latest $latest at $table")
    val st = replay(s, table, v)
    val schema = DataType.fromJson(st.schemaJson).asInstanceOf[StructType]
    if (st.files.isEmpty)
      s.createDataFrame(s.sparkContext.emptyRDD[Row], schema)
    else
      s.read.schema(schema)
        .parquet(st.files.map(p => new Path(table, p).toString): _*)
  }

  /** Distributed-write `df` into the table dir; returns (relative path,
    * size) per data file. Files are staged by the normal parquet
    * committer, then renamed (a metadata op) to UUID names in the root.
    */
  private def stage(s: SparkSession, table: String,
      df: DataFrame): Seq[(String, Long)] = {
    val stageDir = new Path(table, s"_stage_${UUID.randomUUID()}")
    df.write.mode("overwrite").parquet(stageDir.toString)
    val f = fs(s, stageDir)
    val parts = f.listStatus(stageDir).filter { st =>
      val n = st.getPath.getName
      n.startsWith("part-") && n.endsWith(".parquet")
    }
    val out = parts.map { st =>
      val name = s"part-${UUID.randomUUID()}.parquet"
      require(f.rename(st.getPath, new Path(table, name)),
        s"rename failed staging $name")
      (name, st.getLen)
    }.toSeq
    f.delete(stageDir, true)
    out
  }

  private def obj(field: String)(fill: com.fasterxml.jackson.databind.node.ObjectNode => Unit): String = {
    val root = Json.createObjectNode()
    fill(root.putObject(field))
    Json.writeValueAsString(root)
  }

  private def addAction(path: String, size: Long): String =
    obj("add") { a =>
      a.put("path", path)
      a.putObject("partitionValues")
      a.put("size", size)
      a.put("modificationTime", 0L)
      a.put("dataChange", true)
    }

  private def removeAction(path: String): String =
    obj("remove") { r =>
      r.put("path", path)
      r.put("deletionTimestamp", 0L)
      r.put("dataChange", true)
    }

  private def protocolAction: String =
    obj("protocol") { p =>
      p.put("minReaderVersion", 1)
      p.put("minWriterVersion", 2)
    }

  private def metaDataAction(table: String, schemaJson: String): String =
    obj("metaData") { m =>
      m.put("id", UUID.nameUUIDFromBytes(table.getBytes("UTF-8")).toString)
      val fmt = m.putObject("format")
      fmt.put("provider", "parquet")
      fmt.putObject("options")
      m.put("schemaString", schemaJson)
      m.putArray("partitionColumns")
      m.putObject("configuration")
      m.put("createdTime", 0L)
    }

  /** Atomic exclusive commit of version `v` — `create(overwrite=false)`
    * makes concurrent writers race safely (one wins, one fails clean).
    */
  private def writeCommit(s: SparkSession, table: String, v: Long,
      actions: Seq[String]): Unit = {
    val p = commitPath(table, v)
    val f = fs(s, p)
    f.mkdirs(logDir(table))
    val out = f.create(p, false)
    try out.write((actions.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Create the table (version 0) from `df`. */
  def create(s: SparkSession, table: String, df: DataFrame): Unit = {
    require(latestVersion(s, table) < 0, s"table already exists at $table")
    val files = stage(s, table, df)
    writeCommit(s, table, 0L,
      protocolAction +: metaDataAction(table, df.schema.json) +:
        files.map { case (p, sz) => addAction(p, sz) })
  }

  /** Append `df` as a new version. */
  def append(s: SparkSession, table: String, df: DataFrame): Unit = {
    val v = latestVersion(s, table)
    require(v >= 0, s"no delta log at $table")
    writeCommit(s, table, v + 1,
      stage(s, table, df).map { case (p, sz) => addAction(p, sz) })
  }

  /** Copy-on-write DELETE WHERE `cond`: one metadata-column scan finds
    * the files containing matching rows; only those files are rewritten
    * (their surviving rows become new adds, the originals removes).
    * Untouched files are untouched — the 100 TB-safe DML shape.
    */
  def deleteWhere(s: SparkSession, table: String, cond: Column): Unit = {
    val v = latestVersion(s, table)
    require(v >= 0, s"no delta log at $table")
    val st = replay(s, table, v)
    val schema = DataType.fromJson(st.schemaJson).asInstanceOf[StructType]
    val abs = st.files.map(p => new Path(table, p).toString)
    if (abs.isEmpty) return
    val hitAbs = s.read.schema(schema).parquet(abs: _*)
      .withColumn("_gf", input_file_name())
      .filter(cond)
      .select(col("_gf")).distinct()
      .collect().map(_.getString(0)).toSet
    // input_file_name yields URIs; our flat UUID names are unique, so
    // suffix-match recovers the relative paths.
    val hitRel = st.files.filter(rel => hitAbs.exists(_.endsWith("/" + rel)))
    if (hitRel.isEmpty) return
    val survivors = s.read.schema(schema)
      .parquet(hitRel.map(p => new Path(table, p).toString): _*)
      .filter(!coalesce(cond, lit(false)))
    val newFiles = stage(s, table, survivors)
    writeCommit(s, table, v + 1,
      newFiles.map { case (p, sz) => addAction(p, sz) } ++
        hitRel.map(removeAction))
  }
}
