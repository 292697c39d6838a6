package graft.sources

import java.util.UUID

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Minimal Iceberg-STYLE table format: the manifest-tree metadata
  * architecture of Apache Iceberg (reference:metadata:1-9's
  * Iceberg-vs-Delta comparative surface), distinct from DeltaLite's
  * log-replay model:
  *
  *  - `metadata/v{N}.metadata.json` — immutable table metadata: schema,
  *    the full snapshot list, and the CURRENT snapshot id. A
  *    `version-hint.text` pointer names the latest metadata file (the
  *    HadoopTables catalog convention).
  *  - each snapshot points at ONE manifest list
  *    (`metadata/snap-{id}.json`) naming its manifest files;
  *  - each manifest (`metadata/manifest-{uuid}.json`) lists data files
  *    with per-file record counts and min/max column stats.
  *
  * The structural consequences Iceberg is built around hold here:
  * reading NEVER lists directories (the manifest tree names every data
  * file — object-store-friendly at 100 TB); an append creates a new
  * snapshot whose manifest list REUSES the previous manifests and adds
  * one for the new files (O(new data) metadata per commit, and
  * manifest-level stats let a scan skip whole manifests before looking
  * at files); time travel reads any retained snapshot id, and ALL
  * snapshots stay reachable from the current metadata file.
  *
  * Simplifications vs Apache Iceberg, stated: manifests are JSON
  * (Iceberg serializes them as Avro — same tree, different encoding);
  * the schema is Spark's schema JSON (not Iceberg's field-id schema, so
  * no column-rename evolution); single-writer (Iceberg's optimistic
  * metadata swap is arbitrated by a catalog we don't have); data files
  * are unpartitioned here (DeltaLite carries the partition story).
  * Stats pruning reuses the same conservative evaluator as DeltaLite
  * ([[DeltaLite.mayMatch]]) — footer-derived stats, exact comparisons.
  */
object IcebergLite {

  private val Json = new ObjectMapper()

  private def fs(s: SparkSession, p: Path): FileSystem =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  private def metaDir(table: String) = new Path(table, "metadata")
  private def versionHint(table: String) =
    new Path(metaDir(table), "version-hint.text")
  private def metadataFile(table: String, v: Long) =
    new Path(metaDir(table), s"v$v.metadata.json")

  private def writeFile(f: FileSystem, p: Path, text: String,
      overwrite: Boolean): Unit = {
    val out = f.create(p, overwrite)
    try out.write(text.getBytes("UTF-8"))
    finally out.close()
  }

  private def readText(f: FileSystem, p: Path): String = {
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** Latest metadata version per the version hint; -1 when no table. */
  def currentVersion(s: SparkSession, table: String): Long = {
    val f = fs(s, versionHint(table))
    if (!f.exists(versionHint(table))) -1L
    else readText(f, versionHint(table)).trim.toLong
  }

  private case class Meta(schemaJson: String, currentSnapshot: Long,
      snapshots: Seq[(Long, String)]) // (snapshot-id, manifest-list rel path)

  private def readMeta(s: SparkSession, table: String): Meta = {
    val v = currentVersion(s, table)
    require(v >= 0, s"no iceberg table at $table")
    val f = fs(s, metaDir(table))
    val n = Json.readTree(readText(f, metadataFile(table, v)))
    Meta(n.get("schema-json").asText(),
      n.get("current-snapshot-id").asLong(),
      n.get("snapshots").elements().asScala.map(sn =>
        sn.get("snapshot-id").asLong() -> sn.get("manifest-list").asText())
        .toSeq)
  }

  /** (relative data-file path, numRecords, stats JSON) per manifest entry. */
  private case class ManifestEntry(path: String, stats: Option[JsonNode])

  private def readManifests(s: SparkSession, table: String,
      manifestListRel: String): Seq[(String, Seq[ManifestEntry])] = {
    val f = fs(s, metaDir(table))
    val list = Json.readTree(readText(f, new Path(table, manifestListRel)))
    list.get("manifests").elements().asScala.map(_.asText()).toSeq
      .map { mRel =>
        val m = Json.readTree(readText(f, new Path(table, mRel)))
        mRel -> m.get("entries").elements().asScala.map { e =>
          ManifestEntry(e.get("path").asText(),
            Option(e.get("stats")).filterNot(_.isNull))
        }.toSeq
      }
  }

  /** Stage `df` as parquet under `table/data/` and return one manifest's
    * entries (path + footer-derived stats), written as
    * `metadata/manifest-{uuid}.json`. Returns the manifest's relative
    * path.
    */
  private def writeManifest(s: SparkSession, table: String,
      df: DataFrame, schema: StructType): String = {
    val stageDir = new Path(table, s"_stage_${UUID.randomUUID()}")
    df.write.mode("overwrite").parquet(stageDir.toString)
    val f = fs(s, stageDir)
    val rels = f.listStatus(stageDir).toSeq
      .filter { st =>
        val n = st.getPath.getName
        n.startsWith("part-") && n.endsWith(".parquet")
      }
      .map { st =>
        val rel = s"data/part-${UUID.randomUUID()}.parquet"
        f.mkdirs(new Path(table, "data"))
        require(f.rename(st.getPath, new Path(table, rel)),
          s"rename failed staging $rel")
        rel
      }
    f.delete(stageDir, true)
    val stats = DeltaLite.footerStats(s, table, rels, schema)
    val root = Json.createObjectNode()
    val entries = root.putArray("entries")
    rels.foreach { rel =>
      val e = entries.addObject()
      e.put("path", rel)
      stats.get(rel).foreach(st => e.set[JsonNode]("stats", Json.readTree(st)))
    }
    val mRel = s"metadata/manifest-${UUID.randomUUID()}.json"
    writeFile(f, new Path(table, mRel), Json.writeValueAsString(root),
      overwrite = false)
    mRel
  }

  private def commitSnapshot(s: SparkSession, table: String,
      schemaJson: String, prevSnapshots: Seq[(Long, String)],
      manifests: Seq[String]): Long = {
    val f = fs(s, metaDir(table))
    f.mkdirs(metaDir(table))
    val snapId = prevSnapshots.map(_._1).foldLeft(0L)(math.max) + 1
    val listRel = s"metadata/snap-$snapId.json"
    val listRoot = Json.createObjectNode()
    val arr = listRoot.putArray("manifests")
    manifests.foreach(arr.add)
    writeFile(f, new Path(table, listRel), Json.writeValueAsString(listRoot),
      overwrite = false)
    val v = currentVersion(s, table) + 1
    val meta = Json.createObjectNode()
    meta.put("format-version", 2)
    meta.put("table-uuid",
      UUID.nameUUIDFromBytes(table.getBytes("UTF-8")).toString)
    meta.put("location", table)
    meta.put("schema-json", schemaJson)
    meta.put("current-snapshot-id", snapId)
    val snaps = meta.putArray("snapshots")
    (prevSnapshots :+ (snapId, listRel)).foreach { case (id, rel) =>
      val o = snaps.addObject()
      o.put("snapshot-id", id)
      o.put("timestamp-ms", 0L)
      o.put("manifest-list", rel)
    }
    // Exclusive metadata-version claim (single-writer; a real catalog
    // arbitrates the swap).
    writeFile(f, metadataFile(table, v), Json.writeValueAsString(meta),
      overwrite = false)
    writeFile(f, versionHint(table), v.toString, overwrite = true)
    snapId
  }

  /** Create the table: snapshot 1 with one manifest. */
  def create(s: SparkSession, table: String, df: DataFrame): Long = {
    require(currentVersion(s, table) < 0, s"table already exists at $table")
    fs(s, metaDir(table)).mkdirs(metaDir(table))
    val m = writeManifest(s, table, df, df.schema)
    commitSnapshot(s, table, df.schema.json, Nil, Seq(m))
  }

  /** Append as a NEW snapshot: its manifest list is the previous
    * snapshot's manifests — reused by reference, the Iceberg metadata
    * shape that keeps commit cost O(new data) — plus one new manifest
    * for the appended files. Returns the new snapshot id.
    */
  def append(s: SparkSession, table: String, df: DataFrame): Long = {
    val meta = readMeta(s, table)
    val schema = DataType.fromJson(meta.schemaJson).asInstanceOf[StructType]
    val current = meta.snapshots.toMap.apply(meta.currentSnapshot)
    val prevManifests = readManifests(s, table, current).map(_._1)
    val m = writeManifest(s, table,
      df.select(schema.fieldNames.map(col).toSeq: _*), schema)
    commitSnapshot(s, table, meta.schemaJson, meta.snapshots,
      prevManifests :+ m)
  }

  /** All snapshot ids, oldest first. */
  def snapshots(s: SparkSession, table: String): Seq[Long] =
    readMeta(s, table).snapshots.map(_._1).sorted

  private def filesOf(s: SparkSession, table: String,
      snapshotId: Long): (StructType, Seq[ManifestEntry]) = {
    val meta = readMeta(s, table)
    val id = if (snapshotId < 0) meta.currentSnapshot else snapshotId
    val listRel = meta.snapshots.toMap.getOrElse(id,
      throw new IllegalArgumentException(s"no snapshot $id at $table"))
    (DataType.fromJson(meta.schemaJson).asInstanceOf[StructType],
      readManifests(s, table, listRel).flatMap(_._2))
  }

  /** Snapshot read; `snapshotId < 0` means current. Every data file
    * comes from the manifest tree — no directory listing.
    */
  def snapshot(s: SparkSession, table: String,
      snapshotId: Long = -1L): DataFrame = {
    val (schema, entries) = filesOf(s, table, snapshotId)
    if (entries.isEmpty)
      s.createDataFrame(s.sparkContext.emptyRDD[Row], schema)
    else s.read.schema(schema)
      .parquet(entries.map(e => new Path(table, e.path).toString): _*)
  }

  /** Stats-pruned scan over the current snapshot: manifest entries whose
    * min/max cannot satisfy `pred` are skipped (same conservative
    * evaluator as DeltaLite), the survivors read + filtered exactly.
    */
  def scan(s: SparkSession, table: String, pred: Column): DataFrame = {
    val (schema, entries) = filesOf(s, table, -1L)
    val cond = DeltaLite.resolvedPred(s, schema, pred)
    val keep = entries.filter(e =>
      e.stats.forall(st => DeltaLite.mayMatch(cond, st)))
    (if (keep.isEmpty)
      s.createDataFrame(s.sparkContext.emptyRDD[Row], schema)
    else s.read.schema(schema)
      .parquet(keep.map(e => new Path(table, e.path).toString): _*))
      .filter(pred)
  }

  /** (kept, total) data-file counts for `pred` (spec assertion hook). */
  def pruneInfo(s: SparkSession, table: String, pred: Column): (Int, Int) = {
    val (schema, entries) = filesOf(s, table, -1L)
    val cond = DeltaLite.resolvedPred(s, schema, pred)
    (entries.count(e => e.stats.forall(st => DeltaLite.mayMatch(cond, st))),
      entries.size)
  }
}
