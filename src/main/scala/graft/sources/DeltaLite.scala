package graft.sources

import java.util.UUID

import scala.collection.mutable

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, Or}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
  *  - Log replay is a driver-side loop over commit files: the log is
  *    O(commits) small JSON, not data — and [[writeLogCheckpoint]]
  *    compacts the replayed state into one parquet file so replay is
  *    O(commits since checkpoint) and older JSON commits can age out,
  *    keeping long-lived tables readable at constant cost.
  *
  * Remaining gap vs production Delta: stats are collected in a
  * post-write pass over the new files (real writers collect inline in
  * the parquet committer) — one extra linear read of new data per
  * commit, irrelevant at gate scale.
  */
object DeltaLite {

  private val Json = new ObjectMapper()

  private def fs(s: SparkSession, p: Path): FileSystem =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  private def logDir(table: String) = new Path(table, "_delta_log")
  private def commitPath(table: String, v: Long) =
    new Path(logDir(table), f"$v%020d.json")

  /** Latest committed version; -1 if no table exists at `table`. A log
    * checkpoint counts as a committed version — after pre-checkpoint
    * JSON commits age out, the checkpoint itself anchors the version
    * line.
    */
  def latestVersion(s: SparkSession, table: String): Long = {
    val ld = logDir(table)
    val f = fs(s, ld)
    if (!f.exists(ld)) -1L
    else f.listStatus(ld).map(_.getPath.getName)
      .collect {
        case n if n.endsWith(".json") && n.stripSuffix(".json").forall(_.isDigit) =>
          n.stripSuffix(".json").toLong
        case n if n.endsWith(".checkpoint.parquet") =>
          n.stripSuffix(".checkpoint.parquet").toLong
      }
      .foldLeft(-1L)(math.max)
  }

  private case class State(schemaJson: String, files: Seq[String],
      stats: Map[String, JsonNode])

  private def lastCheckpointPath(table: String) =
    new Path(logDir(table), "_last_checkpoint")
  private def checkpointFile(table: String, v: Long) =
    new Path(logDir(table), f"$v%020d.checkpoint.parquet")

  /** Version of the newest log checkpoint at or below `atMost`, if any. */
  private def checkpointVersion(s: SparkSession, table: String,
      atMost: Long): Option[Long] = {
    val p = lastCheckpointPath(table)
    val f = fs(s, p)
    if (!f.exists(p)) return None
    val in = f.open(p)
    val txt =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val v = Json.readTree(txt).get("version").asLong()
    if (v <= atMost && f.exists(checkpointFile(table, v))) Some(v) else None
  }

  /** Replay commits into (schema, live relative file list, per-file
    * stats). Replay starts from the newest checkpoint ≤ `version` when
    * one exists — O(commits since checkpoint), not O(table lifetime) —
    * and walks only the JSON commits after it.
    */
  private def replay(s: SparkSession, table: String, version: Long): State = {
    val f = fs(s, new Path(table))
    val live = mutable.LinkedHashSet[String]()
    val stats = mutable.Map[String, JsonNode]()
    var schemaJson: String = null
    val from = checkpointVersion(s, table, version) match {
      case Some(cv) =>
        s.read.parquet(checkpointFile(table, cv).toString).collect()
          .foreach { r =>
            r.getAs[String]("kind") match {
              case "metaData" => schemaJson = r.getAs[String]("schemaString")
              case "add" =>
                val p = r.getAs[String]("path")
                live += p
                Option(r.getAs[String]("stats"))
                  .foreach(st => stats(p) = Json.readTree(st))
            }
          }
        cv + 1
      case None => 0L
    }
    (from to version).foreach { v =>
      val in = f.open(commitPath(table, v))
      val txt =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      txt.split('\n').filter(_.nonEmpty).foreach { line =>
        val n = Json.readTree(line)
        if (n.has("metaData"))
          schemaJson = n.get("metaData").get("schemaString").asText()
        if (n.has("add")) {
          val a = n.get("add")
          val p = a.get("path").asText()
          live += p
          if (a.has("stats")) stats(p) = Json.readTree(a.get("stats").asText())
        }
        if (n.has("remove")) {
          val p = n.get("remove").get("path").asText()
          live -= p
          stats -= p
        }
      }
    }
    require(schemaJson != null, s"delta log at $table has no metaData")
    State(schemaJson, live.toSeq, stats.toMap)
  }

  /** Write a log checkpoint at the current version: the fully-replayed
    * state (metaData + every live add with its stats) lands in ONE
    * parquet file, and `_last_checkpoint` points readers at it. After
    * this, replay is O(commits since checkpoint) and JSON commits at or
    * before the checkpoint may be aged out (the protocol's log-
    * retention story for long-lived tables). Simplified column layout
    * vs Delta's nested action structs; same role. Returns the
    * checkpointed version.
    */
  def writeLogCheckpoint(s: SparkSession, table: String): Long = {
    val v = latestVersion(s, table)
    require(v >= 0, s"no delta log at $table")
    val st = replay(s, table, v)
    import scala.jdk.CollectionConverters._
    val rows: java.util.List[Row] =
      (Row("metaData", null, null, st.schemaJson) +:
        st.files.map(p => Row("add", p,
          st.stats.get(p).map(_.toString).orNull, null))).asJava
    val schema = StructType(Seq(
      StructField("kind", StringType, nullable = false),
      StructField("path", StringType, nullable = true),
      StructField("stats", StringType, nullable = true),
      StructField("schemaString", StringType, nullable = true)))
    val stageDir = new Path(table, s"_stage_ckpt_${UUID.randomUUID()}")
    s.createDataFrame(rows, schema).coalesce(1)
      .write.mode("overwrite").parquet(stageDir.toString)
    val f = fs(s, stageDir)
    val part = f.listStatus(stageDir)
      .map(_.getPath).find(_.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException("checkpoint stage empty"))
    require(f.rename(part, checkpointFile(table, v)),
      "rename failed for checkpoint")
    f.delete(stageDir, true)
    val out = f.create(lastCheckpointPath(table), true) // pointer: overwrite
    try out.write(s"""{"version":$v}""".getBytes("UTF-8"))
    finally out.close()
    v
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

  private def addAction(path: String, size: Long, stats: Option[String],
      dataChange: Boolean = true): String =
    obj("add") { a =>
      a.put("path", path)
      a.putObject("partitionValues")
      a.put("size", size)
      a.put("modificationTime", 0L)
      a.put("dataChange", dataChange)
      stats.foreach(st => a.put("stats", st))
    }

  private def removeAction(path: String, dataChange: Boolean = true): String =
    obj("remove") { r =>
      r.put("path", path)
      r.put("deletionTimestamp", 0L)
      r.put("dataChange", dataChange)
    }

  // ------------------------------------------------------------------
  // Per-file stats + data skipping
  // ------------------------------------------------------------------

  /** Columns eligible for min/max stats: atomic numerics and strings. */
  private def statCols(schema: StructType): Seq[StructField] =
    schema.fields.toSeq.filter(f => f.dataType match {
      case _: NumericType | StringType => true
      case _ => false
    })

  /** One distributed pass over freshly staged files computing
    * Delta-style per-file stats (`numRecords` + min/max per eligible
    * column), keyed by relative path. A production writer collects
    * these inline inside the parquet committer; a post-write metadata
    * pass keeps this implementation honest without a custom committer
    * at the cost of one extra linear read of the NEW data only.
    */
  private def fileStats(s: SparkSession, table: String,
      files: Seq[(String, Long)], schema: StructType): Map[String, String] = {
    if (files.isEmpty) return Map.empty
    val cols = statCols(schema)
    val aggs = count(lit(1)).as("_n") +:
      cols.flatMap(f => Seq(min(col(f.name)).as(s"min_${f.name}"),
        max(col(f.name)).as(s"max_${f.name}")))
    val rows = s.read.schema(schema)
      .parquet(files.map(p => new Path(table, p._1).toString): _*)
      .groupBy(input_file_name().as("_gf"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    rows.flatMap { r =>
      val uri = r.getString(0)
      files.find(f => uri.endsWith("/" + f._1)).map { f =>
        val root = Json.createObjectNode()
        root.put("numRecords", r.getLong(1))
        val mins = root.putObject("minValues")
        val maxs = root.putObject("maxValues")
        cols.zipWithIndex.foreach { case (c, i) =>
          putVal(mins, c.name, r.get(2 + 2 * i))
          putVal(maxs, c.name, r.get(3 + 2 * i))
        }
        f._1 -> Json.writeValueAsString(root)
      }
    }.toMap
  }

  private def putVal(o: com.fasterxml.jackson.databind.node.ObjectNode,
      name: String, v: Any): Unit = v match {
    case null => ()
    case s: String => o.put(name, s)
    case b: java.lang.Byte => o.put(name, b.longValue())
    case sh: java.lang.Short => o.put(name, sh.longValue())
    case i: java.lang.Integer => o.put(name, i.longValue())
    case l: java.lang.Long => o.put(name, l.longValue())
    case f: java.lang.Float => o.put(name, f.doubleValue())
    case d: java.lang.Double => o.put(name, d.doubleValue())
    case d: java.math.BigDecimal => o.put(name, d)
    case other => o.put(name, other.toString)
  }

  private def attrName(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute => Some(a.name)
    case a: Attribute => Some(a.name)
    case _ => None
  }

  /** Literal value, looking through the casts the analyzer inserts for
    * type coercion (e.g. int literal vs bigint column).
    */
  private object Lit {
    def unapply(e: Expression): Option[Any] = e match {
      case Literal(v, _) if v != null => Some(v)
      case c: org.apache.spark.sql.catalyst.expressions.Cast => unapply(c.child)
      case _ => None
    }
  }

  /** Resolve `pred` against the table schema into an ANALYZED catalyst
    * predicate (a user Column converts lazily via ColumnNodeExpression;
    * only analysis produces the concrete comparison nodes the stats
    * evaluator matches on). Driver-side, metadata-cheap.
    */
  private def resolvedPred(s: SparkSession, schema: StructType,
      pred: Column): Expression = {
    val empty = s.createDataFrame(s.sparkContext.emptyRDD[Row], schema)
    empty.filter(pred).queryExecution.analyzed.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
    }.getOrElse(Literal(true))
  }

  /** stat-vs-literal comparison; None = incomparable (never prune). */
  private def cmp(stat: JsonNode, v: Any): Option[Int] = v match {
    case s: org.apache.spark.unsafe.types.UTF8String =>
      Some(stat.asText().compareTo(s.toString))
    case d: Decimal => Some(java.lang.Double.compare(stat.asDouble(), d.toDouble))
    case n: java.lang.Number =>
      Some(java.lang.Double.compare(stat.asDouble(), n.doubleValue()))
    case _ => None
  }

  /** Conservative "may this file contain a matching row" against its
    * min/max stats: false ONLY when the stats prove no row matches.
    * Unrecognized predicate shapes and missing stats never prune.
    */
  private def mayMatch(e: Expression, st: JsonNode): Boolean = {
    def stat(kind: String, name: String): Option[JsonNode] =
      Option(st.get(kind)).flatMap(o => Option(o.get(name)))
    def bound(name: String, v: Any)(
        lo: Int => Boolean, hi: Int => Boolean): Boolean = {
      val okLo = stat("minValues", name).flatMap(cmp(_, v)).forall(lo)
      val okHi = stat("maxValues", name).flatMap(cmp(_, v)).forall(hi)
      okLo && okHi
    }
    e match {
      case And(l, r) => mayMatch(l, st) && mayMatch(r, st)
      case Or(l, r) => mayMatch(l, st) || mayMatch(r, st)
      case EqualTo(a, Lit(v)) if attrName(a).isDefined =>
        bound(attrName(a).get, v)(_ <= 0, _ >= 0)
      case EqualTo(Lit(v), a) if attrName(a).isDefined =>
        bound(attrName(a).get, v)(_ <= 0, _ >= 0)
      case GreaterThan(a, Lit(v)) if attrName(a).isDefined =>
        stat("maxValues", attrName(a).get).flatMap(cmp(_, v)).forall(_ > 0)
      case GreaterThanOrEqual(a, Lit(v)) if attrName(a).isDefined =>
        stat("maxValues", attrName(a).get).flatMap(cmp(_, v)).forall(_ >= 0)
      case LessThan(a, Lit(v)) if attrName(a).isDefined =>
        stat("minValues", attrName(a).get).flatMap(cmp(_, v)).forall(_ < 0)
      case LessThanOrEqual(a, Lit(v)) if attrName(a).isDefined =>
        stat("minValues", attrName(a).get).flatMap(cmp(_, v)).forall(_ <= 0)
      case GreaterThan(Lit(v), a) if attrName(a).isDefined =>
        stat("minValues", attrName(a).get).flatMap(cmp(_, v)).forall(_ < 0)
      case GreaterThanOrEqual(Lit(v), a) if attrName(a).isDefined =>
        stat("minValues", attrName(a).get).flatMap(cmp(_, v)).forall(_ <= 0)
      case LessThan(Lit(v), a) if attrName(a).isDefined =>
        stat("maxValues", attrName(a).get).flatMap(cmp(_, v)).forall(_ > 0)
      case LessThanOrEqual(Lit(v), a) if attrName(a).isDefined =>
        stat("maxValues", attrName(a).get).flatMap(cmp(_, v)).forall(_ >= 0)
      case _ => true
    }
  }

  private def keptFiles(s: SparkSession, st: State,
      schema: StructType, pred: Column): Seq[String] = {
    val e = resolvedPred(s, schema, pred)
    st.files.filter(f => st.stats.get(f).forall(stats => mayMatch(e, stats)))
  }

  /** (kept, total) live-file counts for `pred` — the data-skipping
    * effectiveness measure (asserted by DeltaLiteSpec).
    */
  def pruneInfo(s: SparkSession, table: String, pred: Column): (Int, Int) = {
    val st = replay(s, table, latestVersion(s, table))
    val schema = DataType.fromJson(st.schemaJson).asInstanceOf[StructType]
    (keptFiles(s, st, schema, pred).size, st.files.size)
  }

  /** Stats-pruned scan: files whose min/max cannot satisfy `pred` are
    * never opened (file-level data skipping — the lake-metadata read
    * optimization of reference:metadata:1-53); the surviving files are
    * read and `pred` applied exactly. On a 100 TB table with range-
    * clustered files, a selective scan touches only the overlapping
    * fraction of files, on top of parquet's own row-group pruning.
    */
  def scan(s: SparkSession, table: String, pred: Column): DataFrame = {
    val st = replay(s, table, latestVersion(s, table))
    val schema = DataType.fromJson(st.schemaJson).asInstanceOf[StructType]
    val keep = keptFiles(s, st, schema, pred)
    if (keep.isEmpty) s.createDataFrame(s.sparkContext.emptyRDD[Row], schema)
    else s.read.schema(schema)
      .parquet(keep.map(p => new Path(table, p).toString): _*)
      .filter(pred)
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

  /** Atomic exclusive commit of version `v` — concurrent writers race
    * safely (one wins, one fails with an IOException the retry paths
    * catch). On local file:// paths Hadoop's `create(overwrite=false)`
    * is CHECK-then-create (two racers can both "win", silently losing
    * one commit — caught by the two-writer race spec), so the claim
    * goes through `Files.createFile` (O_EXCL, kernel-atomic) instead;
    * non-local stores keep the Hadoop create, whose put-if-absent is
    * the store's own atomic primitive.
    */
  private def writeCommit(s: SparkSession, table: String, v: Long,
      actions: Seq[String]): Unit = {
    val p = commitPath(table, v)
    val bytes = (actions.mkString("\n") + "\n").getBytes("UTF-8")
    val scheme = p.toUri.getScheme
    if (scheme == null || scheme == "file") {
      val jp = java.nio.file.Paths.get(p.toUri.getPath match {
        case "" => p.toString
        case path => path
      })
      java.nio.file.Files.createDirectories(jp.getParent)
      java.nio.file.Files.createFile(jp) // atomic O_EXCL claim
      java.nio.file.Files.write(jp, bytes)
    } else {
      val f = fs(s, p)
      f.mkdirs(logDir(table))
      val out = f.create(p, false)
      try out.write(bytes)
      finally out.close()
    }
  }

  /** Stage `df`, collect per-file stats, and return the add actions. */
  private def stagedAdds(s: SparkSession, table: String, df: DataFrame,
      schema: StructType, dataChange: Boolean = true): Seq[String] = {
    val files = stage(s, table, df)
    val stats = fileStats(s, table, files, schema)
    files.map { case (p, sz) => addAction(p, sz, stats.get(p), dataChange) }
  }

  /** Create the table (version 0) from `df`. */
  def create(s: SparkSession, table: String, df: DataFrame): Unit = {
    require(latestVersion(s, table) < 0, s"table already exists at $table")
    writeCommit(s, table, 0L,
      protocolAction +: metaDataAction(table, df.schema.json) +:
        stagedAdds(s, table, df, df.schema))
  }

  /** Append `df` as a new version. */
  def append(s: SparkSession, table: String, df: DataFrame): Unit = {
    val v = latestVersion(s, table)
    require(v >= 0, s"no delta log at $table")
    val schema = DataType.fromJson(replay(s, table, v).schemaJson)
      .asInstanceOf[StructType]
    writeCommit(s, table, v + 1, stagedAdds(s, table, df, schema))
  }

  /** Append with schema evolution: columns in `df` that the table lacks
    * WIDEN the table schema — the commit carries a new metaData action
    * with the merged schema alongside the adds, and files written
    * before the evolution read with nulls for the added columns (the
    * log's schema governs every read, not parquet inference). Existing
    * columns must keep their types; drops/retypes are rejected —
    * widening is the only evolution that never rewrites old data.
    */
  def appendEvolved(s: SparkSession, table: String, df: DataFrame): Unit = {
    val v = latestVersion(s, table)
    require(v >= 0, s"no delta log at $table")
    val old = DataType.fromJson(replay(s, table, v).schemaJson)
      .asInstanceOf[StructType]
    old.fields.foreach { f =>
      val incoming = df.schema.fields.find(_.name == f.name)
      require(incoming.isDefined,
        s"appendEvolved: column ${f.name} missing from incoming data " +
          s"(drops require a rewrite, not an append)")
      require(incoming.get.dataType == f.dataType,
        s"appendEvolved: column ${f.name} retyped " +
          s"(${f.dataType.simpleString} -> " +
          s"${incoming.get.dataType.simpleString})")
    }
    val added = df.schema.fields.filterNot(f => old.fieldNames.contains(f.name))
    val merged = StructType(old.fields ++ added)
    writeCommit(s, table, v + 1,
      metaDataAction(table, merged.json) +:
        stagedAdds(s, table, df.select(merged.fieldNames.map(col).toSeq: _*),
          merged))
  }

  /** Append under optimistic concurrency: data files are staged ONCE,
    * then the commit races — on a version conflict (another writer won
    * the put-if-absent on that commit file) we re-read the latest
    * version and retry the commit alone. Blind retry is protocol-
    * correct for appends because an append invalidates nobody's read
    * set. delete/merge/compact deliberately have no auto-retry: their
    * commits are built FROM the live file list, which the winning
    * writer may have changed — the caller must re-run on the fresh
    * snapshot. Returns the committed version.
    */
  def appendWithRetry(s: SparkSession, table: String, df: DataFrame,
      maxAttempts: Int = 10): Long = {
    val v0 = latestVersion(s, table)
    require(v0 >= 0, s"no delta log at $table")
    val schema = DataType.fromJson(replay(s, table, v0).schemaJson)
      .asInstanceOf[StructType]
    val adds = stagedAdds(s, table, df, schema)
    var attempt = 0
    while (attempt < maxAttempts) {
      val v = latestVersion(s, table) + 1
      try {
        writeCommit(s, table, v, adds)
        return v
      } catch {
        case _: java.io.IOException => attempt += 1
      }
    }
    throw new IllegalStateException(
      s"appendWithRetry: lost the commit race $maxAttempts times at $table")
  }

  /** Copy-on-write MERGE (upsert) on `keys`: source rows REPLACE
    * matching target rows and are INSERTED otherwise. Only target files
    * containing a matching key are rewritten — found by ONE semi-join
    * of the metadata-column scan against the source keys — so merging
    * a small source into a 100 TB table rewrites the touched files,
    * not the table. The rewrite itself is one anti-join (matched old
    * rows drop out) plus a union of the source.
    */
  def merge(s: SparkSession, table: String, source: DataFrame,
      keys: Seq[String]): Unit = {
    val v = latestVersion(s, table)
    require(v >= 0, s"no delta log at $table")
    val st = replay(s, table, v)
    val schema = DataType.fromJson(st.schemaJson).asInstanceOf[StructType]
    val abs = st.files.map(p => new Path(table, p).toString)
    val srcCols = source.select(schema.fieldNames.map(col).toSeq: _*)
    val srcKeys = source.select(keys.map(col): _*).distinct()
    val hitAbs =
      if (abs.isEmpty) Set.empty[String]
      else s.read.schema(schema).parquet(abs: _*)
        .withColumn("_gf", input_file_name())
        .join(srcKeys, keys, "left_semi")
        .select(col("_gf")).distinct()
        .collect().map(_.getString(0)).toSet
    val hitRel = st.files.filter(rel => hitAbs.exists(_.endsWith("/" + rel)))
    val newData =
      if (hitRel.isEmpty) srcCols
      else s.read.schema(schema)
        .parquet(hitRel.map(p => new Path(table, p).toString): _*)
        .join(srcKeys, keys, "left_anti")
        .unionByName(srcCols)
    writeCommit(s, table, v + 1,
      stagedAdds(s, table, newData, schema) ++ hitRel.map(p => removeAction(p)))
  }

  /** Bin-pack the live files into `targetFiles` larger ones — the
    * OPTIMIZE/compaction maintenance op. Content is unchanged, so both
    * the adds and removes carry `dataChange = false` (per the protocol,
    * streaming readers may skip this commit entirely).
    */
  def compact(s: SparkSession, table: String, targetFiles: Int): Unit = {
    val v = latestVersion(s, table)
    require(v >= 0, s"no delta log at $table")
    val st = replay(s, table, v)
    if (st.files.isEmpty) return
    val schema = DataType.fromJson(st.schemaJson).asInstanceOf[StructType]
    val df = s.read.schema(schema)
      .parquet(st.files.map(p => new Path(table, p).toString): _*)
      .repartition(targetFiles)
    writeCommit(s, table, v + 1,
      stagedAdds(s, table, df, schema, dataChange = false) ++
        st.files.map(p => removeAction(p, dataChange = false)))
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
    writeCommit(s, table, v + 1,
      stagedAdds(s, table, survivors, schema) ++
        hitRel.map(p => removeAction(p)))
  }
}
