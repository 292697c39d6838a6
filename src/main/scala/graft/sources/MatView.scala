package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized aggregate over a DeltaLite
  * table, driven by the change data feed — the view-maintenance
  * capability a warehouse builds on top of a table format's CDC stream
  * (reference:metadata:1-53's "what the metadata layer enables" story).
  *
  * The view is `GROUP BY keys → (exact-decimal SUM(valueCol), COUNT)`.
  * [[refresh]] reads ONLY the base table's changes since the last
  * refreshed version ([[DeltaLite.tableChanges]] — appends-only windows
  * read just the added files), turns inserts into +1-weighted and
  * deletes into −1-weighted contributions, aggregates the DELTA, and
  * merges it with the stored view. Refresh cost is therefore
  * O(changes + |view|), never O(base): at 100 TB the base is petabytes,
  * the delta is one commit's files, and the view is |groups| rows.
  * SUM/COUNT are self-inverse under signed weights, which is what makes
  * the merge a pure union+re-aggregate (no base rescan even for
  * deletes); a non-invertible aggregate (MIN/MAX) would need a
  * per-group recompute of only the affected groups instead.
  *
  * Storage: versioned parquet snapshots under `mvDir/v{N}` plus a
  * `state.json` pointer (current data dir, base version, spec). A
  * refresh writes the next snapshot dir then swaps the pointer, so
  * concurrent readers of the previous snapshot are never disturbed.
  * The running SUM is held as an exact DECIMAL of the caller-declared
  * value scale (precision widened to 32) — order-independent and
  * merge-safe across refreshes.
  */
object MatView {

  private val Json = new ObjectMapper()

  private def fs(s: SparkSession, p: Path): FileSystem =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  private def statePath(mvDir: String) = new Path(mvDir, "state.json")

  private case class State(baseTable: String, baseVersion: Long,
      keys: Seq[String], valueCol: String, dataRel: String,
      prec: Int, scale: Int) {
    def valueType: String = s"decimal($prec,$scale)"
    // Accumulator widened to precision 32: room for ~10^(32-prec)
    // summed rows before overflow could matter.
    def sumType: String = s"decimal(32,$scale)"
  }

  private def writeState(s: SparkSession, mvDir: String, st: State): Unit = {
    val root = Json.createObjectNode()
    root.put("baseTable", st.baseTable)
    root.put("baseVersion", st.baseVersion)
    val ks = root.putArray("keys")
    st.keys.foreach(ks.add)
    root.put("valueCol", st.valueCol)
    root.put("dataRel", st.dataRel)
    root.put("prec", st.prec)
    root.put("scale", st.scale)
    val f = fs(s, statePath(mvDir))
    val out = f.create(statePath(mvDir), true)
    try out.write(Json.writeValueAsString(root).getBytes("UTF-8"))
    finally out.close()
  }

  private def readState(s: SparkSession, mvDir: String): State = {
    val p = statePath(mvDir)
    val f = fs(s, p)
    require(f.exists(p), s"no materialized view at $mvDir")
    val in = f.open(p)
    val txt =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val n = Json.readTree(txt)
    State(n.get("baseTable").asText(), n.get("baseVersion").asLong(),
      {
        import scala.jdk.CollectionConverters._
        n.get("keys").elements().asScala.map(_.asText()).toSeq
      },
      n.get("valueCol").asText(), n.get("dataRel").asText(),
      n.get("prec").asInt(), n.get("scale").asInt())
  }

  /** Signed aggregate of `rows` (weight +1 insert / −1 delete). */
  private def aggregate(rows: DataFrame, st: State,
      weight: org.apache.spark.sql.Column): DataFrame =
    rows.groupBy(st.keys.map(col): _*)
      .agg(
        sum(col(st.valueCol).cast(st.valueType) * weight).cast(st.sumType)
          .as("sum_val"),
        sum(weight).cast("long").as("n"))

  /** Build the view with one full scan of the base table's current
    * snapshot and record the snapshot's version as the refresh floor.
    */
  def create(s: SparkSession, baseTable: String, mvDir: String,
      keys: Seq[String], valueCol: String,
      valueDecimal: (Int, Int) = (12, 2)): Unit = {
    require(!fs(s, statePath(mvDir)).exists(statePath(mvDir)),
      s"materialized view already exists at $mvDir")
    val v = DeltaLite.latestVersion(s, baseTable)
    require(v >= 0, s"no delta log at $baseTable")
    val st = State(baseTable, v, keys, valueCol, "v0",
      valueDecimal._1, valueDecimal._2)
    aggregate(DeltaLite.snapshot(s, baseTable, v), st, lit(1))
      .write.parquet(s"$mvDir/v0")
    writeState(s, mvDir, st)
  }

  /** Current view contents: keys, `sum_val` (exact DECIMAL), `n`. */
  def read(s: SparkSession, mvDir: String): DataFrame = {
    val st = readState(s, mvDir)
    s.read.parquet(s"$mvDir/${st.dataRel}")
  }

  /** Opaque snapshot of the view's current metadata (the state.json
    * text). Pair with [[restoreState]] for a metadata-only rollback —
    * the benchmarking idiom that lets one memoized build serve many
    * measured refreshes against identical state.
    */
  def stateToken(s: SparkSession, mvDir: String): String = {
    val p = statePath(mvDir)
    val f = fs(s, p)
    require(f.exists(p), s"no materialized view at $mvDir")
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** Point the view back at the snapshot a [[stateToken]] captured and
    * drop every data snapshot written after it (they are unreachable
    * once the pointer moves back, and the next refresh re-writes their
    * dir names). Metadata-only apart from deleting the stale dirs.
    */
  def restoreState(s: SparkSession, mvDir: String, token: String): Unit = {
    val n = Json.readTree(token)
    val keepV = n.get("dataRel").asText().stripPrefix("v").toLong
    val f = fs(s, statePath(mvDir))
    f.listStatus(new Path(mvDir)).map(_.getPath)
      .filter(p => p.getName.startsWith("v") &&
        p.getName.stripPrefix("v").forall(_.isDigit) &&
        p.getName.stripPrefix("v").toLong > keepV)
      .foreach(p => f.delete(p, true))
    val out = f.create(statePath(mvDir), true)
    try out.write(token.getBytes("UTF-8")) finally out.close()
  }

  /** Fold the base table's changes since the last refresh into the
    * view. Returns the base version the view now reflects; a no-op
    * (already current) performs no read and no write at all.
    */
  def refresh(s: SparkSession, mvDir: String): Long = {
    val st = readState(s, mvDir)
    val cur = DeltaLite.latestVersion(s, st.baseTable)
    if (cur == st.baseVersion) return cur
    val changes = DeltaLite.tableChanges(s, st.baseTable, st.baseVersion, cur)
    val w = when(col("_change_type") === "insert", lit(1)).otherwise(lit(-1))
    val delta = aggregate(changes, st, w)
    val merged = read(s, mvDir).unionByName(delta)
      .groupBy(st.keys.map(col): _*)
      .agg(sum(col("sum_val")).cast(st.sumType).as("sum_val"),
        sum(col("n")).cast("long").as("n"))
      .filter(col("n") > 0)
    val nextRel = s"v${st.dataRel.stripPrefix("v").toLong + 1}"
    merged.write.parquet(s"$mvDir/$nextRel")
    writeState(s, mvDir, st.copy(baseVersion = cur, dataRel = nextRel))
    cur
  }
}
