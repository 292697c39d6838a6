package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained JOIN view — the two-sided generalization
  * of [[MatView]]: V = γ_{groupKeys, SUM(value)}(A ⋈_{ka=kb} B) with
  * BOTH base tables mutable. Maintenance is the textbook delta-join
  * identity over signed multiplicities:
  *
  *   A'⋈B' − A⋈B  =  ΔA ⋈ B'  ∪  A ⋈ ΔB
  *
  * (ΔA against the NEW right snapshot, ΔB against the OLD left one —
  * each exactly once, so the cross-delta term is never double-counted).
  * Deltas come from the table format's change feed (insert = +1,
  * delete = −1; updates arrive as delete+insert pairs), old snapshots
  * from time travel. A joined contribution's weight is the product of
  * its sides' weights; SUM/COUNT are self-inverse under signed
  * weights, so the merge is a pure union + re-aggregate of the stored
  * view — no base recompute.
  *
  * Refresh cost is O(ΔA ⋈ B + A_old ⋈ ΔB + |view|): fact-side changes
  * cost one delta-join against the dim; dim-side changes touch only
  * fact rows referencing the CHANGED dim keys (ΔB is broadcast and the
  * semi-filter pushes into the fact scan) — the irreducible work, since
  * exactly those contributions move groups. Never a full A⋈B rebuild.
  *
  * Scope: equi-join on one key pair, group keys from the RIGHT (dim)
  * side, summed value from the LEFT (fact) side — the canonical
  * fact⋈dim rollup. Storage/versioning follows MatView (versioned
  * snapshot dirs + a state.json pointer; [[stateToken]]/[[restoreState]]
  * delegate to the same idiom).
  */
object JoinMatView {

  private val Json = new ObjectMapper()

  private def fs(s: SparkSession, p: Path): FileSystem =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  private def statePath(mvDir: String) = new Path(mvDir, "state.json")

  private case class State(aTable: String, aVersion: Long,
      bTable: String, bVersion: Long, keyA: String, keyB: String,
      groupKeys: Seq[String], valueCol: String, dataRel: String,
      prec: Int, scale: Int) {
    def valueType: String = s"decimal($prec,$scale)"
    def sumType: String = s"decimal(32,$scale)"
  }

  private def writeState(s: SparkSession, mvDir: String, st: State): Unit = {
    val root = Json.createObjectNode()
    root.put("aTable", st.aTable); root.put("aVersion", st.aVersion)
    root.put("bTable", st.bTable); root.put("bVersion", st.bVersion)
    root.put("keyA", st.keyA); root.put("keyB", st.keyB)
    val gs = root.putArray("groupKeys")
    st.groupKeys.foreach(gs.add)
    root.put("valueCol", st.valueCol)
    root.put("dataRel", st.dataRel)
    root.put("prec", st.prec); root.put("scale", st.scale)
    val p = statePath(mvDir)
    val f = fs(s, p)
    f.mkdirs(p.getParent)
    val out = f.create(p, true)
    try out.write(Json.writeValueAsString(root).getBytes("UTF-8"))
    finally out.close()
  }

  private def readState(s: SparkSession, mvDir: String): State = {
    val p = statePath(mvDir)
    val f = fs(s, p)
    require(f.exists(p), s"no join materialized view at $mvDir")
    val in = f.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val n = Json.readTree(text)
    val gs = Seq.newBuilder[String]
    n.get("groupKeys").elements().forEachRemaining(e => gs += e.asText())
    State(n.get("aTable").asText(), n.get("aVersion").asLong(),
      n.get("bTable").asText(), n.get("bVersion").asLong(),
      n.get("keyA").asText(), n.get("keyB").asText(), gs.result(),
      n.get("valueCol").asText(), n.get("dataRel").asText(),
      n.get("prec").asInt(), n.get("scale").asInt())
  }

  /** Weighted contribution rows of `a ⋈ b`: group keys from b, value
    * from a, weight = wa·wb.
    */
  private def joined(a: DataFrame, wa: org.apache.spark.sql.Column,
      b: DataFrame, wb: org.apache.spark.sql.Column,
      st: State): DataFrame =
    a.select(col(st.keyA), col(st.valueCol), wa.as("_wa"))
      .join(b.select(col(st.keyB) +:
          st.groupKeys.map(col) :+ wb.as("_wb"): _*),
        col(st.keyA) === col(st.keyB))
      .select(st.groupKeys.map(col) :+ col(st.valueCol) :+
        (col("_wa") * col("_wb")).as("_w"): _*)

  private def aggregate(rows: DataFrame, st: State): DataFrame =
    rows.groupBy(st.groupKeys.map(col): _*)
      .agg(
        sum(col(st.valueCol).cast(st.valueType) * col("_w"))
          .cast(st.sumType).as("sum_val"),
        sum(col("_w")).cast("long").as("n"))

  /** Build the view with one join of the two current snapshots and
    * record both versions as the refresh floor.
    */
  def create(s: SparkSession, aTable: String, bTable: String,
      mvDir: String, keyA: String, keyB: String, groupKeys: Seq[String],
      valueCol: String, valueDecimal: (Int, Int) = (12, 2)): Unit = {
    require(!fs(s, statePath(mvDir)).exists(statePath(mvDir)),
      s"join materialized view already exists at $mvDir")
    val va = DeltaLite.latestVersion(s, aTable)
    val vb = DeltaLite.latestVersion(s, bTable)
    require(va >= 0 && vb >= 0, s"no delta log at $aTable or $bTable")
    val st = State(aTable, va, bTable, vb, keyA, keyB, groupKeys,
      valueCol, "v0", valueDecimal._1, valueDecimal._2)
    aggregate(joined(DeltaLite.snapshot(s, aTable, va), lit(1),
      DeltaLite.snapshot(s, bTable, vb), lit(1), st), st)
      .write.parquet(s"$mvDir/v0")
    writeState(s, mvDir, st)
  }

  /** Current view contents: groupKeys, `sum_val` (exact DECIMAL), `n`. */
  def read(s: SparkSession, mvDir: String): DataFrame = {
    val st = readState(s, mvDir)
    s.read.parquet(s"$mvDir/${st.dataRel}")
  }

  /** See [[MatView.stateToken]] — same rollback idiom. */
  def stateToken(s: SparkSession, mvDir: String): String = {
    val p = statePath(mvDir)
    val f = fs(s, p)
    require(f.exists(p), s"no join materialized view at $mvDir")
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** See [[MatView.restoreState]]. */
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

  /** Fold BOTH tables' changes since the last refresh into the view
    * via the delta-join identity. Returns (aVersion, bVersion) now
    * reflected; a no-op performs no read and no write.
    */
  def refresh(s: SparkSession, mvDir: String): (Long, Long) = {
    val st = readState(s, mvDir)
    val curA = DeltaLite.latestVersion(s, st.aTable)
    val curB = DeltaLite.latestVersion(s, st.bTable)
    if (curA == st.aVersion && curB == st.bVersion) return (curA, curB)
    val w = when(col("_change_type") === "insert", lit(1))
      .otherwise(lit(-1))
    val parts = Seq.newBuilder[DataFrame]
    if (curA != st.aVersion) {
      // ΔA ⋈ B_new (the NEW right snapshot).
      val dA = DeltaLite.tableChanges(s, st.aTable, st.aVersion, curA)
      parts += joined(dA, w, DeltaLite.snapshot(s, st.bTable, curB),
        lit(1), st)
    }
    if (curB != st.bVersion) {
      // A_old ⋈ ΔB (the OLD left snapshot): ΔB is change-sized —
      // broadcast it so the semi-filter reaches the fact scan.
      val dB = DeltaLite.tableChanges(s, st.bTable, st.bVersion, curB)
      parts += joined(DeltaLite.snapshot(s, st.aTable, st.aVersion),
        lit(1), broadcast(dB), w, st)
    }
    val delta = aggregate(parts.result().reduce(_ unionByName _), st)
    val merged = read(s, mvDir).unionByName(delta)
      .groupBy(st.groupKeys.map(col): _*)
      .agg(sum(col("sum_val")).cast(st.sumType).as("sum_val"),
        sum(col("n")).cast("long").as("n"))
      .filter(col("n") > 0)
    val nextRel = s"v${st.dataRel.stripPrefix("v").toLong + 1}"
    merged.write.parquet(s"$mvDir/$nextRel")
    writeState(s, mvDir,
      st.copy(aVersion = curA, bVersion = curB, dataRel = nextRel))
    (curA, curB)
  }
}
