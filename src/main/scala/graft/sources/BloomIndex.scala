package graft.sources

import java.util.Base64

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Per-file bloom-filter index for point lookups on a DeltaLite table —
  * the data-skipping lever min/max stats don't have: a high-cardinality
  * key spread uniformly across files overlaps EVERY file's [min, max],
  * so stats keep everything, while a per-file bloom keeps only the
  * files that (probably) contain the looked-up value. This is the same
  * capability as Parquet column bloom filters / Delta's bloom-filter
  * index, maintained here as a table-level sidecar
  * (`_index/bloom-{col}.json`: file name → serialized
  * `org.apache.spark.util.sketch.BloomFilter`).
  *
  * Scale shape: [[build]] is one distributed scan — values group by
  * their data file (`groupByKey` on the file name, one bloom built per
  * group, map-side nothing to combine since groups ARE files) and only
  * the finished bloom bytes (a few KB × #files) return to the driver.
  * [[lookupScan]] consults the index driver-side (metadata-sized),
  * reads ONLY surviving files through the table's normal DV-aware
  * subset reader, and re-applies the exact predicate (bloom false
  * positives filter out here).
  *
  * Staleness contract: files added to the table AFTER the index was
  * built have no bloom entry and are always kept (conservative — a
  * lookup is never wrong, only less pruned); rebuild to re-tighten.
  * Values are indexed by their canonical STRING rendering (cast both at
  * build and probe), keeping the index type-agnostic.
  */
object BloomIndex {

  private val Json = new ObjectMapper()

  private def fs(s: SparkSession, p: Path): FileSystem =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  private def indexPath(table: String, column: String) =
    new Path(table, s"_index/bloom-$column.json")

  /** Build (or rebuild) the index for `column`. `expectedPerFile` and
    * `fpp` size each file's bloom (default 1% false-positive rate).
    */
  def build(s: SparkSession, table: String, column: String,
      expectedPerFile: Long = 100000L, fpp: Double = 0.01): Unit = {
    import s.implicits._
    val rels = DeltaLite.liveFiles(s, table)
    val byName = rels.map(r => r.substring(r.lastIndexOf('/') + 1) -> r).toMap
    val rows = DeltaLite.readSubset(s, table, rels, fileCol = Some("_bf_file"))
      .select(col("_bf_file"), col(column).cast("string").as("_bf_val"))
      .filter(col("_bf_val").isNotNull)
      .as[(String, String)]
    val blooms: Array[(String, String)] = rows.groupByKey(_._1)
      .mapGroups { (file, it) =>
        val bf = BloomFilter.create(expectedPerFile, fpp)
        it.foreach(v => bf.putString(v._2))
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos)
        (file, Base64.getEncoder.encodeToString(bos.toByteArray))
      }
      .collect()
    val root = Json.createObjectNode()
    root.put("column", column)
    val files = root.putObject("files")
    blooms.foreach { case (name, b64) =>
      byName.get(name).foreach(rel => files.put(rel, b64))
    }
    val p = indexPath(table, column)
    val f = fs(s, p)
    f.mkdirs(p.getParent)
    val out = f.create(p, true)
    try out.write(Json.writeValueAsString(root).getBytes("UTF-8"))
    finally out.close()
  }

  private def readIndex(s: SparkSession, table: String,
      column: String): Map[String, BloomFilter] = {
    val p = indexPath(table, column)
    val f = fs(s, p)
    require(f.exists(p), s"no bloom index on $column at $table")
    val in = f.open(p)
    val txt =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    Json.readTree(txt).get("files").properties().asScala.map { e =>
      val bytes = Base64.getDecoder.decode(e.getValue.asText())
      e.getKey -> BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
    }.toMap
  }

  /** Live files surviving the bloom probe for `values` — unindexed
    * (post-build) files are always kept.
    */
  private def keptFiles(s: SparkSession, table: String, column: String,
      values: Seq[Any]): (Seq[String], Int) = {
    val idx = readIndex(s, table, column)
    val probes = values.map(String.valueOf)
    val live = DeltaLite.liveFiles(s, table)
    val kept = live.filter { rel =>
      idx.get(rel) match {
        case Some(bf) => probes.exists(bf.mightContainString)
        case None => true // added after the build: conservative
      }
    }
    (kept, live.size)
  }

  /** (kept, total) file counts for a lookup (spec assertion hook). */
  def pruneInfo(s: SparkSession, table: String, column: String,
      values: Seq[Any]): (Int, Int) = {
    val (kept, total) = keptFiles(s, table, column, values)
    (kept.size, total)
  }

  /** Exact point lookup `column IN (values)` reading only the files
    * whose bloom might contain one of the values.
    */
  def lookupScan(s: SparkSession, table: String, column: String,
      values: Seq[Any]): DataFrame = {
    val (kept, _) = keptFiles(s, table, column, values)
    DeltaLite.readSubset(s, table, kept)
      .filter(col(column).isin(values: _*))
  }
}
