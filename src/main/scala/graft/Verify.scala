package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** Scalar-output lint: every oracle-gated key must emit ONLY atomic
    * top-level columns — the driver's comparator sorts+hashes rows
    * through pandas, and an array/map/struct cell crashes its lexsort
    * (the r11 x92 failure mode). Declared rows-only keys (no oracle)
    * are exempt: their outputs are engine-owned (EXPLAIN text etc.)
    * and spec-asserted instead. Runs on every Verify dump, so a
    * non-scalar column fails HERE, loudly, before the driver's gate.
    */
  def assertScalarOutput(name: String,
      schema: org.apache.spark.sql.types.StructType): Unit = {
    if (Registry.byName.get(name).exists(_.oracle.isDefined)) {
      import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
      val bad = schema.fields.filter(f => f.dataType match {
        case _: ArrayType | _: MapType | _: StructType => true
        case _ => false
      })
      require(bad.isEmpty,
        s"$name: oracle-gated output must be scalar-only, but " +
          bad.map(f => s"${f.name}: ${f.dataType.simpleString}")
            .mkString(", ") +
          " is nested — serialize it (array_to_string/to_json) or " +
          "unnest with an ordinal")
    }
  }

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // Optional third arg: comma-separated query names to (re)run.
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession
      .builder(s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        assertScalarOutput(name, df.schema)
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
