package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated test tables (TESTDATA.md).
  *
  * All access goes through `spark.read.parquet` so Catalyst owns column
  * pruning and predicate pushdown; at 100 TB these same calls point at a
  * partitioned lake path and nothing else changes.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** The conf key that lets the parquet reader surface TIMESTAMP(NANOS)
    * columns as longs. This HAS to be a session conf: Spark's
    * ParquetFileFormat.buildReaderWithPartitionValues re-sets this key
    * into the scan's hadoop conf from the SESSION conf when it builds
    * the per-file reader, clobbering any per-read `.option(...)` — a
    * read option works for schema inference but fails at execution
    * (PARQUET_TYPE_ILLEGAL).
    */
  val NanosAsLong = "spark.sql.legacy.parquet.nanosAsLong"

  /** `events.ts` has shipped in two parquet physical types across
    * testdata generations: TIMESTAMP(MICROS) (current — Spark reads it
    * natively) and TIMESTAMP(NANOS) (legacy — Spark's max precision is
    * micros, so it only surfaces via [[NanosAsLong]] as a long which we
    * truncate to micros, matching DuckDB's read of the same file).
    * Branch on the *scanned* dtype so both generations read correctly.
    * Setting the session conf is unavoidable for the legacy path (see
    * [[NanosAsLong]]); it is additive-only and idempotent.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set(NanosAsLong, "true")
    val df = apply(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // Parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) scans as NTZ.
        // Cast to the session-tz type: the engine runs UTC (GraftSession),
        // so the micros value is preserved bit-for-bit and every
        // downstream consumer (watermarks, day() partition transforms,
        // timestamp arithmetic) sees the same TimestampType the legacy
        // nanos path produced — and DuckDB's naive read of the same file.
        df.withColumn("ts",
          df.col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df // already session-tz TIMESTAMP — use as scanned
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
