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

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark cannot read
    * natively (max precision: micros). Read nanos as long and truncate
    * to micros — exactly what DuckDB's read of the same file yields, so
    * oracle comparisons stay bit-identical. Setting the session conf
    * here is unavoidable (see [[NanosAsLong]]); it is additive-only and
    * idempotent, and production sessions should set it at build time.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set(NanosAsLong, "true")
    apply(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
