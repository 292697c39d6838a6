package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability: a Spark-first implementation plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle query the driver
  * hash-compares against. `name` is the SURVEY.md §2 inventory key.
  */
final case class GQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)
