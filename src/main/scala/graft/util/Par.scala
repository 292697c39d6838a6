package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine numeric parity helpers.
  *
  * The driver hash-compares Spark results against DuckDB. Floating-point
  * SUMs are order-dependent, and Spark/DuckDB aggregate in different
  * orders — so every money aggregation here runs in exact DECIMAL
  * arithmetic (bit-identical in both engines regardless of order) and is
  * cast to DOUBLE only at the very end (a deterministic conversion).
  * Source money columns are clean 2-decimal values, so the
  * double→DECIMAL(12,2) cast is exact, never a rounding tie.
  *
  * Precision bookkeeping (Spark rules): (12,2)*(12,2)→(25,4),
  * (25,4)*(12,2)→(38,6) — no precision loss anywhere in the chain.
  */
object Par {
  val D2: DecimalType = DecimalType(12, 2)

  /** Exact decimal view of a clean 2-decimal double column. */
  def dec2(c: Column): Column = c.cast(D2)
  /** (1 - x) as exact DECIMAL(12,2), e.g. 1 - l_discount. */
  def oneMinus(c: Column): Column = (lit(1) - dec2(c)).cast(D2)
  /** (1 + x) as exact DECIMAL(12,2), e.g. 1 + l_tax. */
  def onePlus(c: Column): Column = (lit(1) + dec2(c)).cast(D2)
  /** Exact decimal sum emitted as double (deterministic in both engines). */
  def moneySum(c: Column): Column = sum(c).cast("double")
  /** Exact average: decimal sum cast to double, divided by count. */
  def moneyAvg(c: Column): Column =
    sum(dec2(c)).cast("double") / count(lit(1))

  // SQL-side mirrors for the DuckDB oracle strings.
  def sDec2(e: String): String = s"CAST($e AS DECIMAL(12,2))"
  def sOneMinus(e: String): String = s"CAST(1 - ${sDec2(e)} AS DECIMAL(12,2))"
  def sOnePlus(e: String): String = s"CAST(1 + ${sDec2(e)} AS DECIMAL(12,2))"
  def sMoneySum(e: String): String = s"CAST(SUM($e) AS DOUBLE)"
  def sMoneyAvg(e: String): String = s"CAST(SUM(${sDec2(e)}) AS DOUBLE)/COUNT(*)"
}
