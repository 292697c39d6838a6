package graft.util

import org.apache.spark.sql.{Column, DataFrame}

/** Parallelism hygiene for CPU-heavy per-row stages (minhash, shingling,
  * decode).
  *
  * The test parquet files are single-row-group → a 1-task scan that would
  * serialize any per-row CPU behind it. A 100 TB lake scan is the
  * opposite: thousands of input splits, where an unconditional
  * `repartition` would re-shuffle the entire corpus — doubling the most
  * expensive IO in the job for nothing. [[widen]] reconciles the two:
  * it exchanges ONLY when the scan's parallelism is below the cluster's,
  * so small/test inputs fan out and well-split lake scans pass through
  * untouched.
  */
object Scale {

  /** Session conf key: "auto" (default) inspects the input's partition
    * count per call; "never" passes through untouched (zero planning
    * cost — set on clusters where every scan is known well-split);
    * "always" exchanges unconditionally (debug/small-lake escape hatch).
    */
  val Mode = "spark.graft.scale.widen"

  /** Repartition `df` by `key` iff its current partition count is below
    * `target` (default: the cluster's scheduling parallelism). Inspecting
    * the partition count forces an extra physical planning of `df` (no
    * job runs) — at very high query rates set [[Mode]] to "never"
    * instead of paying it per call.
    */
  def widen(df: DataFrame, key: Column, target: Int = 0): DataFrame = {
    val goal =
      if (target > 0) target
      else df.sparkSession.sparkContext.defaultParallelism
    df.sparkSession.conf.get(Mode, "auto") match {
      case "never" => df
      case "always" => df.repartition(goal, key)
      case _ =>
        if (df.rdd.getNumPartitions < goal) df.repartition(goal, key) else df
    }
  }
}
