package graft.util

import org.apache.spark.sql.DataFrame

/** Plan-shape predicates shared by the DML paths. */
object Plans {

  /** True when every expression in `df`'s analyzed plan (subqueries
    * included) is deterministic — the gate for evaluating a
    * multi-consumed DML source more than once instead of paying a
    * materialization job for it (guide §5: cache only when recomputing
    * costs more than the memory pressure; a deterministic source
    * re-evaluates to the same rows by definition).
    */
  def deterministic(df: DataFrame): Boolean =
    df.queryExecution.analyzed.collectWithSubqueries {
      case n if n.expressions.exists(e => e.exists(!_.deterministic)) => n
    }.isEmpty
}
