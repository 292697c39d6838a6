package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteFromTable, InsertIntoStatement, LogicalPlan, UpdateTable}
import org.apache.spark.sql.graft.Glue

import graft.sources.DeltaLite

/** SQL DML against the lake table format — the reference's
  * `Connection::Query` path (reference:duckdb:24-35) extended from
  * SELECT to DML: the statement goes through Spark's OWN parser
  * (`sqlParser.parsePlan`), yielding the standard Catalyst DML plans
  * (`DeleteFromTable` / `UpdateTable` / `InsertIntoStatement`), and this
  * front-end binds the named table to a DeltaLite path and executes the
  * plan via the table format's pruned copy-on-write operations. No
  * bespoke SQL parsing anywhere — the grammar, precedence, literals and
  * expression tree are all Spark's, exactly how Delta Lake's own SQL
  * support hooks the parsed plan.
  *
  * INSERT source queries run through the session's registered views
  * ([[Sql.open]]) with full Catalyst optimization; conditions and
  * assignment expressions pass as unresolved Catalyst trees and resolve
  * against the table's schema inside DeltaLite (same path as the
  * DataFrame API's Column predicates).
  */
object LakeSql {

  private def nameOf(rel: LogicalPlan): String = rel match {
    case r: UnresolvedRelation => r.multipartIdentifier.last
    case other =>
      throw new IllegalArgumentException(s"unsupported DML target: $other")
  }

  /** Execute one DML statement. `tables` maps statement table names to
    * DeltaLite paths. Returns the affected table's path.
    */
  def execute(s: SparkSession, tables: Map[String, String],
      sql: String): String = {
    def pathOf(rel: LogicalPlan): String = {
      val n = nameOf(rel)
      tables.getOrElse(n,
        throw new IllegalArgumentException(s"unknown lake table $n"))
    }
    s.sessionState.sqlParser.parsePlan(sql) match {
      case DeleteFromTable(rel, cond) =>
        val p = pathOf(rel)
        DeltaLite.deleteWhere(s, p, Glue.column(cond))
        p
      case UpdateTable(rel, assignments, cond) =>
        val p = pathOf(rel)
        val asg = assignments.map {
          case Assignment(k: UnresolvedAttribute, v) =>
            k.name -> Glue.column(v)
          case a =>
            throw new IllegalArgumentException(s"unsupported assignment $a")
        }.toMap
        DeltaLite.updateWhere(s, p,
          cond.map(Glue.column).getOrElse(
            org.apache.spark.sql.functions.lit(true)), asg)
        p
      case ins: InsertIntoStatement if !ins.overwrite =>
        val p = pathOf(ins.table)
        DeltaLite.append(s, p, Glue.dataFrame(s, ins.query))
        p
      case other =>
        throw new IllegalArgumentException(
          s"unsupported lake DML statement: ${other.getClass.getSimpleName}")
    }
  }
}
