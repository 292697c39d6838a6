package graft

import org.apache.spark.sql.functions._
import graft.sources.{DeltaLite, IcebergLite}

/** BEGIN/COMMIT/ROLLBACK — the compensating-transaction contract
  * (LakeSql): rollback restores every touched table across BOTH lake
  * formats and unwinds catalog DDL in reverse; commit keeps effects;
  * non-undoable statements refuse inside a transaction.
  */
class TxnSpec extends SparkSpec {

  private def fresh() = {
    val s = spark.newSession()
    Sql.open(s, sfDir)
    s
  }

  test("ROLLBACK restores DML across both formats; COMMIT keeps it; " +
      "history retains the compensated commits") {
    val s = fresh()
    val base = graft.util.Scratch.dir("txnspec")
    LakeSql.script(s, s"""
      CREATE TABLE tx_d USING deltalite LOCATION '$base/tx_d'
        AS SELECT c_custkey, c_acctbal FROM customer
           WHERE c_custkey <= 100;
      CREATE TABLE tx_i USING iceberglite LOCATION '$base/tx_i'
        AS SELECT n_nationkey, n_name FROM nation""")
    val d0 = LakeSql.sql(s, "SELECT COUNT(*) AS n FROM tx_d")
      .head.getLong(0)
    val preVersion = DeltaLite.latestVersion(s, s"$base/tx_d")

    LakeSql.sql(s, "BEGIN TRANSACTION")
    LakeSql.sql(s, "DELETE FROM tx_d WHERE c_custkey <= 50")
    LakeSql.sql(s, "UPDATE tx_d SET c_acctbal = 0 WHERE c_custkey > 90")
    LakeSql.sql(s, "DELETE FROM tx_i WHERE n_nationkey < 20")
    // In-transaction reads see the transaction's own writes.
    assert(LakeSql.sql(s, "SELECT COUNT(*) AS n FROM tx_d")
      .head.getLong(0) < d0)
    assert(LakeSql.sql(s, "SELECT COUNT(*) AS n FROM tx_i")
      .head.getLong(0) == 5L)
    LakeSql.sql(s, "ROLLBACK")

    assert(LakeSql.sql(s, "SELECT COUNT(*) AS n FROM tx_d")
      .head.getLong(0) == d0)
    assert(LakeSql.sql(s,
      "SELECT COUNT(*) AS n FROM tx_d WHERE c_acctbal = 0")
      .head.getLong(0) == 0L)
    assert(LakeSql.sql(s, "SELECT COUNT(*) AS n FROM tx_i")
      .head.getLong(0) == 25L)
    // Compensating, not erasing: the in-transaction delta commits stay
    // in the log (time-travelable) and the restore is a NEW version.
    assert(DeltaLite.latestVersion(s, s"$base/tx_d") > preVersion + 1)

    LakeSql.sql(s, "BEGIN")
    LakeSql.sql(s, "DELETE FROM tx_d WHERE c_custkey <= 10")
    LakeSql.sql(s, "COMMIT")
    assert(LakeSql.sql(s, "SELECT COUNT(*) AS n FROM tx_d")
      .head.getLong(0) == d0 - 11)
  }

  test("catalog DDL unwinds in reverse: CTAS drops, DROP re-registers " +
      "with data intact, replaced views restore their old text") {
    val s = fresh()
    val base = graft.util.Scratch.dir("txnddl")
    LakeSql.script(s, s"""
      CREATE TABLE ddl_keep USING deltalite LOCATION '$base/ddl_keep'
        AS SELECT r_regionkey, r_name FROM region;
      CREATE VIEW ddl_v AS SELECT COUNT(*) AS n FROM ddl_keep""")
    assert(LakeSql.sql(s, "SELECT n FROM ddl_v").head.getLong(0) == 5L)

    LakeSql.sql(s, "BEGIN")
    LakeSql.sql(s, s"""CREATE TABLE ddl_tmp USING iceberglite
      LOCATION '$base/ddl_tmp' AS SELECT 1 AS x""")
    LakeSql.sql(s, "DROP TABLE ddl_keep")
    LakeSql.sql(s,
      "CREATE OR REPLACE VIEW ddl_v AS SELECT CAST(0 AS BIGINT) AS n")
    assert(LakeSql.sql(s, "SELECT n FROM ddl_v").head.getLong(0) == 0L)
    LakeSql.sql(s, "ROLLBACK")

    // CTAS gone, dropped table back (data intact), view text restored.
    intercept[Exception] {
      LakeSql.sql(s, "SELECT * FROM ddl_tmp").collect()
    }
    assert(LakeSql.sql(s, "SELECT COUNT(*) AS n FROM ddl_keep")
      .head.getLong(0) == 5L)
    assert(LakeSql.sql(s, "SELECT n FROM ddl_v").head.getLong(0) == 5L)

    // DROP VIEW rolls back too.
    LakeSql.sql(s, "BEGIN")
    LakeSql.sql(s, "DROP VIEW ddl_v")
    LakeSql.sql(s, "ROLLBACK")
    assert(LakeSql.sql(s, "SELECT n FROM ddl_v").head.getLong(0) == 5L)
  }

  test("ALTER TABLE inside a transaction rolls back the schema") {
    val s = fresh()
    val base = graft.util.Scratch.dir("txnalter")
    LakeSql.sql(s, s"""CREATE TABLE alt_t USING deltalite
      LOCATION '$base/alt_t'
      AS SELECT r_regionkey FROM region""")
    LakeSql.sql(s, "BEGIN")
    LakeSql.sql(s, "ALTER TABLE alt_t ADD COLUMNS (extra INT)")
    assert(LakeSql.sql(s, "SELECT * FROM alt_t").columns
      .contains("extra"))
    LakeSql.sql(s, "ROLLBACK")
    assert(!LakeSql.sql(s, "SELECT * FROM alt_t").columns
      .contains("extra"))
  }

  test("ICEBERG schema evolution rolls back: schema changes move no " +
      "snapshot, so the txn anchor must carry the schema id (r17 fix)") {
    val s = fresh()
    val base = graft.util.Scratch.dir("txnalter_ice")
    LakeSql.sql(s, s"""CREATE TABLE alt_i USING iceberglite
      LOCATION '$base/alt_i'
      AS SELECT n_nationkey, n_name, n_regionkey FROM nation""")
    // ALTER-only transaction: drop + rename + add, then ROLLBACK —
    // the pre-transaction schema AND its data must return intact.
    LakeSql.sql(s, "BEGIN")
    LakeSql.sql(s, "ALTER TABLE alt_i DROP COLUMN n_regionkey")
    LakeSql.sql(s, "ALTER TABLE alt_i RENAME COLUMN n_name TO label")
    LakeSql.sql(s, "ALTER TABLE alt_i ADD COLUMN extra INT")
    assert(LakeSql.sql(s, "SELECT * FROM alt_i").columns.toSet ==
      Set("n_nationkey", "label", "extra"))
    LakeSql.sql(s, "ROLLBACK")
    val cols = LakeSql.sql(s, "SELECT * FROM alt_i").columns.toSet
    assert(cols == Set("n_nationkey", "n_name", "n_regionkey"))
    // the dropped column's DATA is back, not resurrected-as-null
    assert(LakeSql.sql(s,
      "SELECT COUNT(*) AS n FROM alt_i WHERE n_name IS NOT NULL")
      .head.getLong(0) == 25L)

    // Mixed ALTER + DML: rollback reverts data to the pre-txn
    // snapshot AND the schema to the pre-txn id, in that order.
    LakeSql.sql(s, "BEGIN")
    LakeSql.sql(s, "DELETE FROM alt_i WHERE n_nationkey < 10")
    LakeSql.sql(s, "ALTER TABLE alt_i DROP COLUMN n_regionkey")
    LakeSql.sql(s, "ROLLBACK")
    assert(LakeSql.sql(s, "SELECT COUNT(*) AS n FROM alt_i")
      .head.getLong(0) == 25L)
    assert(LakeSql.sql(s, "SELECT * FROM alt_i").columns.toSet ==
      Set("n_nationkey", "n_name", "n_regionkey"))
    // COMMIT keeps schema changes (no phantom restore on commit).
    LakeSql.sql(s, "BEGIN")
    LakeSql.sql(s, "ALTER TABLE alt_i DROP COLUMN n_regionkey")
    LakeSql.sql(s, "COMMIT")
    assert(!LakeSql.sql(s, "SELECT * FROM alt_i").columns
      .contains("n_regionkey"))
  }

  test("RENAME TO / TRUNCATE / CREATE OR REPLACE TABLE inside a " +
      "transaction: ROLLBACK restores name, rows, and content") {
    val s = fresh()
    val base = graft.util.Scratch.dir("txnddl2")
    LakeSql.sql(s, s"""CREATE TABLE lc_t USING deltalite
      LOCATION '$base/lc_t'
      AS SELECT r_regionkey AS k, r_name AS nm FROM region""")

    // RENAME TO + DML on the NEW name, then ROLLBACK: old name is
    // back, new name gone, data untouched.
    LakeSql.sql(s, "BEGIN")
    LakeSql.sql(s, "ALTER TABLE lc_t RENAME TO lc_u")
    LakeSql.sql(s, "DELETE FROM lc_u WHERE k < 3")
    assert(LakeSql.sql(s, "SELECT COUNT(*) AS n FROM lc_u")
      .head.getLong(0) == 2L)
    LakeSql.sql(s, "ROLLBACK")
    assert(LakeSql.sql(s, "SELECT COUNT(*) AS n FROM lc_t")
      .head.getLong(0) == 5L)
    intercept[Exception] {
      LakeSql.sql(s, "SELECT * FROM lc_u").collect()
    }

    // TRUNCATE inside txn, then ROLLBACK: rows return.
    LakeSql.sql(s, "BEGIN")
    LakeSql.sql(s, "TRUNCATE TABLE lc_t")
    assert(LakeSql.sql(s, "SELECT COUNT(*) AS n FROM lc_t")
      .head.getLong(0) == 0L)
    LakeSql.sql(s, "ROLLBACK")
    assert(LakeSql.sql(s, "SELECT COUNT(*) AS n FROM lc_t")
      .head.getLong(0) == 5L)

    // CREATE OR REPLACE TABLE of an EXISTING table inside txn, then
    // ROLLBACK: the original content returns (replace = table touch).
    LakeSql.sql(s, "BEGIN")
    LakeSql.sql(s,
      "CREATE OR REPLACE TABLE lc_t AS SELECT n_nationkey AS k, " +
        "n_name AS nm FROM nation")
    assert(LakeSql.sql(s, "SELECT COUNT(*) AS n FROM lc_t")
      .head.getLong(0) == 25L)
    LakeSql.sql(s, "ROLLBACK")
    assert(LakeSql.sql(s, "SELECT COUNT(*) AS n FROM lc_t")
      .head.getLong(0) == 5L)

    // …and a CORT that CREATED the table rolls back to absent.
    LakeSql.sql(s, "BEGIN")
    LakeSql.sql(s,
      s"CREATE OR REPLACE TABLE lc_new USING deltalite LOCATION '$base/lc_new' AS SELECT 1 AS one")
    LakeSql.sql(s, "ROLLBACK")
    intercept[Exception] {
      LakeSql.sql(s, "SELECT * FROM lc_new").collect()
    }
  }

  test("guards: nested BEGIN, stray COMMIT/ROLLBACK, non-transactional " +
      "statements inside a transaction, and failure cleanup") {
    val s = fresh()
    intercept[IllegalArgumentException] { LakeSql.sql(s, "COMMIT") }
    intercept[IllegalArgumentException] { LakeSql.sql(s, "ROLLBACK") }
    LakeSql.sql(s, "BEGIN")
    intercept[IllegalArgumentException] { LakeSql.sql(s, "BEGIN") }
    val root = graft.util.Scratch.dir("txnattach")
    intercept[IllegalArgumentException] {
      LakeSql.sql(s, s"ATTACH '$root' AS z")
    }
    intercept[IllegalArgumentException] {
      LakeSql.sql(s, s"EXPORT DATABASE '$root'")
    }
    intercept[IllegalArgumentException] {
      LakeSql.sql(s, "CREATE MACRO one() AS 1")
    }
    LakeSql.sql(s, "ROLLBACK")

    // A failure mid-transaction: rollbackIfActive restores and clears.
    val base = graft.util.Scratch.dir("txnfail")
    LakeSql.sql(s, s"""CREATE TABLE f_t USING deltalite
      LOCATION '$base/f_t' AS SELECT n_nationkey FROM nation""")
    LakeSql.sql(s, "BEGIN")
    LakeSql.sql(s, "DELETE FROM f_t WHERE n_nationkey < 10")
    intercept[Exception] {
      LakeSql.sql(s, "DELETE FROM no_such_table WHERE x = 1")
    }
    LakeSql.rollbackIfActive(s)
    assert(LakeSql.sql(s, "SELECT COUNT(*) AS n FROM f_t")
      .head.getLong(0) == 25L)
    // Cleared: a second rollbackIfActive is a no-op, COMMIT refuses.
    LakeSql.rollbackIfActive(s)
    intercept[IllegalArgumentException] { LakeSql.sql(s, "COMMIT") }
  }

  test("transactions span attached catalogs: qualified DML and " +
      "qualified DDL both roll back through the attached root") {
    val s = fresh()
    val root = graft.util.Scratch.dir("txnatt_root")
    LakeSql.script(s, s"""
      ATTACH '$root' AS ta;
      CREATE TABLE ta.t USING deltalite
        AS SELECT n_nationkey, n_name FROM nation""")
    LakeSql.sql(s, "BEGIN")
    LakeSql.sql(s, "DELETE FROM ta.t WHERE n_nationkey < 10")
    LakeSql.sql(s, "CREATE VIEW ta.v AS SELECT COUNT(*) AS n FROM t")
    LakeSql.sql(s, "ROLLBACK")
    assert(LakeSql.sql(s, "SELECT COUNT(*) AS n FROM ta.t")
      .head.getLong(0) == 25L)
    intercept[Exception] {
      LakeSql.sql(s, "SELECT * FROM ta.v").collect()
    }
    LakeSql.script(s, "DROP TABLE ta.t; DETACH ta")
  }
}
