package graft

/** [[Sql.runPrepared]]: named-parameter binding happens in the parser,
  * so values are typed literals — rebinding changes results without
  * re-authoring text, and hostile strings cannot splice syntax.
  */
class SqlPreparedSpec extends SparkSpec {

  private val text = """
    SELECT COUNT(*) AS n FROM customer
    WHERE c_mktsegment = :seg AND c_acctbal >= :minbal"""

  test("same text, different bindings, different results") {
    val a = Sql.runPrepared(spark, sfDir, text,
      Map("seg" -> "BUILDING", "minbal" -> 0)).head.getLong(0)
    val b = Sql.runPrepared(spark, sfDir, text,
      Map("seg" -> "BUILDING", "minbal" -> 99999)).head.getLong(0)
    assert(a > 0 && b == 0)
  }

  test("a hostile parameter value stays a literal, never SQL") {
    val n = Sql.runPrepared(spark, sfDir, text,
      Map("seg" -> "' OR '1'='1", "minbal" -> 0)).head.getLong(0)
    assert(n == 0) // matched as a (nonexistent) segment name, not parsed
  }

  test("an unbound placeholder fails loud") {
    intercept[Exception] {
      Sql.runPrepared(spark, sfDir, text,
        Map("seg" -> "BUILDING")).collect()
    }
  }

  private val textQ = """
    SELECT COUNT(*) AS n FROM customer
    WHERE c_mktsegment = ? AND c_acctbal >= ?"""
  private val textD = """
    SELECT COUNT(*) AS n FROM customer
    WHERE c_mktsegment = $1 AND c_acctbal >= $2 AND c_mktsegment = $1"""

  test("? markers bind left-to-right; $n ordinals bind by position " +
      "and may repeat") {
    val named = Sql.runPrepared(spark, sfDir, text,
      Map("seg" -> "BUILDING", "minbal" -> 100)).head.getLong(0)
    val q = Sql.runPreparedPositional(spark, sfDir, textQ,
      Seq("BUILDING", 100)).head.getLong(0)
    val d = Sql.runPreparedPositional(spark, sfDir, textD,
      Seq("BUILDING", 100)).head.getLong(0)
    assert(named > 0 && q == named && d == named)
  }

  test("a hostile POSITIONAL value stays a literal, never SQL") {
    val q = Sql.runPreparedPositional(spark, sfDir, textQ,
      Seq("' OR '1'='1", 0)).head.getLong(0)
    val d = Sql.runPreparedPositional(spark, sfDir, textD,
      Seq("'; DROP TABLE customer; --", 0)).head.getLong(0)
    assert(q == 0 && d == 0)
    // the table survived the injection attempt
    assert(Sql.run(spark, sfDir,
      "SELECT COUNT(*) AS n FROM customer").head.getLong(0) > 0)
  }

  test("arity and range are checked") {
    intercept[IllegalArgumentException] {
      Sql.runPreparedPositional(spark, sfDir, textQ, Seq("BUILDING"))
    }
    intercept[IllegalArgumentException] { // $2 with one argument
      Sql.runPreparedPositional(spark, sfDir, textD, Seq("BUILDING"))
    }
  }

  test("mixed parameter styles refuse loudly") {
    intercept[IllegalArgumentException] {
      Sql.runPreparedPositional(spark, sfDir, """
        SELECT COUNT(*) AS n FROM customer
        WHERE c_mktsegment = ? AND c_acctbal >= $1""", Seq("B", 0))
    }
    intercept[IllegalArgumentException] {
      Sql.runPreparedPositional(spark, sfDir, """
        SELECT COUNT(*) AS n FROM customer
        WHERE c_mktsegment = :seg AND c_acctbal >= ?""", Seq(0))
    }
    intercept[IllegalArgumentException] {
      Sql.runPrepared(spark, sfDir, """
        SELECT COUNT(*) AS n FROM customer
        WHERE c_mktsegment = :seg AND c_acctbal >= ?""",
        Map("seg" -> "BUILDING"))
    }
  }

  test("a ? inside a string literal is NOT a parameter marker") {
    val n = Sql.runPreparedPositional(spark, sfDir, """
      SELECT COUNT(*) AS n FROM customer
      WHERE c_mktsegment = ? AND c_mktsegment <> 'what?'""",
      Seq("BUILDING")).head.getLong(0)
    assert(n > 0)
  }

  test("SQL-level PREPARE / EXECUTE / DEALLOCATE: ? and $n bind, " +
      "lake tables resolve, args type through the parser, guards hold") {
    val s = spark.newSession()
    Sql.open(s, sfDir)
    // ? markers, bound left-to-right; DATE arithmetic in an argument.
    LakeSql.sql(s, """PREPARE q1 AS
      SELECT COUNT(*) AS n FROM orders
      WHERE o_orderstatus = ? AND o_totalprice >= ?""")
    val n1 = LakeSql.sql(s, "EXECUTE q1('O', 100000)").head.getLong(0)
    val want1 = Tables.orders(s, sfDir)
      .filter(org.apache.spark.sql.functions.col("o_orderstatus") === "O")
      .filter(org.apache.spark.sql.functions.col("o_totalprice") >= 100000)
      .count()
    assert(n1 == want1 && n1 > 0)
    // Arguments are expressions, typed by the parser (CAST works).
    assert(LakeSql.sql(s,
      "EXECUTE q1('F', CAST(200000 AS DOUBLE))").head.getLong(0) > 0)
    // $n with a repeat: the same arg binds both sites.
    LakeSql.sql(s, """PREPARE q2 AS
      SELECT $1 AS seg, COUNT(*) AS n FROM customer
      WHERE c_mktsegment = $1 AND c_acctbal >= $2 GROUP BY ALL""")
    val r2 = LakeSql.sql(s, "EXECUTE q2('BUILDING', 500)").head
    assert(r2.getString(0) == "BUILDING" && r2.getLong(1) > 0)
    // Prepared text referencing a LAKE table resolves through the
    // session catalog at EXECUTE time (current snapshot).
    val base = graft.util.Scratch.dir("prepexec")
    LakeSql.sql(s, s"""CREATE TABLE pe_t USING deltalite
      LOCATION '$base/pe_t'
      AS SELECT n_nationkey, n_name FROM nation""")
    LakeSql.sql(s,
      "PREPARE q3 AS SELECT COUNT(*) AS n FROM pe_t WHERE n_nationkey >= ?")
    assert(LakeSql.sql(s, "EXECUTE q3(20)").head.getLong(0) == 5L)
    LakeSql.sql(s, "DELETE FROM pe_t WHERE n_nationkey >= 20")
    assert(LakeSql.sql(s, "EXECUTE q3(0)").head.getLong(0) == 20L)
    // Guards: unknown name, arity mismatch, named placeholders,
    // prepared DML, DEALLOCATE of a missing name.
    intercept[IllegalArgumentException] {
      LakeSql.sql(s, "EXECUTE nosuch(1)")
    }
    intercept[IllegalArgumentException] {
      LakeSql.sql(s, "EXECUTE q1('O')")
    }
    LakeSql.sql(s,
      "PREPARE qn AS SELECT COUNT(*) AS n FROM nation WHERE n_name = :x")
    intercept[IllegalArgumentException] {
      LakeSql.sql(s, "EXECUTE qn('JAPAN')")
    }
    intercept[IllegalArgumentException] {
      LakeSql.sql(s, "PREPARE bad AS DELETE FROM pe_t WHERE n_nationkey = ?")
    }
    // CTE-led DML is still DML: WITH matches the query-shape head the
    // deferred-parse path accepts, so the refusal must come from the
    // parsed plan type, not the head regex (r15 advisor finding).
    intercept[IllegalArgumentException] {
      LakeSql.sql(s, """PREPARE bad2 AS WITH g AS (SELECT 20 AS k)
        DELETE FROM pe_t WHERE n_nationkey IN (SELECT k FROM g)""")
    }
    intercept[IllegalArgumentException] {
      LakeSql.sql(s, """PREPARE bad3 AS WITH g AS (SELECT 1 AS a)
        INSERT INTO pe_t SELECT a, 'x' FROM g""")
    }
    LakeSql.sql(s, "DEALLOCATE q1")
    intercept[IllegalArgumentException] { LakeSql.sql(s, "DEALLOCATE q1") }
    intercept[IllegalArgumentException] { LakeSql.sql(s, "EXECUTE q1(1, 2)") }
    // A string argument containing a comma is ONE argument (the
    // splitter is quote-aware, not just paren-aware).
    LakeSql.sql(s, """PREPARE qc AS
      SELECT COUNT(*) AS n FROM nation WHERE n_name = ? OR n_name = ?""")
    assert(LakeSql.sql(s, "EXECUTE qc('a,b', 'NATION_7')")
      .head.getLong(0) == 1L)
  }

  test("a prepared body in DIALECT grammar rewrites at EXECUTE like " +
      "inline text (round-15 script-fuzz finding: the parameterized " +
      "bind bypassed the rewrite layer); markers inside string " +
      "literals survive binding") {
    val s = spark.newSession()
    Sql.open(s, sfDir)
    // dialect vocabulary: ^@ operator pin, array_to_string/list_sort
    // aliases, // integer division — none parse in bare Spark
    LakeSql.sql(s, """PREPARE qd AS SELECT n_nationkey,
      CASE WHEN n_name ^@ 'NATION_1' THEN 1 ELSE 0 END AS sw,
      array_to_string(list_sort(string_split(lower(n_name), '_')), '|')
        AS parts,
      n_nationkey // 7 AS idiv
      FROM nation WHERE n_nationkey <= ? ORDER BY n_nationkey""")
    val rows = LakeSql.sql(s, "EXECUTE qd(14)").collect()
    assert(rows.length == 15)
    assert(rows(14).getInt(1) == 1) // NATION_14 ^@ 'NATION_1'
    assert(rows(3).getString(2) == "3|nation")
    assert(rows(14).getLong(3) == 2L) // 14 // 7
    // a ? INSIDE a string literal is text, not a marker
    LakeSql.sql(s, """PREPARE qm AS SELECT
      concat('?', n_name) AS c FROM nation WHERE n_nationkey = ?""")
    assert(LakeSql.sql(s, "EXECUTE qm(2)").head.getString(0)
      == "?NATION_2")
  }

  test("EXECUTE timestamp arguments keep their instant under a " +
      "non-UTC session TimeZone (r15 advisor: toString splices JVM-" +
      "default wall text with no zone marker, shifting on re-parse)") {
    val s = spark.newSession()
    Sql.open(s, sfDir)
    LakeSql.sql(s, "SET TimeZone = 'Asia/Tokyo'")
    try {
      LakeSql.sql(s, "PREPARE qt AS SELECT CAST(? AS STRING) AS t")
      // literal evaluates under Tokyo (instant 2024-03-01T00:00Z);
      // the round-trip through renderLiteral + re-parse + CAST must
      // return the SAME wall text, i.e. the same instant.
      val got = LakeSql.sql(s,
        "EXECUTE qt(TIMESTAMP '2024-03-01 09:00:00')").head.getString(0)
      assert(got == "2024-03-01 09:00:00", got)
    } finally LakeSql.sql(s, "SET TimeZone = 'UTC'")
  }
}
