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
}
