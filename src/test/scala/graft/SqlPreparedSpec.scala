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
}
