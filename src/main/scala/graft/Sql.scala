package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Text-SQL entry point — the engine's equivalent of the reference's
  * `Connection::Query(sql)` path (reference:duckdb:24-35): the SQL
  * string goes through Spark's parser → analyzer → Catalyst optimizer →
  * physical planning, exactly the parser→binder→physical-operator
  * pipeline the reference traces through DuckDB.
  *
  * `open` registers the ten lake tables as temp views once per
  * (session, dir); afterwards any ANSI SQL the driver's DuckDB oracle
  * can run also runs here, unchanged. Because the views are plain
  * parquet reads, Catalyst still pushes filters and prunes columns
  * through them — text SQL costs nothing over the DataFrame API.
  */
object Sql {

  private val TableNames = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every test table under its name as a temp view, plus the
    * graft_* native functions (FunctionRegistry). Idempotent.
    */
  def open(spark: SparkSession, dir: String): Unit = {
    GraftExtensions.installInto(spark)
    TableNames.foreach { t =>
      // Register whatever the lake dir actually has; a partial lake
      // still gets a working session for its present tables.
      if (new java.io.File(s"$dir/$t.parquet").exists()) t match {
        case "events" =>
          Tables.events(spark, dir).createOrReplaceTempView("events")
        case _ => Tables(spark, dir, t).createOrReplaceTempView(t)
      }
    }
  }

  /** Run one SQL statement against the registered views. */
  def run(spark: SparkSession, dir: String, query: String): DataFrame = {
    open(spark, dir)
    spark.sql(query)
  }

  /** Inventory entries proving the text path end-to-end: each query is
    * ONE SQL string executed by both engines (Spark via [[run]], DuckDB
    * via the driver's oracle) — byte-identical text, hash-identical
    * results.
    */
  val all: Seq[GQuery] = {
    def passthrough(name: String, sql: String): GQuery =
      GQuery(name, (s, d) => run(s, d, sql), Some(sql))

    Seq(
      // -------------------------------------------------------------- x01
      passthrough("x01_sql_scan_agg", """
        SELECT l_returnflag, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_returnflag ORDER BY l_returnflag"""),

      // -------------------------------------------------------------- x02
      passthrough("x02_sql_join", """
        SELECT n_name, COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name"""),

      // -------------------------------------------------------------- x03
      passthrough("x03_sql_window", """
        SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk
          FROM orders)
        WHERE rnk <= 2 ORDER BY o_custkey, rnk""")
    )
  }
}
