package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Failure-atomicity of [[Sql.open]]: one unreadable table must not take
  * out the rest of the lake, and the dir must stay unrecorded so a later
  * open retries the bad table (VERDICT r6 item 2: a poisoned open dropped
  * `documents` and broke x07 even though only `events` was at fault).
  */
class SqlOpenSpec extends SparkSpec {

  test("one bad table still registers the rest, and a retry heals") {
    val lake = Files.createTempDirectory("graft-badlake").toFile
    lake.deleteOnExit()
    // A real lineitem + a garbage events.parquet (schema inference throws).
    Files.copy(Paths.get(s"$sfDir/lineitem.parquet"),
      Paths.get(lake.getPath, "lineitem.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    Files.write(Paths.get(lake.getPath, "events.parquet"),
      "not a parquet file".getBytes)

    Sql.open(spark, lake.getPath)
    // The good table is usable despite the bad one.
    assert(Sql.run(spark, lake.getPath,
      "SELECT COUNT(*) AS n FROM lineitem").head.getLong(0) > 0)
    // The bad table fails at name resolution only.
    intercept[Exception] {
      Sql.run(spark, lake.getPath, "SELECT COUNT(*) FROM events").collect()
    }

    // Fix the bad table; because the dir was never recorded as opened,
    // the next run() retries registration and everything works.
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      Paths.get(lake.getPath, "events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    assert(Sql.run(spark, lake.getPath,
      "SELECT COUNT(*) AS n FROM events").head.getLong(0) > 0)
    // Re-point the shared session back at the canonical test lake so
    // later suites see the standard views.
    Sql.open(spark, sfDir)
  }
}
