package graft.tools

/** Sweep-coverage lint (round-12 verdict item 7): the round-12 sf1
  * artifact silently omitted x100–x103 because nothing checked sweep
  * coverage against the registry. This tool fails loudly when any
  * non-streaming `SparkEntry.queries` key is missing from a bench
  * artifact's `"queries"` map — run it against the sf1 (and any full)
  * sweep at round close.
  *
  * Usage: runMain graft.tools.CoverageLint docs/BENCH_SF1_R13.json
  */
object CoverageLint {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: CoverageLint <bench-artifact.json>")
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(args(0))))
    val qStart = text.indexOf("\"queries\":{")
    require(qStart >= 0, s"${args(0)}: no \"queries\" object found")
    val qBody = text.substring(qStart + "\"queries\":{".length,
      text.indexOf('}', qStart))
    val present = "\"([A-Za-z0-9_]+)\":".r
      .findAllMatchIn(qBody).map(_.group(1)).toSet
    val expected = graft.SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.startsWith("st"))
    val missing = expected.filterNot(present.contains)
    val extra = present.toSeq.sorted.filterNot(expected.contains)
    if (extra.nonEmpty)
      println(s"note: artifact has ${extra.size} keys no longer in the " +
        s"registry: ${extra.mkString(", ")}")
    if (missing.nonEmpty) {
      System.err.println(s"COVERAGE FAIL: ${missing.size} registry " +
        s"keys missing from ${args(0)}: ${missing.mkString(", ")}")
      sys.exit(1)
    }
    println(s"COVERAGE OK: all ${expected.size} non-streaming registry " +
      s"keys present in ${args(0)} (${present.size} measured)")
  }
}
