package graft.tools

import graft.{GraftSession, Tables => T}

/** Train the byte-level BPE merge table that graft.functions.Bpe ships
  * as a deterministic in-repo literal — the standard BPE training
  * algorithm (Sennrich et al. 2016, the byte-level variant GPT-2
  * popularized), run SentencePiece-style over raw text with space as
  * an ordinary symbol (no pre-tokenizer), so both training and
  * encoding are pure integer work an oracle can replay exactly.
  *
  * Determinism: the training sample is the first `maxDocs` documents
  * by doc_id (a tokenizer is trained once on a bounded sample and then
  * applied everywhere — the committed BpeMerges table was trained on
  * the sf0.01 corpus); each round counts all adjacent symbol pairs across the
  * sample, picks the most frequent, ties broken by the smaller
  * (left, right) id pair, and replaces its non-overlapping occurrences
  * left to right. Re-running this main on the same corpus reproduces
  * the committed table byte for byte.
  *
  * Usage: runMain graft.tools.BpeTrain <sfDir> [numMerges] [maxDocs]
  * Prints the Scala literal rows for Bpe.MergeTable and the SQL VALUES
  * rows the DuckDB oracle inlines.
  */
object BpeTrain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val numMerges = if (args.length > 1) args(1).toInt else 200
    val maxDocs = if (args.length > 2) args(2).toInt else 2000
    val spark = GraftSession.builder("local[8]", shufflePartitions = 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Bounded, ordered training sample: deterministic by construction.
    val texts: Array[Array[Int]] = T.documents(spark, sfDir)
      .select("doc_id", "text").orderBy("doc_id").limit(maxDocs)
      .collect().map(_.getString(1).getBytes("UTF-8").map(_ & 0xff))

    val docs = texts.map(_.clone())
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var k = 0
    while (k < numMerges) {
      // Count every adjacent pair (with multiplicity) across the sample.
      val counts = new java.util.HashMap[Long, Long]()
      docs.foreach { d =>
        var i = 0
        while (i + 1 < d.length) {
          if (d(i) >= 0) {
            // skip tombstoned slots (negative) left by earlier merges
            var j = i + 1
            while (j < d.length && d(j) < 0) j += 1
            if (j < d.length) {
              val key = (d(i).toLong << 32) | d(j).toLong
              counts.merge(key, 1L, _ + _)
            }
          }
          i += 1
        }
      }
      if (counts.isEmpty) { k = numMerges }
      else {
        // max count, ties by smaller (l, r)
        var bestKey = -1L; var bestCount = -1L
        counts.forEach { (key, c) =>
          if (c > bestCount || (c == bestCount && key < bestKey)) {
            bestKey = key; bestCount = c
          }
        }
        val l = (bestKey >>> 32).toInt
        val r = (bestKey & 0xffffffffL).toInt
        val nid = 256 + merges.length
        merges += ((l, r))
        // Replace non-overlapping occurrences left to right; the right
        // slot becomes a tombstone (-1) so positions stay stable.
        docs.foreach { d =>
          var i = 0
          while (i < d.length) {
            if (d(i) == l) {
              var j = i + 1
              while (j < d.length && d(j) < 0) j += 1
              if (j < d.length && d(j) == r) {
                d(i) = nid; d(j) = -1
                i = j // the merged token can pair with the NEXT symbol
              }
            }
            i += 1
          }
        }
        k += 1
      }
    }

    val table = merges.toArray
    println(s"// trained on $sfDir documents (first $maxDocs docs, " +
      s"${table.length} merges)")
    println("val MergeTable: Array[(Int, Int)] = Array(")
    table.grouped(6).foreach { g =>
      println("  " + g.map { case (l, r) => s"($l,$r)" }.mkString(", ") + ",")
    }
    println(")")
    println()
    println("-- SQL VALUES (rank, l, r, nid):")
    println(table.zipWithIndex.map { case ((l, r), i) =>
      s"($i,$l,$r,${256 + i})"
    }.grouped(8).map(_.mkString(",")).mkString(",\n"))
    spark.stop()
  }
}
