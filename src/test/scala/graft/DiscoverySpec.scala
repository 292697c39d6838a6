package graft

import org.apache.spark.sql.functions._
import graft.operators.Discovery

class DiscoverySpec extends SparkSpec {
  import spark.implicits._

  // Planted micro-lake: `fact.k` is joinable with `dim.id` (all fact
  // keys come from the dim), `dim.label` shares nothing with either,
  // `other.v` overlaps dim.id on exactly two values.
  private def dim = Seq((1, "alpha"), (2, "beta"), (3, "gamma"),
    (4, "delta")).toDF("id", "label")
  private def fact = Seq(1, 2, 2, 3, 3, 3).toDF("k")
  private def other = Seq(3, 4, 9, 10).toDF("v")

  test("joinableColumns ranks true foreign key first with exact overlap") {
    val out = Discovery.joinableColumns(dim, "id", Seq(
      ("fact", "k", fact), ("other", "v", other),
      ("dim", "label", dim)))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.head == (("fact", "k", 3L))) // 3 of dim's 4 ids appear
    assert(out.map(t => (t._1, t._2)) contains ("other", "v"))
    val byName = out.map(t => (t._1, t._2) -> t._3).toMap
    assert(byName(("other", "v")) == 2L) // values 3 and 4 only
    assert(byName(("dim", "label")) == 0L)
  }

  test("columnSketch: identical value sets give identical signatures") {
    val a = Discovery.columnSketch(dim, "t", "id")
      .orderBy(col("i")).collect().map(r => (r.getInt(2), r.getLong(3)))
    val b = Discovery.columnSketch(
      Seq(4, 3, 2, 1, 1).toDF("x"), "u", "x") // same set, other order/dups
      .orderBy(col("i")).collect().map(r => (r.getInt(2), r.getLong(3)))
    assert(a.length == Discovery.SketchK)
    assert(a.toSeq == b.toSeq)
  }

  test("unionableTables ranks the value-sharing table first") {
    // cand table "twin" shares dim.id's values; "stranger" shares none.
    val cand = Seq(
      Discovery.columnSketch(Seq(1, 2, 3, 4).toDF("x"), "twin", "x"),
      Discovery.columnSketch(Seq("p", "q", "r").toDF("y"), "twin", "y"),
      Discovery.columnSketch(Seq(70, 80, 90).toDF("z"), "stranger", "z"))
      .reduce(_ unionByName _)
    val probe = Discovery.columnSketch(dim, "probe", "id")
    val out = Discovery.unionableTables(cand, probe)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(out.head._1 == "twin")
    assert(out.head._2 == Discovery.SketchK.toLong) // exact value match
    assert(out.toMap.apply("stranger") < Discovery.SketchK.toLong / 2)
  }

  test("incremental sketch merge equals full rebuild (monotone min)") {
    val all = Seq(1, 2, 3, 4, 5, 6).toDF("x")
    val full = Discovery.columnSketch(all, "t", "x")
      .orderBy(col("i")).collect().map(r => r.getLong(3))
    val merged = Discovery.columnSketch(Seq(1, 2, 3).toDF("x"), "t", "x")
      .unionByName(Discovery.columnSketch(Seq(4, 5, 6).toDF("x"), "t", "x"))
      .groupBy(col("table_name"), col("column_name"), col("i"))
      .agg(min(col("m")).as("m"))
      .orderBy(col("i")).collect().map(r => r.getLong(3))
    assert(full.toSeq == merged.toSeq)
  }

  test("c07 semantic typing assigns the meaning a human would: ids, " +
      "foreign-key codes, measures, timestamps, entity refs, json, " +
      "categories and free text all land in their classes") {
    val got = graft.Registry.byName("c07_semantic_types")
      .fn(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(5)).toMap
    val expect = Map(
      ("customer", "c_custkey") -> "id",          // unique integer key
      ("customer", "c_nationkey") -> "numeric_code", // low-card FK
      ("customer", "c_acctbal") -> "measure",
      ("customer", "c_name") -> "entity_ref",     // Customer#000000042
      ("customer", "c_mktsegment") -> "category",
      ("events", "ts") -> "timestamp",
      ("events", "props") -> "json",              // {"k": 69}
      ("events", "event_type") -> "category",
      ("orders", "o_orderdate") -> "timestamp",
      ("part", "p_name") -> "text",               // "small ring" …
      ("supplier", "s_name") -> "entity_ref")
    expect.foreach { case (k, want) =>
      assert(got.get(k).contains(want),
        s"$k: got ${got.get(k)}, want $want")
    }
    // every inventory column classified — nothing falls through to a
    // surprise bucket silently
    assert(got.size == 30 && got.values.forall(_.nonEmpty))
  }

  test("c08 typed joinability: true FK edges surface with full key " +
      "overlap; incompatible classes never pair") {
    val rows = graft.Registry.byName("c08_typed_joinability")
      .fn(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4), r.getLong(5)))
    // the real FK edges exist and carry their full key overlap
    def overlap(ta: String, ca: String, tb: String, cb: String) =
      rows.collectFirst {
        case (_, `ta`, `ca`, `tb`, `cb`, n) => n }
    assert(overlap("customer", "c_custkey", "orders", "o_custkey")
      .exists(_ > 0), "c_custkey x o_custkey FK edge missing")
    assert(overlap("customer", "c_nationkey", "supplier", "s_nationkey")
      .exists(_ > 0), "nationkey FK edge missing")
    // no pair ever crosses join classes, tables, or the dedup order
    rows.foreach { case (jc, ta, ca, tb, cb, n) =>
      assert(Set("key", "ref", "cat")(jc) && ta != tb && n > 0)
      assert(s"$ta.$ca" < s"$tb.$cb", s"unordered pair $ta.$ca/$tb.$cb")
    }
    // measures/timestamps/free text are never candidates
    val cols = rows.flatMap(r => Seq(r._2 + "." + r._3, r._4 + "." + r._5))
    Seq("customer.c_acctbal", "orders.o_orderdate", "events.value",
      "part.p_name").foreach(bad =>
      assert(!cols.contains(bad), s"$bad paired despite its class"))
  }

  test("sketchSearch: self-match is k, disjoint column scores low") {
    val sketches = Seq(
      Discovery.columnSketch(dim, "dim", "id"),
      Discovery.columnSketch(dim, "dim", "label"))
      .reduce(_ unionByName _)
    val probe = Discovery.columnSketch(dim, "p", "id")
      .select(col("i"), col("m"))
    val scores = Discovery.sketchSearch(probe, sketches)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(scores(("dim", "id")) == Discovery.SketchK.toLong)
    // ints vs greek words share no values; a chance slot collision is
    // possible but k-1 of 16 matching is not.
    assert(scores(("dim", "label")) < Discovery.SketchK.toLong / 2)
  }
}
