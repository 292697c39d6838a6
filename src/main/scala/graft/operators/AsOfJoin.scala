package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{GQuery, Tables => T}

/** As-of join: for each left row, attach the most recent right row (by a
  * time column) with the same key and right.time <= left.time.
  *
  * Implementation is the scalable union-merge pattern, NOT a theta-join:
  * tag both sides, union them, sort within each key partition by
  * (time, side) and carry the last right-side payload forward with
  * `last(_, ignoreNulls = true)`. One shuffle on the key, zero row
  * expansion — survives arbitrarily hot keys where an interval theta
  * join would explode. (A per-key theta join is the DuckDB-oracle
  * formulation; results are identical.)
  */
object AsOfJoin {

  /** @param left      left (probe) rows
    * @param right     right (reference) rows
    * @param key       join key column name (present in both)
    * @param leftTime  event-time column on the left
    * @param rightTime event-time column on the right
    * @param payload   right-side columns to carry (renamed as given)
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      payload: Seq[(String, String)]): DataFrame = {
    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1)) // left sorts after right at equal time
    val rTagged0 = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
    // align schemas: left gets null payload slots, right gets null left cols
    val rTagged = payload.foldLeft(rTagged0) { case (df, (src, dst)) =>
      df.withColumn(dst, col(src))
    }
    val leftCols = left.columns
    val lAligned = payload.foldLeft(lTagged) { case (df, (_, dst)) =>
      df.withColumn(dst, lit(null))
    }.select((leftCols.map(col) ++ payload.map(p => col(p._2)) ++
      Seq(col("__t"), col("__side"))): _*)
    val rAligned0 = leftCols.foldLeft(rTagged) { case (df, c) =>
      if (right.columns.contains(c) || c == key) df else df.withColumn(c, lit(null))
    }
    val rAligned = rAligned0.select((leftCols.map(c =>
      if (c == key) col(key) else col(c)) ++ payload.map(p => col(p._2)) ++
      Seq(col("__t"), col("__side"))): _*)

    val unioned = lAligned.unionByName(rAligned)
    val w = Window.partitionBy(col(key)).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned) { case (df, (_, dst)) =>
      df.withColumn(dst, last(col(dst), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1).drop("__t", "__side")
  }

  /** q32: for each purchase event, the most recent view event of the
    * same user at or before the purchase time.
    */
  val queries: Seq[GQuery] = Seq(
    GQuery("q32_asof_join", (s, d) => {
      val ev = T.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("v_ts"), col("value").as("v_value"))
      asOf(purchases, views, "user_id", "ts", "v_ts",
          Seq("v_ts" -> "last_view_ts", "v_value" -> "last_view_value"))
        .filter(col("last_view_ts").isNotNull)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("last_view_ts"), col("last_view_value"))
        .orderBy(col("event_id"))
    }, Some("""
      SELECT event_id, user_id, ts, last_view_ts, last_view_value FROM (
        SELECT p.event_id, p.user_id, p.ts, v.ts AS last_view_ts,
               v.value AS last_view_value,
               ROW_NUMBER() OVER (PARTITION BY p.event_id
                 ORDER BY v.ts DESC) AS rn
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase') p
        JOIN (SELECT user_id, ts, value FROM events
              WHERE event_type = 'view') v
          ON p.user_id = v.user_id AND v.ts <= p.ts)
      WHERE rn = 1 ORDER BY event_id"""))
  )
}
