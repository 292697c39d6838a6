package graft

import org.apache.spark.sql.functions._
import graft.operators.StubDecoder

class MultimodalSpec extends SparkSpec {

  test("m03 batched decode matches a direct per-row decode") {
    val got = Registry.byName("m03_batch_decode").fn(spark, sfDir).collect()
    assert(got.nonEmpty)
    // Independent check: decode the same payloads driver-side.
    val decoder = new StubDecoder
    val expected = Tables.documents(spark, sfDir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("p"))
      .collect()
      .map(r => r.getLong(0) ->
        decoder.decode(r.getAs[Array[Byte]](1)))
      .toMap
    got.foreach { r =>
      val e = expected(r.getLong(0))
      assert(r.getLong(1) == e.n_bytes && r.getLong(2) == e.byte_sum &&
        r.getInt(3) == e.width && r.getInt(4) == e.height)
    }
  }

  test("m02 frame sampling emits ceil(n_frames/stride) rows per asset") {
    val rows = Registry.byName("m02_frame_sample").fn(spark, sfDir)
      .groupBy(col("asset_id")).agg(count(lit(1)).as("n_sampled"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sizes = Tables.documents(spark, sfDir)
      .select(col("doc_id"), length(encode(col("text"), "UTF-8")).as("len"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    sizes.foreach { case (id, len) =>
      val nFrames = math.ceil(len / 64.0).toInt
      if (nFrames > 0) {
        val expected = (nFrames + 3) / 4 // stride 4
        assert(rows(id) == expected, s"asset $id len $len")
      }
    }
  }
}
