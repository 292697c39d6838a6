package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The verify-time scalar-output lint ([[Verify.assertScalarOutput]]):
  * the driver's comparator sorts+hashes rows through pandas and
  * crashes on nested cells (the r11 x92 failure), so every
  * oracle-gated key must emit only atomic columns — enforced on every
  * Verify dump, proven here to reject each nested kind and to exempt
  * the declared rows-only keys.
  */
class VerifyLintSpec extends AnyFunSuite {

  private val scalarOnly = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  test("scalar-only output passes for an oracle-gated key") {
    Verify.assertScalarOutput("q01_pricing_summary", scalarOnly)
  }

  test("array / map / struct columns are rejected for oracle-gated keys") {
    for (bad <- Seq(ArrayType(DoubleType),
        MapType(StringType, LongType),
        StructType(Seq(StructField("x", IntegerType))))) {
      val schema = scalarOnly.add(StructField("nested", bad))
      val e = intercept[IllegalArgumentException] {
        Verify.assertScalarOutput("q01_pricing_summary", schema)
      }
      assert(e.getMessage.contains("nested"), e.getMessage)
    }
  }

  test("declared rows-only keys (no oracle) are exempt") {
    val arr = scalarOnly.add(StructField("negs", ArrayType(FloatType)))
    // x49/x61 are the rows-only keys — engine-owned EXPLAIN outputs
    Verify.assertScalarOutput("x49_sql_explain", arr)
    // unknown names (not in the registry) are also a no-op
    Verify.assertScalarOutput("not_a_key", arr)
  }

  test("every registered oracle-gated key is subject to the lint") {
    // the lint keys off Registry.byName; a rename that silently
    // detaches a key from its gate would surface here
    assert(Registry.byName.contains("x92_sql_list_funcs"))
    assert(Registry.byName("x92_sql_list_funcs").oracle.isDefined)
  }
}
