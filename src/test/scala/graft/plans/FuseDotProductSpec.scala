package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

class FuseDotProductSpec extends SparkSpec {

  test("optimizer rule rewrites the HOF fold into the codegen expression") {
    import spark.implicits._
    if (!spark.experimental.extraOptimizations.contains(FuseDotProduct)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ FuseDotProduct
    }
    // non-nullable array<double> (the guard requires containsNull=false)
    val df = spark.range(100)
      .select(array(($"id" * 1.0), ($"id" * 2.0), ($"id" * 3.0)).as("v"))
    val hof = df.select(Similarity.dotHof($"v", $"v").as("d"))
    assert(hof.queryExecution.optimizedPlan.toString.contains("dot_product"),
      s"rule did not fire:\n${hof.queryExecution.optimizedPlan}")
    val viaRule = hof.agg(sum($"d")).as[Double].head()
    val direct = df.select(Similarity.dot($"v", $"v").as("d"))
      .agg(sum($"d")).as[Double].head()
    assert(viaRule == direct)
  }

  test("rule fires on nullable-element arrays and preserves NULL semantics") {
    import spark.implicits._
    if (!spark.experimental.extraOptimizations.contains(FuseDotProduct)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ FuseDotProduct
    }
    // range-based so constant folding can't collapse the plan to a
    // LocalRelation before we can inspect it
    val df = spark.range(1).select(
      expr("array(cast(id AS double) + 1.0, CAST(NULL AS double))").as("a"),
      expr("array(cast(2.0 AS double), cast(3.0 AS double))").as("b"))
    val hof = df.select(Similarity.dotHof($"a", $"b").as("d"))
    assert(hof.queryExecution.optimizedPlan.toString.contains("dot_product"))
    // HOF semantics (null element → null result) are preserved
    assert(hof.collect().head.isNullAt(0))
  }

  test("fused expression matches HOF on length-mismatched arrays (NULL)") {
    import spark.implicits._
    if (!spark.experimental.extraOptimizations.contains(FuseDotProduct)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ FuseDotProduct
    }
    // zip_with pads the shorter array with null → the fold returns NULL;
    // the fused DotProduct must agree, not truncate-and-sum.
    val df = spark.range(1).select(
      expr("array(cast(id AS double), 2.0, 3.0)").as("a"),
      expr("array(cast(4.0 AS double), cast(5.0 AS double))").as("b"))
    val hof = df.select(Similarity.dotHof($"a", $"b").as("d"))
    assert(hof.queryExecution.optimizedPlan.toString.contains("dot_product"))
    assert(hof.collect().head.isNullAt(0))
    // and the direct expression agrees
    val direct = df.select(Similarity.dot($"a", $"b").as("d"))
    assert(direct.collect().head.isNullAt(0))
  }
}
