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

  test("rule leaves nullable-element arrays alone (semantics guard)") {
    import spark.implicits._
    if (!spark.experimental.extraOptimizations.contains(FuseDotProduct)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ FuseDotProduct
    }
    val df = Seq((Seq(Some(1.0), None), Seq(Some(2.0), Some(3.0))))
      .toDF("a", "b")
    val hof = df.select(Similarity.dotHof($"a", $"b").as("d"))
    assert(!hof.queryExecution.optimizedPlan.toString.contains("dot_product"))
    // and the HOF semantics (null element → null result) are preserved
    assert(hof.collect().head.isNullAt(0))
  }
}
