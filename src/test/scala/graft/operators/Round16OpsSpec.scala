package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-16 contract fixes (ADVICE r15): madRobust's empty-input frame,
  * the cummax/cumsum reserved-name fail-fast, and IVF serving's
  * pre-pin argument validation. */
class Round16OpsSpec extends SparkSpec {

  test("madRobust: empty and all-NULL inputs read an EMPTY frame, " +
      "not exactQuantiles' require (ADVICE r15)") {
    import spark.implicits._
    val empty = Profiling.madRobust(
      Seq.empty[Tuple1[Long]].toDF("v"), $"v")
    assert(empty.columns.toSeq == Seq("n", "median", "mad"))
    assert(empty.count() == 0L)
    val allNull = Profiling.madRobust(
      Seq(Tuple1(Option.empty[Long]), Tuple1(Option.empty[Long]))
        .toDF("v"), $"v")
    assert(allNull.count() == 0L)
  }

  test("withGlobalCummax / withGlobalCumsum(s): plan-internal names " +
      "(__lmax, row_off, max_off, cum_off) fail fast on collision") {
    import spark.implicits._
    val base = Seq((1L, 2L)).toDF("k", "v")
    for (bad <- Seq("__lmax", "row_off", "max_off")) {
      val e = intercept[IllegalArgumentException] {
        Curation.withGlobalCummax(base.withColumn(bad, lit(0L)),
          Seq(col("k")), col("v"))
      }
      assert(e.getMessage.contains(bad))
    }
    for (bad <- Seq("row_off", "cum_off")) {
      val e = intercept[IllegalArgumentException] {
        Curation.withGlobalCumsum(base.withColumn(bad, lit(0L)),
          Seq(col("k")), col("v"))
      }
      assert(e.getMessage.contains(bad))
    }
    for (bad <- Seq("row_off", "cum_off_x")) {
      val e = intercept[IllegalArgumentException] {
        Curation.withGlobalCumsums(base.withColumn(bad, lit(0L)),
          Seq(col("k")), Seq("x" -> col("v")))
      }
      assert(e.getMessage.contains(bad))
    }
  }

  test("ivfRankingMetricsWith: bad k / nProbe fails fast BEFORE the " +
      "assignment pin (ADVICE r15)") {
    import spark.implicits._
    implicit val s = spark
    val emb = Seq((0L, "a", Array(1.0f, 0.0f)))
      .toDF("vec_id", "label", "embedding")
    val cents = Array((0L, Array(1.0, 0.0)))
    intercept[IllegalArgumentException] {
      Similarity.ivfRankingMetricsWith(emb, cents, 1, 1, 10000)
    }
    intercept[IllegalArgumentException] {
      Similarity.ivfRankingMetricsWith(emb, cents, 0, 1, 1)
    }
  }
}
