package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[PoissonBootstrapAgg]] parity with the declarative explode form it
  * replaced (round 15): identical per-replicate (Σw·v, Σw) sufficient
  * statistics — including the NULL contract (null id contributes
  * nothing; null v with non-null id counts its weights toward Σw but
  * nothing toward Σw·v, because sum() skips the null product). The
  * declarative reference here IS the old engine/oracle formula. */
class PoissonBootstrapAggSpec extends SparkSpec {

  private val cumPpm = Seq(367879L, 735759L, 919699L, 981012L,
    996340L, 999406L, 999917L, 999990L, 999999L)

  test("aggregate == the declarative md5/conv explode form, nulls " +
      "included; b not divisible by 4 exercises the r < b cut") {
    import spark.implicits._
    val b = 10 // not divisible by 4
    val base = Seq(
      (Some("1"), Some(10L)), (Some("2"), Some(20L)),
      (Some("3"), Some(30L)), (Some("4"), Some(40L)),
      (Some("6"), None), // null v: weights count, product doesn't
      (None, Some(99L))) // null id: contributes nothing
      .toDF("id", "v")
    val got = base
      .agg(HashExpressions.poisson_bootstrap_agg($"id", $"v", b, cumPpm)
        .as("arr"))
      .select(explode($"arr").as("x"))
      .select($"x.r", $"x.s", $"x.nw")
      .as[(Long, Long, Long)].collect().toList.sortBy(_._1)
    val reps = base
      .withColumn("r", explode(sequence(lit(0), lit(b - 1))))
      .withColumn("u", expr("pmod(cast(conv(substring(md5(concat(" +
        "id, ':', cast(r div 4 as string))), " +
        "cast((r % 4) * 8 + 1 as int), 8), 16, 10) as bigint), " +
        "1000000)"))
      .withColumn("w", cumPpm.zipWithIndex
        .foldLeft(lit(0L)) { case (acc, (t, i)) =>
          when($"u" >= t, lit(i + 1L)).otherwise(acc) })
    val ref = reps.groupBy($"r")
      .agg(coalesce(sum($"w" * $"v"), lit(0L)).as("s"),
        sum($"w").as("nw"))
      .select($"r".cast("long"), $"s", $"nw")
      .as[(Long, Long, Long)].collect().toList.sortBy(_._1)
    assert(got.size == b && got == ref)
    // the null-v row really did add weight somewhere: total Σw over
    // replicates exceeds what the four valued rows alone produce
    val nwAll = got.map(_._3).sum
    val gotNoNull = base.filter($"id".isNotNull && $"v".isNotNull)
      .agg(HashExpressions.poisson_bootstrap_agg($"id", $"v", b, cumPpm)
        .as("arr"))
      .select(explode($"arr").as("x")).select($"x.nw")
      .as[Long].collect().sum
    assert(nwAll > gotNoNull)
  }
}
