package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class RangeJoinSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def naive(points: DataFrame, intervals: DataFrame): DataFrame =
    points.join(intervals,
      col("p") >= col("lo") && col("p") < col("hi"))

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).toSeq.sorted

  test("bucketedRangeJoin equals the naive theta join on fixture events") {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    val points = ev.filter($"event_type" === "click")
      .select($"event_id".as("pid"), unix_micros($"ts").as("p"))
    val intervals = ev.filter($"event_type" === "error")
      .select($"event_id".as("iid"), unix_micros($"ts").as("lo"),
        (unix_micros($"ts") + lit(300000000L)).as("hi"))
    val got = RangeJoinOps.bucketedRangeJoin(points, intervals,
      "p", "lo", "hi", bucketWidth = 300000000L)
    val want = naive(points, intervals)
    assert(got.columns.sorted.toSeq === want.columns.sorted.toSeq)
    assert(sortedRows(got.select("pid", "iid")) ===
      sortedRows(want.select("pid", "iid")))
    assert(got.count() > 0) // non-vacuous on the fixture
  }

  test("bucketedRangeJoin handles negatives, wide/empty intervals, " +
      "half-open boundaries, any bucket width") {
    import spark.implicits._
    val points = Seq(
      (1L, -100L), (2L, -1L), (3L, 0L), (4L, 7L), (5L, 10L),
      (6L, 999L), (7L, 1000L), (8L, Long.MinValue / 4), (9L, 63L))
      .toDF("pid", "p")
    val intervals = Seq(
      (10L, -100L, -99L),   // negative band, width 1
      (11L, -5L, 5L),       // straddles zero
      (12L, 0L, 0L),        // empty (hi == lo) → matches nothing
      (13L, 10L, 7L),       // inverted → matches nothing
      (14L, 0L, 1000L),     // spans many buckets; 1000 excluded (half-open)
      (15L, 63L, 64L),      // exact hit on a bucket edge for width 63
      (16L, Long.MinValue / 4, Long.MinValue / 4 + 1)) // deep negative
      .toDF("iid", "lo", "hi")
    for (width <- Seq(1L, 7L, 63L, 1000L, 1000000L)) {
      val got = sortedRows(RangeJoinOps
        .bucketedRangeJoin(points, intervals, "p", "lo", "hi", width)
        .select("pid", "iid"))
      val want = sortedRows(naive(points, intervals).select("pid", "iid"))
      assert(got === want, s"width=$width")
    }
  }

  private def naiveOverlap(a: DataFrame, b: DataFrame): DataFrame =
    a.join(b, col("a_lo") < col("b_hi") && col("b_lo") < col("a_hi"))

  test("bucketedOverlapJoin equals the naive overlap join (strict overlap, " +
      "points, nesting, touching endpoints excluded)") {
    import spark.implicits._
    val a = Seq(
      (1L, 0L, 10L), (2L, 10L, 20L),  // touch at 10 → no overlap
      (3L, 5L, 5L),                   // zero-length point
      (4L, -50L, 50L),                // spans many buckets, straddles zero
      (5L, 100L, 101L))
      .toDF("aid", "a_lo", "a_hi")
    val b = Seq(
      (10L, 9L, 11L),   // overlaps 1, 2, 4
      (11L, 3L, 8L),    // strictly contains the point 3
      (12L, 5L, 5L),    // point-on-point → no overlap
      (13L, -100L, 200L), // contains everything
      (14L, 20L, 30L))  // touches 2 at 20 → only 4 and 13-range overlap
      .toDF("bid", "b_lo", "b_hi")
    for (width <- Seq(1L, 7L, 64L, 1000L)) {
      val got = sortedRows(RangeJoinOps
        .bucketedOverlapJoin(a, b, "a_lo", "a_hi", "b_lo", "b_hi", width)
        .select("aid", "bid"))
      val want = sortedRows(naiveOverlap(a, b).select("aid", "bid"))
      assert(got === want, s"width=$width")
    }
  }

  test("bucketOf is exact at the Long extremes (no prescale wrap)") {
    import spark.implicits._
    // Long.MinValue with width 7: the old `c - pmod(c, w)` prescale wrapped
    // here and assigned a wrong bucket, silently dropping the match
    // (ADVICE r4). The floor-div form must pair the extreme point with an
    // interval that contains it.
    val points = Seq((1L, Long.MinValue), (2L, Long.MinValue + 3),
      (3L, Long.MaxValue)).toDF("pid", "p")
    val intervals = Seq(
      (10L, Long.MinValue, Long.MinValue + 5),
      (11L, Long.MaxValue - 2, Long.MaxValue)) // half-open: excludes MaxValue
      .toDF("iid", "lo", "hi")
    for (width <- Seq(1L, 7L, 1000000007L)) {
      val got = sortedRows(RangeJoinOps
        .bucketedRangeJoin(points, intervals, "p", "lo", "hi", width)
        .select("pid", "iid"))
      val want = sortedRows(naive(points, intervals).select("pid", "iid"))
      assert(got === want, s"width=$width")
      assert(got.nonEmpty, s"width=$width matched nothing") // non-vacuous
    }
  }

  test("bucketedOverlapJoin drops inverted intervals (documented semantics)") {
    import spark.implicits._
    // a=(5,3) is malformed (hi < lo); the naive theta predicate would
    // match it against b=(2,6), but the operator's precondition is
    // well-formed intervals and inverted rows are dropped — this spec pins
    // that choice.
    val a = Seq((1L, 5L, 3L), (2L, 2L, 4L)).toDF("aid", "a_lo", "a_hi")
    val b = Seq((10L, 2L, 6L)).toDF("bid", "b_lo", "b_hi")
    val got = RangeJoinOps.bucketedOverlapJoin(a, b,
      "a_lo", "a_hi", "b_lo", "b_hi", 4L)
    assert(sortedRows(got.select("aid", "bid")) === Seq("2|10"))
  }

  test("reserved __bucket column and oversized spans fail loudly") {
    import spark.implicits._
    val p = Seq((1L, 0L)).toDF("pid", "p")
    val withBucket = p.withColumn("__bucket", lit(9))
    val i = Seq((1L, 0L, 10L)).toDF("iid", "lo", "hi")
    val e1 = intercept[IllegalArgumentException] {
      RangeJoinOps.bucketedRangeJoin(withBucket, i, "p", "lo", "hi", 10L)
    }
    assert(e1.getMessage.contains("__bucket"))
    val e2 = intercept[IllegalArgumentException] {
      RangeJoinOps.bucketedOverlapJoin(
        i.toDF("aid", "a_lo", "a_hi").withColumn("__bucket", lit(1)),
        i.toDF("bid", "b_lo", "b_hi"), "a_lo", "a_hi", "b_lo", "b_hi", 10L)
    }
    assert(e2.getMessage.contains("__bucket"))
    // one interval spanning > maxBucketsPerInterval buckets with width 1:
    // descriptive error instead of an opaque sequence-cap failure
    val wide = Seq((1L, 0L, RangeJoinOps.maxBucketsPerInterval + 10))
      .toDF("iid", "lo", "hi")
    val e3 = intercept[Exception] {
      RangeJoinOps.bucketedRangeJoin(p, wide, "p", "lo", "hi", 1L).count()
    }
    def msgs(t: Throwable): Seq[String] = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(msgs(e3).exists(_.contains("bucketWidth")),
      s"unexpected error: ${msgs(e3)}")
    // an astronomically wide interval wraps the span SUBTRACTION itself —
    // the >= 0 conjunct must still route it to the descriptive error
    val astro = Seq((1L, Long.MinValue, Long.MaxValue)).toDF("iid", "lo", "hi")
    val e4 = intercept[Exception] {
      RangeJoinOps.bucketedRangeJoin(p, astro, "p", "lo", "hi", 1L).count()
    }
    assert(msgs(e4).exists(_.contains("bucketWidth")),
      s"unexpected error: ${msgs(e4)}")
  }

  test("bucketedOverlapJoin equals naive on fixture sessions") {
    import spark.implicits._
    val sessions = Sessionize
      .sessionize(Tables.events(spark, sfDir), "user_id", "ts", 1800)
      .groupBy($"user_id", $"session_id")
      .agg(min(unix_micros($"ts")).as("lo"), max(unix_micros($"ts")).as("hi"))
    val a = sessions.select($"user_id".as("a_uid"), $"lo".as("a_lo"),
      $"hi".as("a_hi"))
    val b = sessions.select($"user_id".as("b_uid"), $"lo".as("b_lo"),
      $"hi".as("b_hi"))
    val got = RangeJoinOps.bucketedOverlapJoin(a, b,
      "a_lo", "a_hi", "b_lo", "b_hi", 1800000000L)
      .filter($"a_uid" < $"b_uid")
    val want = naiveOverlap(a, b).filter($"a_uid" < $"b_uid")
    assert(got.count() === want.count())
    assert(got.count() > 0)
  }
}
