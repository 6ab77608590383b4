package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{CandleAggregator, PricePoint}

class OperatorSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("AsOfJoin.asOf picks latest right row at-or-before left ts, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "e1"),
      (1L, ts("2024-01-01 12:00:00"), "e2"),
      (1L, ts("2024-01-01 09:00:00"), "e0"),
      (2L, ts("2024-01-01 10:00:00"), "e3")
    ).toDF("k", "t", "name")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10.0), // exactly-equal ts IS visible
      (1L, ts("2024-01-01 11:00:00"), 11.0),
      (2L, ts("2024-01-01 11:00:00"), 20.0)  // after left → not visible
    ).toDF("k", "t", "price")

    val got = AsOfJoin.asOf(left, right, "k", "t", "t", Seq("price"))
      .select($"name", $"asof_price").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got("e0").isEmpty)           // nothing before 09:00
    assert(got("e1").contains(10.0))    // ties: >= semantics
    assert(got("e2").contains(11.0))    // latest prior wins
    assert(got("e3").isEmpty)           // other key's rows invisible
  }

  test("AsOfJoin.asOfForward picks earliest right row at-or-after left ts") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "e1"),
      (1L, ts("2024-01-01 12:00:00"), "e2"),
      (2L, ts("2024-01-01 12:00:00"), "e3")
    ).toDF("k", "t", "name")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10.0), // exactly-equal ts IS visible
      (1L, ts("2024-01-01 11:00:00"), 11.0),
      (2L, ts("2024-01-01 11:00:00"), 20.0)  // before left → not visible
    ).toDF("k", "t", "price")
    val got = AsOfJoin.asOfForward(left, right, "k", "t", "t", Seq("price"))
      .select($"name", $"asof_price").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got("e1").contains(10.0))    // ties: <= semantics
    assert(got("e2").isEmpty)           // nothing after 12:00
    assert(got("e3").isEmpty)           // other key's 11:00 is in the past
  }

  test("as-of joins: null timestamps match nothing, both directions") {
    import spark.implicits._
    val left = Seq(
      (1L, Option(ts("2024-01-01 10:00:00")), "ok"),
      (1L, Option.empty[java.sql.Timestamp], "null_ts")
    ).toDF("k", "t", "name")
    val right = Seq(
      (1L, Option(ts("2024-01-01 09:00:00")), 9.0),
      (1L, Option(ts("2024-01-01 11:00:00")), 11.0),
      (1L, Option.empty[java.sql.Timestamp], 99.0) // never a neighbor
    ).toDF("k", "t", "price")
    def payloads(df: org.apache.spark.sql.DataFrame) = df
      .select($"name", $"asof_price").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    val back = payloads(AsOfJoin.asOf(left, right, "k", "t", "t", Seq("price")))
    assert(back("ok").contains(9.0))
    assert(back("null_ts").isEmpty) // would grab 99.0 without the mask
    val fwd = payloads(
      AsOfJoin.asOfForward(left, right, "k", "t", "t", Seq("price")))
    assert(fwd("ok").contains(11.0))
    assert(fwd("null_ts").isEmpty) // would grab the partition edge without it
  }

  test("Upsert.upsertIgnore keeps existing rows and dedups incoming") {
    import spark.implicits._
    val existing = Seq((1L, "old"), (2L, "old")).toDF("k", "v")
    val incoming = Seq((2L, "new"), (3L, "new"), (3L, "new2")).toDF("k", "v")
    val out = Upsert.upsertIgnore(incoming, existing, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "old")
    assert(out(2L) == "old")            // INSERT IGNORE: existing wins
    assert(out(3L).startsWith("new"))   // in-batch dedup kept exactly one
    assert(out.size == 3)
  }

  test("Upsert.upsertIgnore is idempotent (re-delivery is a no-op)") {
    import spark.implicits._
    val existing = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val once = Upsert.upsertIgnore(existing, existing, Seq("k"))
    val twice = Upsert.upsertIgnore(once, existing, Seq("k"))
    assert(twice.count() == 2)
  }

  test("Upsert.scd2 compacts unchanged runs, closes intervals, orders " +
      "same-ts changes by the tie column") {
    import spark.implicits._
    val log = Seq(
      (1L, 10L, "x", ts("2024-01-01 10:00:00")),
      (2L, 10L, "x", ts("2024-01-01 11:00:00")), // unchanged → collapsed
      (3L, 10L, "y", ts("2024-01-01 12:00:00")), // change → new version
      (4L, 20L, "z", ts("2024-01-01 10:00:00")),
      (5L, 30L, "a", ts("2024-01-01 09:00:00")),
      (6L, 30L, "b", ts("2024-01-01 09:00:00")) // same ts: event_id orders
    ).toDF("event_id", "user_id", "event_type", "t")
    val got = Upsert.scd2(log, "user_id", "event_type", "t", "event_id")
      .orderBy($"user_id", $"valid_from", $"event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3).toString,
        Option(r.getTimestamp(4)).map(_.toString), r.getInt(5))).toList
    assert(got == List(
      (10L, 1L, "x", "2024-01-01 10:00:00.0",
        Some("2024-01-01 12:00:00.0"), 0),
      (10L, 3L, "y", "2024-01-01 12:00:00.0", None, 1),
      (20L, 4L, "z", "2024-01-01 10:00:00.0", None, 1),
      (30L, 5L, "a", "2024-01-01 09:00:00.0",
        Some("2024-01-01 09:00:00.0"), 0),
      (30L, 6L, "b", "2024-01-01 09:00:00.0", None, 1)))
  }

  test("Upsert.scd2 is NULL-safe: a transition INTO a NULL state opens " +
      "a version, consecutive NULLs compact, a NULL first state is kept") {
    import spark.implicits._
    val log = Seq(
      // u10: x → NULL (must version) → NULL (must compact) → x
      (1L, 10L, Some("x"), ts("2024-01-01 10:00:00")),
      (2L, 10L, None, ts("2024-01-01 11:00:00")),
      (3L, 10L, None, ts("2024-01-01 12:00:00")),
      (4L, 10L, Some("x"), ts("2024-01-01 13:00:00")),
      // u20: NULL first state — the rn === 1 guard keeps it
      (5L, 20L, None, ts("2024-01-01 09:00:00"))
    ).toDF("event_id", "user_id", "event_type", "t")
    val got = Upsert.scd2(log, "user_id", "event_type", "t", "event_id")
      .orderBy($"user_id", $"valid_from", $"event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)), r.getTimestamp(3).toString,
        Option(r.getTimestamp(4)).map(_.toString), r.getInt(5))).toList
    assert(got == List(
      (10L, 1L, Some("x"), "2024-01-01 10:00:00.0",
        Some("2024-01-01 11:00:00.0"), 0),
      (10L, 2L, None, "2024-01-01 11:00:00.0",
        Some("2024-01-01 13:00:00.0"), 0),
      (10L, 4L, Some("x"), "2024-01-01 13:00:00.0", None, 1),
      (20L, 5L, None, "2024-01-01 09:00:00.0", None, 1)))
  }

  test("Upsert.scd2Merge folds an append-only batch into existing " +
      "versions == full-log rebuild (compaction across the seam both " +
      "ways: repeated open state collapses, changed state closes it)") {
    import spark.implicits._
    val full = Seq(
      (1L, 10L, "x", ts("2024-01-01 10:00:00")),
      (2L, 10L, "x", ts("2024-01-01 11:00:00")), // compacted pre-cutoff
      (3L, 20L, "y", ts("2024-01-01 11:30:00")),
      // ---- cutoff: 2024-01-01 12:00:00 ----
      (4L, 10L, "x", ts("2024-01-01 13:00:00")), // repeats open state
      (5L, 10L, "z", ts("2024-01-01 14:00:00")), // closes x, opens z
      (6L, 20L, "y", ts("2024-01-01 15:00:00")), // repeats open state
      (7L, 30L, "q", ts("2024-01-01 16:00:00"))  // brand-new key
    ).toDF("event_id", "user_id", "event_type", "t")
    val cut = ts("2024-01-01 12:00:00")
    val existing = Upsert.scd2(full.filter($"t" <= cut),
      "user_id", "event_type", "t", "event_id")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"user_id", $"valid_from", $"event_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getTimestamp(3).toString,
          Option(r.getTimestamp(4)).map(_.toString), r.getInt(5))).toList
    val merged = canon(Upsert.scd2Merge(existing,
      full.filter($"t" > cut), "user_id", "event_type", "t", "event_id"))
    val rebuilt = canon(Upsert.scd2(full,
      "user_id", "event_type", "t", "event_id"))
    assert(merged == rebuilt)
    assert(merged.map(_._1).distinct == List(10L, 20L, 30L))
  }

  test("Upsert.snapshotDiff classifies added/removed/changed/unchanged " +
      "with NULL-safe per-column compare") {
    import spark.implicits._
    // a: 1→(1,p) 2→(2,p) 3→(null,p); b: 2→(5,p) 3→(null,p) 4→(7,q)
    // added {4}, removed {1}, changed {2} (x only), unchanged {3}
    // (null <=> null is a match, not a change)
    val a = Seq((1L, Some(1L), "p"), (2L, Some(2L), "p"),
      (3L, None, "p")).toDF("k", "x", "s")
    val b = Seq((2L, Some(5L), "p"), (3L, None, "p"),
      (4L, Some(7L), "q")).toDF("k", "x", "s")
    val got = Upsert.snapshotDiff(a, b, "k")
      .as[(String, Long)].collect().toMap
    assert(got == Map("n_a" -> 3L, "n_b" -> 3L, "added" -> 1L,
      "removed" -> 1L, "changed" -> 1L, "unchanged" -> 1L,
      "changed:x" -> 1L, "changed:s" -> 0L))
  }

  test("Upsert.snapshotDiff fail-fasts on schema drift between snapshots") {
    import spark.implicits._
    val a = Seq((1L, 1L)).toDF("k", "x")
    val b = Seq((1L, 1L)).toDF("k", "y")
    val e = intercept[IllegalArgumentException] {
      Upsert.snapshotDiff(a, b, "k")
    }
    assert(e.getMessage.contains("schemas differ"))
  }

  test("Sessionize splits on gaps strictly greater than the threshold") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:30:00")), // exactly 1800 s → same session
      (1L, ts("2024-01-01 11:00:01")), // 1801 s → new session
      (2L, ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "t")
    val got = Sessionize.sessionize(ev, "user_id", "t", 1800L)
      .select($"user_id", $"t", $"session_id").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString) -> r.getInt(2)).toMap
    assert(got((1L, "2024-01-01 10:00:00.0")) == 1)
    assert(got((1L, "2024-01-01 10:30:00.0")) == 1)
    assert(got((1L, "2024-01-01 11:00:01.0")) == 2)
    assert(got((2L, "2024-01-01 10:00:00.0")) == 1)
  }

  test("CandleAggregator computes deterministic OHLC with tie-broken order") {
    import spark.implicits._
    val pts = Seq(
      PricePoint(1L, 100L, 2L, 5.0),  // same ord1 as next; ord2 breaks tie
      PricePoint(1L, 100L, 1L, 3.0),  // first (100,1) → open=3
      PricePoint(1L, 200L, 1L, 9.0),  // last → close=9
      PricePoint(1L, 150L, 1L, 1.0)   // low
    ).toDS()
    val c = pts.groupByKey(_.key).agg(new CandleAggregator().toColumn)
      .collect().head._2
    assert(c.open == 3.0 && c.close == 9.0 && c.low == 1.0 && c.high == 9.0)
    assert(c.total == 18.0 && c.n == 4L)
  }

  test("CandleAggregator registers as a SQL UDAF (§2.11 surface)") {
    import org.apache.spark.sql.{functions => F, Encoders}
    import spark.implicits._
    spark.udf.register("candle_agg",
      F.udaf(new CandleAggregator(), Encoders.product[PricePoint]))
    Seq(
      PricePoint(1L, 100L, 1L, 3.0),
      PricePoint(1L, 200L, 1L, 9.0)
    ).toDS().createOrReplaceTempView("pts")
    val c = spark.sql(
      "SELECT candle_agg(key, ord1, ord2, v) AS c FROM pts GROUP BY key")
      .select("c.open", "c.close", "c.n").head()
    assert(c.getDouble(0) == 3.0 && c.getDouble(1) == 9.0 && c.getLong(2) == 2L)
  }

  test("approx_count_distinct is within 3*rsd of exact at sf0.001") {
    import spark.implicits._
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val exact = li.select(countDistinct($"l_partkey")).as[Long].head()
    val approx = li.select(approx_count_distinct($"l_partkey", 0.01)).as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact <= 0.03)
  }
}
