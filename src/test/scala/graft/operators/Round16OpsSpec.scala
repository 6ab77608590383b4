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

  test("averagePrecision: hand-traced step-wise AP with a tie group; " +
      "NULL on no positives") {
    import spark.implicits._
    // desc: s=3 (tp1 fp0, p=1e6), s=2 tie group (tp2 fp1, p=666666),
    // s=1 (tp3 fp1, p=750000) -> AP = (1e6+666666+750000)/3 = 805555
    val df = Seq((3L, 1), (2L, 0), (2L, 1), (1L, 1)).toDF("s", "y")
    val got = Labeling.averagePrecision(df, $"s", $"y")
      .as[(Long, Long, Option[Long])].collect().head
    assert(got == ((3L, 1L, Some(805555L))))
    val none = Labeling.averagePrecision(
      Seq((3L, 0), (2L, 0)).toDF("s", "y"), $"s", $"y")
      .as[(Long, Long, Option[Long])].collect().head
    assert(none == ((0L, 2L, None)))
  }

  test("brownForsythe: hand-traced W over median-centered deviations") {
    import spark.implicits._
    // a: 1,2,3,4 (med 2, z 1,0,1,2 -> S=4 Q=6); b: 10,10,20,30
    // (med 10, z 0,0,10,20 -> S=30 Q=500). sb = 16//4 + 900//4 = 229;
    // ssb = 229 - 34*34//8 = 85; ssw = 506 - 229 = 277;
    // W_micro = 6*85*1e6 // 277 = 1841155
    val df = (Seq(1L, 2L, 3L, 4L).map(("a", _)) ++
      Seq(10L, 10L, 20L, 30L).map(("b", _))).toDF("g", "v")
    val got = Profiling.brownForsythe(df, "g", $"v")
      .as[(Long, Long, Option[Long])].collect().head
    assert(got == ((8L, 2L, Some(1841155L))))
    // one group: W undefined -> NULL
    val one = Profiling.brownForsythe(
      Seq(("a", 1L), ("a", 5L)).toDF("g", "v"), "g", $"v")
      .as[(Long, Long, Option[Long])].collect().head
    assert(one == ((2L, 1L, None)))
  }

  test("pmiCollocations: hand-traced PMI with self-consistent " +
      "bigram marginals") {
    import spark.implicits._
    implicit val s = spark
    // two copies of "a b a b": c12(a,b)=4, c12(b,a)=2, N=6,
    // c1(a)=4 c1(b)=2, c2(b)=4 c2(a)=2
    // PMI(a,b) = ln(24/16) = ln(1.5); PMI(b,a) = ln(12/4) = ln(3)
    val docs = Seq((1L, "a b a b"), (2L, "a b a b"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.pmiCollocations(docs, 2, 10)
      .as[(String, String, Long, Long)].collect().toList
    assert(got == List(
      ("b", "a", 2L, math.round(math.log(3.0) * 1e9)),
      ("a", "b", 4L, math.round(math.log(1.5) * 1e9))))
  }

  test("jsDivergence: hand-traced two-corpus JSD with one-sided " +
      "tokens contributing ln 2") {
    import spark.implicits._
    implicit val s = spark
    // A = "x x y" (a_x=2 a_y=1, A=3); B = "x z" (b_x=1 b_z=1, B=2)
    // jsd = (2ln(8/7)+ln2)/6 + (ln(6/7)+ln2)/4 = 0.294784
    val docs = Seq(("s0", "x x y"), ("s1", "x z")).toDF("source", "text")
    val got = TextAnalysis.jsDivergence(docs, $"source" === "s0")
      .as[(Long, Long, Double)].collect().head
    assert(got._1 == 3L && got._2 == 2L)
    val expect = BigDecimal(
      (2 * math.log(8.0 / 7) + math.log(2.0)) / 6 +
        (math.log(6.0 / 7) + math.log(2.0)) / 4)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got._3 == expect && math.abs(got._3 - 0.294784) < 1e-9)
  }

  test("quantileDrift: exact per-side ranks at ceil(q*n) and deltas") {
    import spark.implicits._
    val df = ((1L to 10L).map(("a", _)) ++ (11L to 20L).map(("b", _)))
      .toDF("g", "v")
    val got = Profiling.quantileDrift(df, $"g" === "a", $"v",
        Seq(0.25, 0.5))
      .as[(Long, Long, Long, Long)].collect().toList
    // ceil(0.25*10)=3rd, ceil(0.5*10)=5th per side
    assert(got == List((250L, 3L, 13L, 10L), (500L, 5L, 15L, 10L)))
  }

  test("cochranArmitage: hand-traced trend numerator and cleared z^2") {
    import spark.implicits._
    implicit val s = spark
    // arms (user%3): 0:{u0 conv,u3}, 1:{u1 conv,u4 conv}, 2:{u2,u5 conv both}
    // n=(2,2,2) r=(1,2,2): N=6 R=5 A1=6 A2=6 A3=10
    // T = 36-30 = 6; z2 = ((36//5)*5*1e6)//24 = 1458333
    val ev = Seq((0L, "purchase"), (3L, "view"), (1L, "purchase"),
      (4L, "purchase"), (2L, "purchase"), (5L, "purchase"))
      .toDF("user_id", "event_type")
    val got = Behavior.cochranArmitage(ev, "user_id", 3)
      .as[(Long, Long, Long, Option[Long])].collect().head
    assert(got == ((6L, 5L, 6L, Some(1458333L))))
    // all converted: R = N -> variance 0 -> NULL
    val degen = Behavior.cochranArmitage(
      ev.withColumn("event_type", lit("purchase")), "user_id", 3)
      .as[(Long, Long, Long, Option[Long])].collect().head
    assert(degen._4.isEmpty)
  }

  test("informationGain: hand-traced stump IG in nats") {
    import spark.implicits._
    // split true: 3 pos 1 neg; false: 1 pos 3 neg -> Hp = ln2,
    // each side H = ln4 - (3ln3)/4, IG = ln2 - that = 0.130812
    val df = (Seq.fill(3)((400L, "en")) ++ Seq((400L, "de")) ++
      Seq((100L, "en")) ++ Seq.fill(3)((100L, "de")))
      .toDF("len", "lang")
    val got = Labeling.informationGain(df, $"len" >= 300,
        ($"lang" === "en").cast("int"))
      .as[(Long, Long, Long, Double)].collect().head
    val hSide = math.log(4) - 3 * math.log(3) / 4
    val expect = BigDecimal(math.log(2) - hSide)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == ((8L, 4L, 4L, expect)))
    assert(math.abs(got._4 - 0.130812) < 1e-9)
  }

  test("theilU: hand-traced paired-day RMSEs and skill ratio") {
    import spark.implicits._
    implicit val s = spark
    // days 0,1,7,8 with cents 100,110,130,118: only day 8 has BOTH
    // d-7 (=110) and d-1 (=130): ss=64 s1=144 -> rmse 8/12, u=666667
    def at(day: Long) = new java.sql.Timestamp(day * 86400L * 1000)
    val df = Seq((at(0), 1.00), (at(1), 1.10), (at(7), 1.30),
      (at(8), 1.18)).toDF("ts", "v")
    val got = TimeSeries.theilU(df, "ts", $"v", 7)
      .as[(Long, Option[Long], Option[Long], Option[Long])]
      .collect().head
    assert(got == ((1L, Some(8L), Some(12L), Some(666667L))))
    // no paired days -> NULLs, not a crash
    val none = TimeSeries.theilU(
      Seq((at(0), 1.0)).toDF("ts", "v"), "ts", $"v", 7)
      .as[(Long, Option[Long], Option[Long], Option[Long])]
      .collect().head
    assert(none == ((0L, None, None, None)))
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
