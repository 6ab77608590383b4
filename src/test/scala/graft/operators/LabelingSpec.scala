package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LabelingSpec extends SparkSpec {

  test("majorityVote: 3-LF consensus + per-LF audit, hand-traced") {
    import spark.implicits._
    // rows (a,b,c): (1,1,1) (1,1,0) (1,0,0) (0,0,0) → votes 1,1,0,0;
    // n=4 covered=4. a: pos 3, agree {r1,r2,r4} = 3; b: pos 2,
    // agree 4; c: pos 1, agree 3
    val df = Seq((1, 1, 1), (1, 1, 0), (1, 0, 0), (0, 0, 0))
      .toDF("a", "b", "c")
    val got = Labeling.majorityVote(df,
        Seq("a" -> $"a", "b" -> $"b", "c" -> $"c"))
      .orderBy($"lf")
      .as[(String, Long, Long, Long, Option[Long], Long)]
      .collect().toList
    assert(got == List(
      ("a", 4L, 4L, 3L, Some(750000L), 750000L),
      ("b", 4L, 4L, 4L, Some(1000000L), 500000L),
      ("c", 4L, 4L, 3L, Some(750000L), 250000L)))
  }

  test("majorityVote abstains on an exact 2-LF tie") {
    import spark.implicits._
    // (1,0) ties → vote NULL: covered only counts decided rows
    val df = Seq((1, 0), (1, 1), (0, 0)).toDF("a", "b")
    val got = Labeling.majorityVote(df, Seq("a" -> $"a", "b" -> $"b"))
      .orderBy($"lf")
      .as[(String, Long, Long, Long, Option[Long], Long)]
      .collect().toList
    // decided rows: (1,1)→1, (0,0)→0; both LFs agree on both
    assert(got == List(
      ("a", 3L, 2L, 2L, Some(1000000L), 666666L),
      ("b", 3L, 2L, 2L, Some(1000000L), 333333L)))
  }

  test("conflictMatrix: exact pairwise voted/agree/conflict/co-fire " +
      "counts; a NULL vote abstains, it does not conflict") {
    import spark.implicits._
    // rows (a,b,c): (1,1,1) (1,1,0) (1,0,0) (0,0,0) (NULL,1,1)
    // (a,b): voted 4, agree r1,r2,r4 = 3, both-pos r1,r2 = 2
    // (a,c): voted 4, agree r1,r4 = 2, both-pos r1 = 1
    // (b,c): voted 5, agree r1,r3,r4,r5 = 4, both-pos r1,r5 = 2
    val df = Seq[(Option[Int], Int, Int)](
      (Some(1), 1, 1), (Some(1), 1, 0), (Some(1), 0, 0),
      (Some(0), 0, 0), (None, 1, 1))
      .toDF("a", "b", "c")
    val got = Labeling.conflictMatrix(df,
        Seq("a" -> $"a", "b" -> $"b", "c" -> $"c"))
      .orderBy($"lf_a", $"lf_b")
      .as[(String, String, Long, Long, Long, Long, Long, Option[Long])]
      .collect().toList
    assert(got == List(
      ("a", "b", 5L, 4L, 3L, 1L, 2L, Some(750000L)),
      ("a", "c", 5L, 4L, 2L, 2L, 1L, Some(500000L)),
      ("b", "c", 5L, 5L, 4L, 1L, 2L, Some(800000L))))
  }

  test("conflictMatrix: underscore-bearing LF names cannot collide " +
      "(positional aliases)") {
    import spark.implicits._
    // name-based aliases would merge pair (a, b_c) with pair (a_b, c)
    val df = Seq((1, 1, 0, 1), (0, 1, 1, 1)).toDF("w", "x", "y", "z")
    val got = Labeling.conflictMatrix(df,
        Seq("a" -> $"w", "b_c" -> $"x", "a_b" -> $"y", "c" -> $"z"))
      .select($"lf_a", $"lf_b", $"n_agree")
      .as[(String, String, Long)].collect().toList
    assert(got.size == 6)
    assert(got.contains(("a", "b_c", 1L)) &&
      got.contains(("a_b", "c", 1L)))
  }

  test("conflictMatrix fail-fasts on fewer than two LFs") {
    import spark.implicits._
    val df = Seq(Tuple1(1)).toDF("a")
    val e = intercept[IllegalArgumentException] {
      Labeling.conflictMatrix(df, Seq("a" -> $"a"))
    }
    assert(e.getMessage.contains(">= 2 labeling functions"))
  }

  test("cohenKappa: textbook 2x2 fixture gives kappa = 0.4") {
    import spark.implicits._
    // n00=20 n01=5 n10=10 n11=15, n=50: po=35/50=0.7,
    // pe=(25·30+25·20)/2500 = 1250/2500 = 0.5 → kappa = 0.2/0.5
    //  = 0.4 → 400000 ppm
    val rows = Seq.fill(20)((0, 0)) ++ Seq.fill(5)((0, 1)) ++
      Seq.fill(10)((1, 0)) ++ Seq.fill(15)((1, 1))
    val got = Labeling.cohenKappa(rows.toDF("a", "b"), $"a", $"b")
      .as[(Long, Long, Long, Long, Long, Option[Long])]
      .collect().toList
    assert(got == List((50L, 20L, 5L, 10L, 15L, Some(400000L))))
  }

  test("cohenKappa is NULL when both labelers are constant") {
    import spark.implicits._
    val rows = Seq.fill(4)((1, 1))
    val got = Labeling.cohenKappa(rows.toDF("a", "b"), $"a", $"b")
      .as[(Long, Long, Long, Long, Long, Option[Long])]
      .collect().toList
    assert(got == List((4L, 0L, 0L, 0L, 4L, None)))
  }

  test("aucExact: ties get half credit; perfect ranking gives 1e6") {
    import spark.implicits._
    // scores/labels: (1,0) (2,0) (2,1) (3,1): pair credit — pos@2 vs
    // neg{1,2}: 1 + 0.5; pos@3 vs both negs: 2 → U+ = 3.5 of 4
    //  → 875000 ppm
    val df = Seq((1L, 0), (2L, 0), (2L, 1), (3L, 1)).toDF("s", "y")
    val got = Labeling.aucExact(df, $"s", $"y")
      .as[(Long, Long, Long)].collect().toList
    assert(got == List((2L, 2L, 875000L)))
    val perfect = Seq((1L, 0), (2L, 0), (3L, 1), (4L, 1)).toDF("s", "y")
    assert(Labeling.aucExact(perfect, $"s", $"y")
      .as[(Long, Long, Long)].collect().head._3 == 1000000L)
  }

  test("weightedVote: pass-1 agreement becomes integer-ppm weights; " +
      "audit is against the revoted consensus") {
    import spark.implicits._
    // pass 1 (q254 fixture): votes 1,1,0,0; agree a=3 b=4 c=3 →
    // weights 750000/1000000/750000, total 2.5e6. Revote scores
    // 2.5e6/1.75e6/0.75e6/0 → same labels → audit equals pass 1,
    // plus the weight column
    val df = Seq((1, 1, 1), (1, 1, 0), (1, 0, 0), (0, 0, 0))
      .toDF("a", "b", "c")
    val got = Labeling.weightedVote(df,
        Seq("a" -> $"a", "b" -> $"b", "c" -> $"c"))
      .orderBy($"lf")
      .as[(String, Long, Long, Long, Long, Option[Long], Long)]
      .collect().toList
    assert(got == List(
      ("a", 750000L, 4L, 4L, 3L, Some(750000L), 750000L),
      ("b", 1000000L, 4L, 4L, 4L, Some(1000000L), 500000L),
      ("c", 750000L, 4L, 4L, 3L, Some(750000L), 250000L)))
  }

  test("weightedVote fail-fasts when pass 1 never reaches a consensus") {
    import spark.implicits._
    val df = Seq((1, 0), (0, 1)).toDF("a", "b") // every row ties
    val e = intercept[IllegalArgumentException] {
      Labeling.weightedVote(df, Seq("a" -> $"a", "b" -> $"b"))
    }
    assert(e.getMessage.contains("never decided"))
  }

  test("mcnemar: discordant-cell chi2 in exact ppm; NULL at zero") {
    import spark.implicits._
    // n01=1, n10=4, n=10 → (1-4)^2 * 1e6 // 5 = 1800000
    val rows = Seq((0, 1)) ++ Seq.fill(4)((1, 0)) ++ Seq.fill(5)((1, 1))
    val got = Labeling.mcnemar(rows.toDF("a", "b"), $"a", $"b")
      .as[(Long, Long, Long, Option[Long])].collect().toList
    assert(got == List((10L, 1L, 4L, Some(1800000L))))
    val agree = Seq((1, 1), (0, 0)).toDF("a", "b")
    assert(Labeling.mcnemar(agree, $"a", $"b")
      .as[(Long, Long, Long, Option[Long])].collect().head._4.isEmpty)
  }

  test("cochranQ: textbook 4x3 panel gives Q = 3; unanimous is NULL") {
    import spark.implicits._
    // L = 3,2,1,0 → T1=6 T2=14; G = (3,2,1) → sumG2 = 14:
    // Q = (3·2·14 − 2·36)/(18 − 14) = 12/4 = 3 → 3000000 ppm
    val df = Seq((1, 1, 1), (1, 1, 0), (1, 0, 0), (0, 0, 0))
      .toDF("a", "b", "c")
    val got = Labeling.cochranQ(df, Seq($"a", $"b", $"c"))
      .as[(Long, Int, Long, Option[Long])].collect().toList
    assert(got == List((4L, 3, 6L, Some(3000000L))))
    val unanimous = Seq((1, 1, 1), (1, 1, 1)).toDF("a", "b", "c")
    assert(Labeling.cochranQ(unanimous, Seq($"a", $"b", $"c"))
      .as[(Long, Int, Long, Option[Long])].collect().head._4.isEmpty)
  }

  test("rocPoints: staircase thresholds with exact tp/fp, hand-traced") {
    import spark.implicits._
    // same fixture as aucExact's tie case — thresholds 1/2/3:
    // t=1 predicts all 1 → tp=2 fp=2; t=2 → tp=2 fp=1; t=3 → tp=1 fp=0
    val df = Seq((1L, 0), (2L, 0), (2L, 1), (3L, 1)).toDF("s", "y")
    val got = Labeling.rocPoints(df, $"s", $"y")
      .orderBy($"threshold")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toList
    assert(got == List(
      (1L, 2L, 2L, 1000000L, 1000000L, 500000L),
      (2L, 2L, 1L, 1000000L, 500000L, 666666L),
      (3L, 1L, 0L, 500000L, 0L, 1000000L)))
  }

  test("fleissKappa: cleared-denominator exact ppm on a 4x3 panel") {
    import spark.implicits._
    // x per subject: 3, 0, 3, 1 → A = 6+6+6+2 = 20, B = 24,
    // S1 = 7, C = 49+25 = 74, E = 144 → kappa = 46/70 → 657142 ppm
    val df = Seq((1, 1, 1), (0, 0, 0), (1, 1, 1), (1, 0, 0))
      .toDF("a", "b", "c")
    val got = Labeling.fleissKappa(df, Seq($"a", $"b", $"c"))
      .as[(Long, Int, Long, Option[Long])].collect().toList
    assert(got == List((4L, 3, 20L, Some(657142L))))
  }

  test("fleissKappa is NULL when every rater is constant") {
    import spark.implicits._
    val df = Seq((1, 1), (1, 1), (1, 1)).toDF("a", "b")
    val got = Labeling.fleissKappa(df, Seq($"a", $"b"))
      .as[(Long, Int, Long, Option[Long])].collect().toList
    // x = 2 each: A = sum(4+0-2) = 6, but P_e = 1 → NULL
    assert(got == List((3L, 2, 6L, None)))
  }

  test("calibrationBins: equal-width ppm bins, top edge joins bin 9") {
    import spark.implicits._
    // scores 50000(y=0), 150000(y=1), 150000(y=0), 1000000(y=1):
    // bins 0, 1, 1, 9 (the 1e6 edge clamps into 9)
    val df = Seq((50000L, 0), (150000L, 1), (150000L, 0),
      (1000000L, 1)).toDF("s", "y")
    val got = Labeling.calibrationBins(df, $"s", $"y", 10)
      .orderBy($"bin")
      .as[(Int, Long, Long, Long)].collect().toList
    assert(got == List(
      (0, 1L, 50000L, 0L),
      (1, 2L, 150000L, 500000L),
      (9, 1L, 1000000L, 1000000L)))
  }

  test("dsPatternState: split → merge → refit equals dawidSkene's " +
      "full-corpus parameters exactly; state is pattern-sized") {
    import spark.implicits._
    // 12 units over 5 distinct patterns (incl. abstentions); the
    // pattern histogram is the EM's sufficient statistic, so the
    // incremental path must be row-identical to the direct fit.
    val rows = Seq(
      (1, Some(1), Some(1), Some(1)), (2, Some(1), Some(1), Some(0)),
      (3, Some(1), Some(1), Some(1)), (4, Some(0), Some(0), Some(0)),
      (5, Some(0), None, Some(0)), (6, Some(1), Some(0), Some(1)),
      (7, Some(1), Some(1), Some(1)), (8, Some(0), Some(0), Some(0)),
      (9, Some(0), None, Some(0)), (10, Some(1), Some(1), Some(0)),
      (11, Some(1), Some(0), Some(1)), (12, Some(0), Some(0), Some(0)))
      .toDF("id", "a", "b", "c")
    val lfs = Seq($"a", $"b", $"c")
    val full = Labeling.dawidSkene(rows, lfs, iters = 2)
      .collect().toList
    val prior = Labeling.dsPatternState(rows.filter($"id" % 2 === 0), lfs)
    val append = Labeling.dsPatternState(rows.filter($"id" % 2 =!= 0), lfs)
    val merged = Labeling.mergeDsPatternState(prior, append)
    val st = merged.collect()
    assert(st.length == 5 && st.map(_.getLong(3)).sum == 12L)
    val got = Labeling.dawidSkeneFromState(merged, iters = 2)
      .collect().toList
    assert(got == full)
  }

  test("calibrationBins fail-fasts on out-of-range scores") {
    import spark.implicits._
    val df = Seq((2000000L, 1)).toDF("s", "y")
    val e = intercept[Exception] {
      Labeling.calibrationBins(df, $"s", $"y", 10).collect()
    }
    assert(e.getMessage.contains("out of [0, 1000000]") ||
      (e.getCause != null &&
        e.getCause.getMessage.contains("out of [0, 1000000]")))
  }
}
