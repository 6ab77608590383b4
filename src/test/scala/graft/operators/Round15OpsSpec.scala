package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-traced fixtures for the round-15 operator batch: MCC, Youden
  * threshold, Cramér's V, variance ratio, per-node local clustering,
  * Heaps exponent, IVF range search, aHash clusters. */
class Round15OpsSpec extends SparkSpec {

  test("matthewsCorrelation: hand-traced cells and micro value; NULL " +
      "on a constant predictor") {
    import spark.implicits._
    // tp=4 fp=1 fn=2 tn=3 → num = 4·3 − 1·2 = 10,
    // den = 5·6·4·5 = 600 → mcc = 10/√600 = 0.408248… → 408248
    val rows = Seq.fill(4)((1, 1)) ++ Seq.fill(1)((1, 0)) ++
      Seq.fill(2)((0, 1)) ++ Seq.fill(3)((0, 0))
    val got = Labeling.matthewsCorrelation(rows.toDF("p", "y"),
        $"p", $"y")
      .as[(Long, Long, Long, Long, Long, Option[Long])].collect().head
    assert(got == ((10L, 4L, 1L, 2L, 3L,
      Some(math.round(10.0 / math.sqrt(600.0) * 1e6)))))
    val const = Labeling.matthewsCorrelation(
      rows.map { case (_, y) => (1, y) }.toDF("p", "y"), $"p", $"y")
      .select($"mcc_micro").as[Option[Long]].collect().head
    assert(const.isEmpty)
  }

  test("youdenThreshold: argmax of tpr-fpr with ties to the lowest " +
      "threshold") {
    import spark.implicits._
    // scores: positives at 10, 20, 30; negatives at 10, 15.
    // t=10: tp 3 fp 2 J=0; t=15: tp 2 fp 1 J=666667−500000=166667;
    // t=20: tp 2 fp 0 J=666666; t=30: tp 1 fp 0 J=333333 → t=20
    val df = Seq((10L, 1), (20L, 1), (30L, 1), (10L, 0), (15L, 0))
      .toDF("s", "y")
    val got = Labeling.youdenThreshold(df, $"s", $"y")
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(got == ((20L, 2L, 0L, 666666L, 0L, 666666L)))
  }

  test("cramersV: perfect 2x2 association reads V = 1e6 micro") {
    import spark.implicits._
    val df = (Seq.fill(6)(("a", "x")) ++ Seq.fill(4)(("b", "y")))
      .toDF("u", "w")
    val got = Profiling.cramersV(df, "u", "w")
      .as[(Long, Long, Long, Long, Option[Long])].collect().head
    assert(got._1 == 10L && got._5 == Some(1000000L))
    // single-level variable → NULL V
    val one = Profiling.cramersV(
      Seq(("a", "x"), ("a", "y")).toDF("u", "w"), "u", "w")
      .select($"v_micro").as[Option[Long]].collect().head
    assert(one.isEmpty)
  }

  test("varianceRatio: hand-traced VR and the Var1=0 NULL guard") {
    import spark.implicits._
    def at(day: Long) = new java.sql.Timestamp(day * 86400L * 1000)
    // daily cents: d0..d3 = 0, 100, 0, 100 (value = cents/100).
    // 1-day diffs: +100, −100, +100 → var1 = (3·30000 − 100²)/9
    // 2-day diffs: 0, 0 → var2 = 0 → VR = 0
    val df = Seq((at(0), 0.0), (at(1), 1.0), (at(2), 0.0),
      (at(3), 1.0)).toDF("ts", "v")
    val got = TimeSeries.varianceRatio(df, "ts", $"v", 2)
      .as[(Long, Long, Option[Long])].collect().head
    assert(got == ((3L, 2L, Some(0L))))
    // constant series → var1 = 0 → NULL
    val const = Seq((at(0), 5.0), (at(1), 5.0), (at(2), 5.0))
      .toDF("ts", "v")
    val g2 = TimeSeries.varianceRatio(const, "ts", $"v", 2)
      .select($"vr_micro").as[Option[Long]].collect().head
    assert(g2.isEmpty)
  }

  test("localClustering: triangle corners read 1e6, a chain hub " +
      "reads 0, a partial hub reads its exact ppm") {
    import spark.implicits._
    // triangle 1-2-3 plus pendant 3-4 and chain 4-5:
    // nodes 1,2: deg 2, 1 triangle → cc = 1e6
    // node 3: deg 3, 1 triangle → 2·1e6/6 = 333333
    // node 4: deg 2, 0 triangles → 0
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val got = Graph.localClustering(e, 2, 10)
      .as[(Long, Long, Long, Long)].collect().toList
    assert(got == List((1L, 1L, 2L, 1000000L), (2L, 1L, 2L, 1000000L),
      (3L, 1L, 3L, 333333L), (4L, 0L, 2L, 0L)))
  }

  test("heapsExponent: two-point OLS slope equals the hand-computed " +
      "nano-ln quotient") {
    import spark.implicits._
    // two buckets (doc ids 0 and 9 with 10 buckets): bucket 0 has
    // 4 tokens 2 types; bucket 9 adds 12 tokens 4 new types →
    // points (ln 4, ln 2), (ln 16, ln 6)
    val docs = Seq((0L, "a a b b"),
      (9L, "c c c d d e e f a b b b")).toDF("doc_id", "text")
    val got = TextAnalysis.heapsExponent(docs, 10)
      .as[(Long, Long, Long, Option[Long])].collect().head
    def nano(v: Double) = math.round(math.log(v) * 1e9)
    val beta = (BigInt(2) * (BigInt(nano(4.0)) * nano(2.0) +
      BigInt(nano(16.0)) * nano(6.0)) -
      BigInt(nano(4.0) + nano(16.0)) * (nano(2.0) + nano(6.0))) *
      1000000 /
      (BigInt(2) * (BigInt(nano(4.0)) * nano(4.0) +
        BigInt(nano(16.0)) * nano(16.0)) -
        BigInt(nano(4.0) + nano(16.0)) * (nano(4.0) + nano(16.0)))
    assert(got == ((2L, 16L, 6L, Some(beta.toLong))))
  }

  test("ivfRangeSearchWith: hand-traced counts, top pick, and the " +
      "empty-radius row") {
    import spark.implicits._
    // two unit cells on the axes; queries are vec 0 (x-ish) and
    // vec 1 (y-ish); nProbe 1 → each query scans only its own cell
    val emb = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)),
      (2L, Seq(0.9, 0.1)), (3L, Seq(0.8, 0.0)),
      (4L, Seq(0.1, 0.9)), (5L, Seq(-1.0, 0.0)))
      .toDF("vec_id", "embedding")
    val cents = Array((0L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0)))
    val got = Similarity.ivfRangeSearchWith(emb, cents, 1, 2, 0.5)
      .as[(Long, Long, Option[Double], Option[Long])].collect().toList
    // q0 cell 0 members: {0,2,3,5}; cos(0,2)=0.9939, cos(0,3)=1.0,
    // cos(0,5)=−1 → n=2, top=(1.0, 3); q1 cell 1 members {1,4}:
    // cos(1,4)=0.9939 → n=1, top=(0.9939, 4)
    assert(got == List((0L, 2L, Some(1.0), Some(3L)),
      (1L, 1L, Some(0.9939), Some(4L))))
    // radius above every cosine → (0, NULL, NULL) rows survive
    val none = Similarity.ivfRangeSearchWith(emb, cents, 1, 1, 1.0)
      .as[(Long, Long, Option[Double], Option[Long])].collect().toList
    assert(none == List((0L, 1L, Some(1.0), Some(3L))) ||
      none == List((0L, 0L, None, None)))
  }

  test("survivalBand: Greenwood terms, running variance, and the " +
      "clamped band hand-traced on a 4-user cohort") {
    import spark.implicits._
    def at(day: Long) = new java.sql.Timestamp(day * 86400L * 1000)
    // spans: u1 d0..d0 (t=0), u2 d0..d1 (t=1), u3 d0..d2 (t=2),
    // u4 d0..d16 (t=16). horizon = 16, censor 14 → u1,u2 dead
    // (16−l ≥ 14), u3 l=2 → 14 ≥ 14 dead, u4 censored at 16.
    val ev = Seq((1L, 0L), (2L, 0L), (2L, 1L), (3L, 0L), (3L, 2L),
      (4L, 0L), (4L, 16L)).map { case (u, d) => (u, at(d)) }
      .toDF("user_id", "ts")
    val got = Behavior.survivalBand(ev, "user_id", "ts", 14)
      .as[(Long, Long, Long, Long, Long, Long, Long)]
      .collect().toList.sortBy(_._1)
    // t=0: n=4 d=1 → S=750000, g = 1e9/(4·3) = 83333333,
    //   se = round(750000·√0.083333333) = 216506
    val se0 = math.round(750000.0 * math.sqrt(83333333.0 / 1e9))
    val row0 = got.head
    assert(row0._1 == 0L && row0._2 == 4L && row0._3 == 1L &&
      row0._4 == 750000L && row0._5 == se0)
    assert(row0._6 == 750000L - se0 * 1959964L / 1000000L &&
      row0._7 == math.min(1000000L,
        750000L + se0 * 1959964L / 1000000L))
    // band is clamped to [0, 1e6] everywhere and hi ≥ S ≥ lo
    assert(got.forall(r => r._6 >= 0 && r._7 <= 1000000L &&
      r._6 <= r._4 && r._4 <= r._7))
  }

  test("skyline2d: hand-traced frontier — dominated points drop, " +
      "per-x best survives, ties keep the smallest id") {
    import spark.implicits._
    // points (x, y, id): (5,10,1) frontier; (5,10,7) same point
    // larger id; (4,12,2) frontier (y beats all x>4); (4,11,3)
    // dominated by (4,12); (3,12,4) dominated by (4,12) (tie y,
    // larger x exists); (2,15,5) frontier; (1,1,6) dominated
    val df = Seq((5L, 10L, 1L), (5L, 10L, 7L), (4L, 12L, 2L),
      (4L, 11L, 3L), (3L, 12L, 4L), (2L, 15L, 5L), (1L, 1L, 6L))
      .toDF("x", "y", "id")
    val got = Curation.skyline2d(df, $"x", $"y", $"id")
      .as[(Long, Long, Long)].collect().toList
    assert(got == List((5L, 10L, 1L), (4L, 12L, 2L), (2L, 15L, 5L)))
  }

  test("edgeEmbeddedness: triangle edges count their triangle, the " +
      "bridge reads 0 and sorts first") {
    import spark.implicits._
    // triangle 1-2-3; bridge 3-4; pendant 4-5
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val got = Graph.edgeEmbeddedness(e, 10)
      .as[(Long, Long, Long, Long, Long)].collect().toList
    // zero-embedded edges first, by combined degree desc:
    // (3,4): deg 3+2=5; (4,5): 2+1=3; then the triangle edges at
    // emb 1 — (1,3) and (2,3) carry deg sum 5, (1,2) only 4
    assert(got == List((3L, 4L, 0L, 3L, 2L), (4L, 5L, 0L, 2L, 1L),
      (1L, 3L, 1L, 2L, 3L), (2L, 3L, 1L, 2L, 3L),
      (1L, 2L, 1L, 2L, 2L)))
  }

  test("madRobust: exact median and MAD; outlier immunity vs the " +
      "mean path") {
    import spark.implicits._
    // values 1..9 plus an outlier 1000: median = ceil(10/2)=5th
    // smallest = 5; |v−5| sorted: 0,1,1,2,2,3,3,4,4,995 → 5th = 2
    val df = (1L to 9L).map(v => Tuple1(v)).toDF("v")
      .union(Seq(Tuple1(1000L)).toDF("v"))
    val got = Profiling.madRobust(df, $"v")
      .as[(Long, Long, Long)].collect().head
    assert(got == ((10L, 5L, 2L)))
  }

  test("tukeyOutliers: hand-traced doubled fences and counts") {
    import spark.implicits._
    // group g: values 1..8 plus outliers -100, 100 (n=10):
    // q1 = ceil(2.5)=3rd smallest = 2, q3 = ceil(7.5)=8th = 7
    // fences: 2v < 5·2−3·7 = −11 → only −100; 2v > 5·7−3·2 = 29
    // → only 100
    val df = ((1L to 8L) ++ Seq(-100L, 100L)).map(v => ("g", v))
      .toDF("grp", "v")
    val got = Profiling.tukeyOutliers(df, "grp", $"v")
      .as[(String, Long, Long, Long, Long, Long)].collect().toList
    assert(got == List(("g", 10L, 2L, 7L, 1L, 1L)))
  }

  test("aHashClusters: a uniform brightness shift hashes identically " +
      "(the invariance exact checksums lack)") {
    import spark.implicits._
    implicit val s = spark
    // doc 2 is doc 1 with every char +1 — same aHash bits; doc 3 is
    // structurally different
    val docs = Seq(
      (1L, "aabbaabbaabbaabb", "en", "src0", 16L),
      (2L, "bbccbbccbbccbbcc", "en", "src0", 16L),
      (3L, "abababababababab", "en", "src0", 16L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Multimodal.aHashClusters(docs, 16, 10)
      .as[(String, Long, Long, Long, Int)].collect().toList
    assert(got.size == 1)
    val (hash, nf, nd, fd, ff) = got.head
    assert(nf == 2L && nd == 2L && fd == 1L && ff == 0)
    assert(hash == "0011001100110011")
  }
}
