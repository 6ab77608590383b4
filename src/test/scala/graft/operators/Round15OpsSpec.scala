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
