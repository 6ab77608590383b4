package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed fixtures for the curation ops (Curation.scala) and the
  * chunk-dedup rewrite (Dedup.chunkDedupRewrite) — every expected value in
  * here is derived on paper (or via an independent JVM md5), never from the
  * operator under test. */
class CurationSpec extends SparkSpec {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("withGlobalCumsum ranks and prefix-sums across range partitions") {
    import spark.implicits._
    // 40 rows over 4 shuffle partitions so level two really folds multiple
    // buckets; v = id so cum is the triangular number id*(id+1)/2.
    val df = (1L to 40L).map(i => (i, i)).toDF("id", "v")
    val got = Curation.withGlobalCumsum(df, Seq($"id".asc), $"v")
      .select($"id", $"rn", $"cum", $"tot")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.length == 40)
    got.foreach { case (id, rn, cum, tot) =>
      assert(rn == id, s"rank of $id")
      assert(cum == id * (id + 1) / 2, s"cumsum at $id")
      assert(tot == 820L)
    }
  }

  test("withGlobalCumsums carries k running sums + totals in one pass") {
    import spark.implicits._
    // 40 rows over 4 buckets; a = id, b = 2·id (descending order column
    // dir = -id proves the order argument is honored independently of
    // the value columns): at rank r (id = 41 - r) the inclusive sums are
    // the top-r triangular tails.
    val df = (1L to 40L).map(i => (i, i, 2 * i)).toDF("id", "a", "b")
    val got = Curation.withGlobalCumsums(df, Seq($"id".desc),
        Seq("a" -> $"a", "b" -> $"b"))
      .select($"id", $"rn", $"cum_a", $"tot_a", $"cum_b", $"tot_b")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.length == 40)
    got.foreach { case (id, rn, ca, ta, cb, tb) =>
      val tail = (id to 40L).sum // inclusive sum of ids ≥ id (desc order)
      assert(rn == 41 - id, s"rank of $id")
      assert(ca == tail, s"cum_a at $id")
      assert(cb == 2 * tail, s"cum_b at $id")
      assert(ta == 820L && tb == 1640L)
    }
  }

  test("withGlobalCumsums rejects duplicate and colliding names") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("id", "v")
    intercept[IllegalArgumentException] {
      Curation.withGlobalCumsums(df, Seq($"id"),
        Seq("x" -> $"v", "x" -> $"v"))
    }
    intercept[IllegalArgumentException] {
      Curation.withGlobalCumsums(df.withColumnRenamed("v", "cum_x"),
        Seq($"id"), Seq("x" -> $"cum_x"))
    }
  }

  test("packBins splits the concatenated token stream at exact boundaries") {
    import spark.implicits._
    // capacity 4; doc1 "a b c"(3), doc2 "d e"(2), doc3 "f g h i j"(5);
    // stream = 10 tokens -> bins 0..2.
    //   bin 0: doc1 fully (3) + doc2 first token (1); full docs = {doc1}
    //   bin 1: doc2 last token (1) + doc3 tokens 1-3 (3); no full docs
    //   bin 2: doc3 tokens 4-5 (2); no full docs
    val docs = Seq((1L, "a b c"), (2L, "d e"), (3L, "f g h i j"))
      .toDF("doc_id", "text")
    val got = Curation.packBins(docs, 4L)
      .select($"bin", $"n_docs", $"n_full_docs", $"n_tokens",
        $"first_doc", $"last_doc")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toList
    assert(got == List(
      (0L, 2L, 1L, 4L, 1L, 2L),
      (1L, 2L, 0L, 4L, 2L, 3L),
      (2L, 1L, 0L, 2L, 3L, 3L)))
  }

  test("budgetCut keeps the boundary-crossing row and respects a 0 budget") {
    import spark.implicits._
    // v: 5,3,2,10 in id order -> tot 20, budget 1/2 = 10 tokens.
    // Row 3 STARTS at 8 < 10 so it is kept even though it ends exactly at
    // the boundary; row 4 starts at 10 (not strictly inside) and is cut.
    val df = Seq((1L, 5L), (2L, 3L), (3L, 2L), (4L, 10L)).toDF("id", "v")
    val half = Curation.budgetCut(df, Seq($"id".asc), "v", 1L, 2L)
      .select($"id", $"kept").as[(Long, Boolean)].collect().toMap
    assert(half == Map(1L -> true, 2L -> true, 3L -> true, 4L -> false))
    val zero = Curation.budgetCut(df, Seq($"id".asc), "v", 0L, 1L)
      .filter($"kept").count()
    assert(zero == 0L)
    val all = Curation.budgetCut(df, Seq($"id".asc), "v", 1L, 1L)
      .filter($"kept").count()
    assert(all == 4L)
  }

  test("mixtureSample matches an independent JVM md5 threshold count") {
    import spark.implicits._
    // 2 strata x 50 single-token docs; budget 1/2 -> per-stratum share =
    // 100/4 = 25 tokens, thr = 25*2^32/50. Expected counts recomputed
    // here from java MessageDigest, independently of Spark's md5/conv.
    val docs = (0L until 100L)
      .map(i => (i, "tok", if (i < 50) "s1" else "s2"))
      .toDF("doc_id", "text", "source")
    val thr = (25L * 4294967296L) / 50L
    def expected(ids: Range): Long = ids.count { i =>
      java.lang.Long.parseLong(md5hex(i.toString).substring(0, 8), 16) < thr
    }.toLong
    val got = Curation.mixtureSample(docs, 1L, 2L)
      .select($"stratum", $"n_docs", $"n_sampled", $"tok_sampled")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toList
    assert(got == List(
      ("s1", 50L, expected(0 until 50), expected(0 until 50)),
      ("s2", 50L, expected(50 until 100), expected(50 until 100))))
  }

  test("mixtureSample keeps every doc of a stratum whose rate reaches 1") {
    import spark.implicits._
    // Single stratum, budget 1/1 -> share = src_tok -> thr = 2^32 > any h.
    val docs = (0L until 20L).map(i => (i, "a b", "only"))
      .toDF("doc_id", "text", "source")
    val got = Curation.mixtureSample(docs, 1L, 1L)
      .select($"n_docs", $"n_sampled", $"tok_sampled")
      .as[(Long, Long, Long)].collect().toList
    assert(got == List((20L, 20L, 40L)))
  }

  test("chunkDedupRewrite drops repeated chunks and rebuilds clean text") {
    import spark.implicits._
    // width 3: doc1 = [a b c][d e f][g] (partial trailing chunk kept);
    // doc2 duplicates doc1 exactly -> fully emptied but still present;
    // doc3 shares chunk [a b c] (first seen in doc1) and keeps [x y z].
    val docs = Seq(
      (1L, "a b c d e f g"),
      (2L, "a b c d e f g"),
      (3L, "a b c x y z")
    ).toDF("doc_id", "text")
    val got = Dedup.chunkDedupRewrite(docs, 3)
      .select($"doc_id", $"n_chunks", $"n_kept", $"n_clean_tokens",
        $"clean_md5")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1).toList
    assert(got == List(
      (1L, 3L, 3L, 7L, md5hex("a b c d e f g")),
      (2L, 3L, 0L, 0L, md5hex("")),
      (3L, 2L, 1L, 3L, md5hex("x y z"))))
  }

  /** The 32-bit md5 id hash every deterministic sampler draws from,
    * replayed independently of the operator. */
  private def hash32(id: Long): Long =
    java.lang.Long.parseLong(md5hex(id.toString).take(8), 16)

  test("weightedSample replays the A-ES race; nonpositive weights excluded") {
    import spark.implicits._
    // weights = 10*id; doc 11 has weight 0 and must never appear even
    // though k exceeds the positive-weight row count after the cut.
    val docs = ((1L to 10L).map(i => (i, i * 10L)) :+ (11L, 0L))
      .toDF("doc_id", "n_chars")
    val expected = (1L to 10L).map { id =>
      val u = (hash32(id) + 1L) / 4294967296.0
      val key = BigDecimal(math.log(u) / (id * 10L) * 1e9)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      (id, id * 10L, key)
    }.sortBy { case (id, _, key) => (-key, id) }.take(3).toList
    val got = Curation.weightedSample(docs, 3, "n_chars")
      .as[(Long, Long, Long)].collect().toList
    assert(got == expected)
  }

  test("weightedSample ranks on the TRUNCATED long weight (the replay " +
      "contract), and weights truncating to 0 are excluded") {
    import spark.implicits._
    // fractional weights: 2.9 competes as 2, 0.9 truncates to 0 -> out
    val docs = Seq((1L, 2.9), (2L, 5.1), (3L, 0.9)).toDF("doc_id", "w")
    val expected = Seq((1L, 2L), (2L, 5L)).map { case (id, w) =>
      val u = (hash32(id) + 1L) / 4294967296.0
      val key = BigDecimal(math.log(u) / w * 1e9)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      (id, w, key)
    }.sortBy { case (id, _, key) => (-key, id) }.toList
    val got = Curation.weightedSample(docs, 3, "w")
      .as[(Long, Long, Long)].collect().toList
    assert(got == expected)
  }

  test("curationPipeline chains quality -> dedup winners -> budget cut") {
    import spark.implicits._
    // 25-word passing text (>= 20 words, alpha, stopwords, sane lengths)
    val good = ("the data and that have with good text " +
      (1 to 17).map(i => s"word$i").mkString(" "))
    val docs = Seq(
      (1L, good),                        // quality pass, winner
      (2L, good),                        // exact dup of 1 -> dropped
      (3L, "too short"),                 // fails word count + stop: score 3
      (4L, good + " extended further")   // pass, winner (27 tokens)
    ).toDF("doc_id", "text")
    // winners: doc 1 (25 tok), doc 4 (27 tok); tot = 52, budget 1/2=26:
    // doc 1 kept (0*2 < 52), doc 4 cut (25*2 = 50 < 52 -> kept too!)
    // boundary rule keeps the budget-crossing doc: both kept.
    val got = Curation.curationPipeline(docs, 20, 5, 1L, 2L)
      .select($"doc_id", $"n_tok", $"kept")
      .as[(Long, Long, Int)].collect().sortBy(_._1).toList
    assert(got == List((1L, 25L, 1), (4L, 27L, 1)))
    // tighter budget 1/4 (13 tokens): doc 1 crosses the boundary and is
    // kept; doc 4 starts past it (25*4 = 100 >= 52) and is cut
    val tight = Curation.curationPipeline(docs, 20, 5, 1L, 4L)
      .select($"doc_id", $"kept")
      .as[(Long, Int)].collect().sortBy(_._1).toList
    assert(tight == List((1L, 1), (4L, 0)))
  }

  test("sourceQuota caps each stratum in content-hash order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s1", "alpha"), (2L, "s1", "bravo"), (3L, "s1", "charlie"),
      (4L, "s1", "delta"), (5L, "s2", "echo"), (6L, "s2", "foxtrot"))
      .toDF("doc_id", "source", "text")
    // expected: per source, doc ids ordered by md5(text) hex, first 2 win
    val expect = Seq(
      ("s1", Seq((1L, "alpha"), (2L, "bravo"), (3L, "charlie"),
        (4L, "delta"))),
      ("s2", Seq((5L, "echo"), (6L, "foxtrot"))))
      .flatMap { case (src, ds) =>
        ds.sortBy { case (id, t) => (md5hex(t), id) }.take(2).zipWithIndex
          .map { case ((id, _), i) => (src, (i + 1).toLong, id) }
      }.toList
    val got = Curation.sourceQuota(docs, 2)
      .orderBy($"stratum", $"rk")
      .as[(String, Long, Long)].collect().toList
    assert(got == expect)
  }

  test("temperatureSample: rounded micro-weights then integer thresholds") {
    import spark.implicits._
    // strata: A = ids 1,2 with 4 tokens each (src_tok 8); B = id 3 with
    // 2 tokens. tot = 10, alpha = 0.5, budget 1/2. Replay the arithmetic
    // independently: one rounded micro-weight per stratum, then integer
    // target/threshold, then per-doc hash keeps.
    val docs = Seq(
      (1L, "A", "w w w w"), (2L, "A", "w w w w"), (3L, "B", "w w"))
      .toDF("doc_id", "source", "text")
    val srcTok = Map("A" -> 8L, "B" -> 2L)
    val tot = 10L
    val w = srcTok.map { case (s, st) =>
      s -> BigDecimal(math.pow(st.toDouble / tot, 0.5) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val wSum = w.values.sum
    def thr(s: String) =
      ((tot * 1L * w(s)) / (2L * wSum)) * 4294967296L / srcTok(s)
    val members = Map("A" -> Seq(1L, 2L), "B" -> Seq(3L))
    val tokOf = Map(1L -> 4L, 2L -> 4L, 3L -> 2L)
    val expected = members.map { case (s, ids) =>
      val kept = ids.filter(hash32(_) < thr(s))
      (s, ids.size.toLong, kept.size.toLong, kept.map(tokOf).sum)
    }.toList.sortBy(_._1)
    val got = Curation.temperatureSample(docs, 0.5, 1L, 2L)
      .orderBy($"stratum")
      .as[(String, Long, Long, Long)].collect().toList
    assert(got == expected)
  }

  test("stratifiedSample buckets on thresholds and replays hash keeps") {
    import spark.implicits._
    // strata: size < 5 -> 'a' at 1/2, else 'b' at 1/4. Sizes 1..10 over
    // ids 1..10: ids 1-4 in 'a', 5-10 in 'b'. Keep iff h < thr.
    val docs = (1L to 10L).map(i => (i, i)).toDF("doc_id", "n_chars")
    def kept(ids: Seq[Long], thr: Long) = ids.filter(hash32(_) < thr)
    val aKeep = kept(1L to 4L, 1L << 31)
    val bKeep = kept(5L to 10L, 1L << 30)
    val got = Curation.stratifiedSample(docs,
        Seq(("a", 5L, 1L, 2L)), "b", 1L, 4L)
      .orderBy($"stratum")
      .as[(String, Long, Long, Long)].collect().toList
    assert(got == List(
      ("a", 4L, aKeep.size.toLong, aKeep.sum),
      ("b", 6L, bKeep.size.toLong, bKeep.sum)))
  }
}
