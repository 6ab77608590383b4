package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weak-supervision and label-quality operators — the "where do the
  * labels come from and can we trust them" layer of a training-data
  * platform (Ratner et al., Snorkel, VLDB 2018): rule-based labeling
  * functions are voted into a consensus label, labeler pairs are
  * audited for chance-corrected agreement, and any scalar quality
  * score is evaluated against a reference label with an exact AUC and
  * a calibration table. Everything is exact integer (counts, ppm via
  * DECIMAL(38,0) numerators) so the DuckDB oracle replays every row —
  * no resolution model or EM fitting, which would be float-iterative;
  * majority vote IS Snorkel's documented cold-start baseline.
  *
  * Scale shape: every operator is one scan-shaped conditional
  * aggregate (map-side partials, single-row or bins-sized output);
  * [[aucExact]] adds the [[Behavior.mannWhitneyU]] distinct-value
  * cumsum, bounded by the score's value range, not by rows. */
object Labeling {

  private def dec(c: Column) = c.cast("decimal(38,0)")

  /** MAJORITY VOTE over binary labeling functions + per-LF audit:
    * each named LF votes 0/1 per row; the consensus label is the
    * strict majority (NULL = abstain on an exact tie, only possible
    * for an even LF count). Returns one row per LF — (lf, n,
    * n_covered, n_agree, agree_ppm, pos_ppm): how often the LF fires
    * (pos_ppm of n), how much of the corpus reached a consensus
    * (n_covered), and how often the LF agrees with it (agree_ppm of
    * n_covered) — the Snorkel-style "which rule is the outlier"
    * readout. Exact integer ppm, DECIMAL numerators.
    *
    * Scale shape: the vote is a row-local sum of the LF columns (no
    * shuffle), then ONE conditional aggregate with 4·|LFs| partials;
    * output is |LFs| rows unpivoted from the single aggregate row. */
  def majorityVote(df: DataFrame, lfs: Seq[(String, Column)])
      : DataFrame = majorityVoteFromState(labelState(df, lfs))

  /** PER-LF SUFFICIENT STATISTICS of the majority vote — the
    * MERGEABLE state behind [[majorityVote]] and [[weightedVote]]'s
    * pass 1: one row per LF with exact counts (lf, n, n_covered,
    * n_pos, n_agree). The consensus vote is ROW-LOCAL (a row's label
    * depends only on that row's LF columns), so per-batch states sum
    * exactly ([[mergeLabelState]]) and split-batch maintenance equals
    * a full-log rebuild — the property that makes the always-on
    * [[graft.streaming.LabelStateStream]] form exact, not a sketch.
    *
    * Scale shape: the vote is a row-local sum of the LF columns (no
    * shuffle), then ONE conditional aggregate with 4·|LFs| partials;
    * output is |LFs| rows unpivoted from the single aggregate row. */
  def labelState(df: DataFrame, lfs: Seq[(String, Column)])
      : DataFrame = {
    require(lfs.nonEmpty, "at least one labeling function")
    require(lfs.map(_._1).distinct.size == lfs.size,
      s"duplicate LF names in ${lfs.map(_._1)}")
    lfs.foreach { case (n, _) =>
      require(n.matches("[A-Za-z0-9_]+"),
        s"LF name '$n' must be [A-Za-z0-9_]+ (it becomes a column)") }
    val k = lfs.size
    val voted = df
      .select(lfs.map { case (n, c) =>
        c.cast("int").as(s"lf_$n") }: _*)
      .withColumn("ones",
        lfs.map { case (n, _) => col(s"lf_$n") }.reduce(_ + _))
      .withColumn("vote",
        when(lit(2) * col("ones") > k, 1)
          .when(lit(2) * col("ones") < k, 0)
          .otherwise(lit(null).cast("int")))
    val aggs = Seq(count(lit(1)).as("n"),
      count(col("vote")).as("n_covered")) ++
      lfs.flatMap { case (n, _) => Seq(
        count(when(col(s"lf_$n") === 1, 1)).as(s"pos_$n"),
        count(when(col(s"lf_$n") === col("vote"), 1)).as(s"agree_$n"))
      }
    val one = voted.agg(aggs.head, aggs.tail: _*)
    val stacked = lfs.map { case (n, _) =>
      s"'$n', pos_$n, agree_$n" }.mkString(", ")
    one.selectExpr("n", "n_covered",
        s"stack($k, $stacked) as (lf, n_pos, n_agree)")
      .select(col("lf"), col("n"), col("n_covered"), col("n_pos"),
        col("n_agree"))
  }

  /** Exact merge of two [[labelState]] frames — all four counts add;
    * split-batch merge == full rebuild (spec- and property-pinned). */
  def mergeLabelState(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("lf"))
      .agg(sum(col("n")).as("n"), sum(col("n_covered")).as("n_covered"),
        sum(col("n_pos")).as("n_pos"), sum(col("n_agree")).as("n_agree"))

  /** The [[majorityVote]] audit readout over a persisted
    * [[labelState]] frame — value-identical to the full-log form
    * (majorityVote IS this readout over a freshly aggregated state);
    * the always-on pipeline reads the maintained state, never the
    * label log. Tiny-frame algebra: |LFs| rows in, |LFs| rows out. */
  def majorityVoteFromState(state: DataFrame): DataFrame =
    state.select(col("lf"), col("n"), col("n_covered"), col("n_agree"),
      expr("case when n_covered > 0 then" +
        " cast(cast(n_agree as decimal(38,0)) * 1000000" +
        " div n_covered as bigint) end").as("agree_ppm"),
      expr("cast(cast(n_pos as decimal(38,0)) * 1000000 div n" +
        " as bigint)").as("pos_ppm"))

  /** PAIRWISE LF CONFLICT MATRIX — the Snorkel `LFAnalysis`-style
    * "which rules fight each other" diagnostic that [[majorityVote]]'s
    * per-LF-vs-consensus audit cannot show (two LFs can each agree
    * with the consensus 70% of the time yet conflict with EACH OTHER
    * constantly on the minority rows): one row per unordered LF pair
    * (lf_a < lf_b in the given order) with exact counts — n (total
    * rows), n_voted (BOTH voted, i.e. both non-NULL: a NULL vote is
    * an abstention and abstaining is not conflicting — the Snorkel
    * LFAnalysis convention), n_agree (both voted, equal), n_conflict
    * (= n_voted − n_agree), n_both_pos (both fire) — and agree_ppm
    * over the VOTED rows (NULL when the pair never co-votes). Read beside [[cohenKappa]]: this is the
    * raw-count matrix over ALL pairs in one pass; kappa is the
    * chance-corrected deep-dive on a pair the matrix flags.
    *
    * Scale shape: ONE conditional aggregate over the scan with
    * 3·C(k,2) count partials (map-side combined), output C(k,2) rows
    * unpivoted from the single aggregate row — no join, no shuffle
    * beyond the aggregate. */
  def conflictMatrix(df: DataFrame, lfs: Seq[(String, Column)])
      : DataFrame = {
    require(lfs.size >= 2, s"need >= 2 labeling functions, got ${lfs.size}")
    require(lfs.map(_._1).distinct.size == lfs.size,
      s"duplicate LF names in ${lfs.map(_._1)}")
    lfs.foreach { case (n, _) =>
      require(n.matches("[A-Za-z0-9_]+"),
        s"LF name '$n' must be [A-Za-z0-9_]+ (it becomes a column)") }
    // positional column aliases: NAME-based ones (agree_${a}_${b})
    // would collide for underscore-bearing names ('a','b_c' vs 'a_b','c')
    val cast = df.select(lfs.zipWithIndex.map { case ((_, c), i) =>
      c.cast("int").as(s"lf_$i") }: _*)
    val pairs = for {
      i <- lfs.indices; j <- (i + 1) until lfs.size
    } yield (i, j)
    val aggs = count(lit(1)).as("n") +: pairs.flatMap { case (i, j) =>
      Seq(count(when(col(s"lf_$i").isNotNull &&
            col(s"lf_$j").isNotNull, 1)).as(s"voted_${i}_$j"),
        count(when(col(s"lf_$i") === col(s"lf_$j"), 1))
          .as(s"agree_${i}_$j"),
        count(when(col(s"lf_$i") === 1 && col(s"lf_$j") === 1, 1))
          .as(s"both_${i}_$j"))
    }
    val one = cast.agg(aggs.head, aggs.tail: _*)
    val stacked = pairs.map { case (i, j) =>
      s"'${lfs(i)._1}', '${lfs(j)._1}', voted_${i}_$j," +
        s" agree_${i}_$j, both_${i}_$j" }.mkString(", ")
    one.selectExpr("n", s"stack(${pairs.size}, $stacked)" +
        " as (lf_a, lf_b, n_voted, n_agree, n_both_pos)")
      .select(col("lf_a"), col("lf_b"), col("n"), col("n_voted"),
        col("n_agree"),
        (col("n_voted") - col("n_agree")).as("n_conflict"),
        col("n_both_pos"),
        expr("case when n_voted > 0 then" +
          " cast(cast(n_agree as decimal(38,0)) * 1000000 div n_voted" +
          " as bigint) end").as("agree_ppm"))
  }

  /** COHEN'S KAPPA between two binary labelers (Cohen 1960) — the
    * chance-corrected agreement audit for a labeler pair: κ =
    * (p_o − p_e)/(1 − p_e), kept EXACT by clearing denominators:
    * κ_ppm = ((n00+n11)·n − (r0·c0 + r1·c1)) · 10⁶ div
    * (n² − (r0·c0 + r1·c1)) with every product DECIMAL(38,0) — no
    * float probability anywhere. NULL when chance agreement is total
    * (p_e = 1: both labelers constant — κ undefined). One row:
    * (n, n00, n01, n10, n11, kappa_ppm); n01 counts a=0, b=1.
    *
    * Scale shape: ONE conditional aggregate over the scan — four
    * confusion counts with map-side partials, 1-row output. */
  def cohenKappa(df: DataFrame, a: Column, b: Column): DataFrame = {
    val cells = df
      .select(a.cast("int").as("a"), b.cast("int").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
      .agg(count(lit(1)).as("n"),
        count(when(col("a") === 0 && col("b") === 0, 1)).as("n00"),
        count(when(col("a") === 0 && col("b") === 1, 1)).as("n01"),
        count(when(col("a") === 1 && col("b") === 0, 1)).as("n10"),
        count(when(col("a") === 1 && col("b") === 1, 1)).as("n11"))
    cells.select(col("n"), col("n00"), col("n01"), col("n10"),
        col("n11"),
        expr("case when cast(n as decimal(38,0)) * n -" +
          " (cast(n00 + n01 as decimal(38,0)) * (n00 + n10)" +
          "  + cast(n10 + n11 as decimal(38,0)) * (n01 + n11)) <> 0" +
          " then cast((cast(n00 + n11 as decimal(38,0)) * n -" +
          " (cast(n00 + n01 as decimal(38,0)) * (n00 + n10)" +
          "  + cast(n10 + n11 as decimal(38,0)) * (n01 + n11)))" +
          " * 1000000 div (cast(n as decimal(38,0)) * n -" +
          " (cast(n00 + n01 as decimal(38,0)) * (n00 + n10)" +
          "  + cast(n10 + n11 as decimal(38,0)) * (n01 + n11)))" +
          " as bigint) end").as("kappa_ppm"))
  }

  /** MATTHEWS CORRELATION COEFFICIENT (Matthews 1975) between a
    * binary predictor and the truth label — the single-number
    * confusion summary that, unlike accuracy or F1, stays honest
    * under class imbalance (it is the Pearson φ of the 2×2 table):
    *   MCC = (tp·tn − fp·fn) / √((tp+fp)(tp+fn)(tn+fp)(tn+fn)).
    * Numerator and the four marginal products are exact
    * DECIMAL(38,0); the one fixed-order float is the final
    * num / √den, rounded to integer micro (operands mirrored in the
    * oracle — the [[cohenKappa]] convention with one √). NULL when
    * any marginal is empty (a constant predictor or label — MCC
    * undefined). One row: (n, tp, fp, fn, tn, mcc_micro).
    *
    * Scale shape: ONE conditional aggregate over the scan — four
    * confusion counts with map-side partials, 1-row output. */
  def matthewsCorrelation(df: DataFrame, pred: Column,
      label: Column): DataFrame = {
    val cells = df
      .select(pred.cast("int").as("p"), label.cast("int").as("y"))
      .filter(col("p").isNotNull && col("y").isNotNull)
      .agg(count(lit(1)).as("n"),
        count(when(col("p") === 1 && col("y") === 1, 1)).as("tp"),
        count(when(col("p") === 1 && col("y") === 0, 1)).as("fp"),
        count(when(col("p") === 0 && col("y") === 1, 1)).as("fn"),
        count(when(col("p") === 0 && col("y") === 0, 1)).as("tn"))
    cells.select(col("n"), col("tp"), col("fp"), col("fn"), col("tn"),
      expr("case when tp + fp > 0 and tp + fn > 0 and tn + fp > 0" +
        " and tn + fn > 0 then cast(round(cast(" +
        " cast(tp as decimal(38,0)) * tn -" +
        " cast(fp as decimal(38,0)) * fn as double) / sqrt(cast(" +
        " cast(tp + fp as decimal(38,0)) * (tp + fn) * (tn + fp)" +
        " * (tn + fn) as double)) * 1000000, 0) as bigint) end")
        .as("mcc_micro"))
  }

  /** YOUDEN'S J OPTIMAL THRESHOLD (Youden 1950) — the operating
    * point a deployed binary scorer should run at when false
    * positives and false negatives cost the same: the threshold
    * maximizing J = TPR − FPR over [[rocPoints]]'s curve. J is
    * evaluated on the emitted integer-ppm rates (the q319
    * statistic-over-a-rounded-statistic convention — differences
    * below 1 ppm are below reporting precision), maximum ties break
    * to the LOWEST threshold (a total order both engines replay).
    * One row: (threshold, tp, fp, tpr_ppm, fpr_ppm, j_ppm).
    *
    * Scale shape: [[rocPoints]]'s two-level cumsum over the
    * distinct-score frame + one TakeOrderedAndProject(1). */
  def youdenThreshold(df: DataFrame, score: Column,
      label: Column): DataFrame =
    rocPoints(df, score, label)
      .select(col("threshold"), col("tp"), col("fp"),
        col("tpr_ppm"), col("fpr_ppm"),
        (col("tpr_ppm") - col("fpr_ppm")).as("j_ppm"))
      .orderBy(col("j_ppm").desc, col("threshold")).limit(1)

  /** ACCURACY-WEIGHTED REVOTE — the second rung of the Snorkel
    * ladder after [[majorityVote]]: pass 1 computes each LF's
    * agreement with the majority consensus (exact ppm, the
    * [[majorityVote]] audit); pass 2 revotes every row with those
    * agreement rates as weights — label 1 when Σ w_i·lf_i >
    * (Σ w_i)/2, abstain on the exact tie — so a rule that usually
    * disagrees with its peers loses influence without being dropped.
    * Deterministic and exact: weights are integer ppm, the revote
    * compares 2·Σ w_i·lf_i against Σ w_i in integers (no halves).
    * Returns one row per LF mirroring the [[majorityVote]] audit
    * against the REVOTED label, plus a `w_ppm` column carrying the
    * weight each LF voted with — rows where the two consensus labels
    * differ are exactly where the weighting mattered.
    *
    * Scale shape: two scan passes (pass 1 is [[majorityVote]]'s
    * single aggregate; its |LFs|-row result collects to the driver —
    * broadcast-state regime) + one weighted-vote aggregate; no
    * shuffle beyond the aggregates. */
  def weightedVote(df: DataFrame, lfs: Seq[(String, Column)])
      : DataFrame = weightedVoteFromState(df, lfs, labelState(df, lfs))

  /** [[weightedVote]] with pass 1 read from a persisted
    * [[labelState]] frame instead of re-aggregating the label log —
    * the weights come from the streaming-maintained state
    * ([[graft.streaming.LabelStateStream]]), so only the pass-2
    * revote scans `df`. Value-identical to [[weightedVote]] when the
    * state covers exactly `df` (spec-pinned); in the always-on form
    * the state covers MORE log than any one revote slice — that is
    * the point: stable accumulated weights applied to fresh rows. */
  def weightedVoteFromState(df: DataFrame, lfs: Seq[(String, Column)],
      state: DataFrame): DataFrame = {
    val audit = majorityVoteFromState(state)
      .select(col("lf"), col("agree_ppm"))
      .collect().map { r =>
        require(!r.isNullAt(1), s"LF '${r.getString(0)}': pass-1 " +
          "consensus never decided (all ties) — weights undefined")
        r.getString(0) -> r.getLong(1)
      }.toMap
    lfs.foreach { case (n, _) =>
      require(audit.contains(n),
        s"LF '$n' missing from the label state (state has " +
          s"${audit.keys.toSeq.sorted.mkString(", ")})") }
    val k = lfs.size
    val weights = lfs.map { case (n, _) => audit(n) }
    val voted = df
      .select(lfs.map { case (n, c) => c.cast("int").as(s"lf_$n") }: _*)
      .withColumn("score",
        lfs.zip(weights).map { case ((n, _), w) =>
          col(s"lf_$n").cast("long") * w }.reduce(_ + _))
      .withColumn("vote",
        when(lit(2) * col("score") > weights.sum, 1)
          .when(lit(2) * col("score") < weights.sum, 0)
          .otherwise(lit(null).cast("int")))
    val aggs = Seq(count(lit(1)).as("n"),
      count(col("vote")).as("n_covered")) ++
      lfs.flatMap { case (n, _) => Seq(
        count(when(col(s"lf_$n") === 1, 1)).as(s"pos_$n"),
        count(when(col(s"lf_$n") === col("vote"), 1)).as(s"agree_$n"))
      }
    val one = voted.agg(aggs.head, aggs.tail: _*)
    val stacked = lfs.zip(weights).map { case ((n, _), w) =>
      s"'$n', ${w}L, pos_$n, agree_$n" }.mkString(", ")
    one.selectExpr("n", "n_covered",
        s"stack($k, $stacked) as (lf, w_ppm, n_pos, n_agree)")
      .select(col("lf"), col("w_ppm"), col("n"), col("n_covered"),
        col("n_agree"),
        expr("case when n_covered > 0 then" +
          " cast(cast(n_agree as decimal(38,0)) * 1000000" +
          " div n_covered as bigint) end").as("agree_ppm"),
        expr("cast(cast(n_pos as decimal(38,0)) * 1000000 div n" +
          " as bigint)").as("pos_ppm"))
  }

  /** McNEMAR'S TEST between two binary labelers on the same rows
    * (McNemar 1947) — the paired-disagreement SIGNIFICANCE companion
    * of [[cohenKappa]]'s agreement MAGNITUDE: only the discordant
    * cells carry signal (n01: a=0∧b=1, n10: a=1∧b=0), and the test
    * statistic (n01 − n10)²/(n01 + n10) is a ratio of exact integers
    * — emitted in exact ppm (DECIMAL numerator), NULL when the
    * labelers never disagree (statistic undefined, nothing to test).
    * One row: (n, n01, n10, chi2_ppm).
    *
    * Scale shape: ONE conditional aggregate over the scan, 1-row
    * output. */
  def mcnemar(df: DataFrame, a: Column, b: Column): DataFrame =
    df.select(a.cast("int").as("a"), b.cast("int").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
      .agg(count(lit(1)).as("n"),
        count(when(col("a") === 0 && col("b") === 1, 1)).as("n01"),
        count(when(col("a") === 1 && col("b") === 0, 1)).as("n10"))
      .select(col("n"), col("n01"), col("n10"),
        expr("case when n01 + n10 > 0 then" +
          " cast(cast(n01 - n10 as decimal(38,0)) * (n01 - n10)" +
          " * 1000000 div (n01 + n10) as bigint) end").as("chi2_ppm"))

  /** COCHRAN'S Q over k ≥ 2 binary raters (Cochran 1950) — the
    * k-rater SIGNIFICANCE companion of [[fleissKappa]]'s agreement
    * magnitude ("do the raters fire at different rates at all"):
    * with per-subject success counts L_i and per-rater totals G_j,
    * Q = (k(k−1)·ΣG_j² − (k−1)·T1²) / (k·T1 − T2) for T1 = ΣL_i,
    * T2 = ΣL_i² — every term an exact DECIMAL(38,0) integer, Q in
    * exact ppm; NULL when k·T1 = T2 (every subject unanimous —
    * no within-subject variance to test). One row:
    * (n, k, t1, chi2_ppm); df for the caller's p-value is k−1. Rows
    * with any NULL rater are excluded (complete panels, the
    * [[fleissKappa]] rule).
    *
    * Scale shape: ONE conditional aggregate (k + 3 counters) over
    * the scan, 1-row output. */
  def cochranQ(df: DataFrame, raters: Seq[Column]): DataFrame = {
    require(raters.size >= 2, s"need >= 2 raters, got ${raters.size}")
    val k = raters.size
    val cast = raters.map(_.cast("int"))
    val li = cast.reduce(_ + _)
    val base = df
      .select((li.as("li") +: cast.zipWithIndex.map { case (c, i) =>
        c.as(s"r$i") }): _*)
      .filter(col("li").isNotNull)
    val aggs = Seq(count(lit(1)).as("n"),
      sum(dec(col("li"))).as("t1"),
      sum(dec(col("li")) * col("li")).as("t2")) ++
      (0 until k).map(i => sum(dec(col(s"r$i"))).as(s"g$i"))
    val sumG2 = (0 until k).map(i => s"g$i * g$i").mkString(" + ")
    base.agg(aggs.head, aggs.tail: _*)
      .select(col("n"), lit(k).as("k"),
        expr("cast(t1 as bigint)").as("t1"),
        expr(s"case when $k * t1 - t2 <> 0 then" +
          s" cast(($k * ($k - 1) * ($sumG2) - ($k - 1) * t1 * t1)" +
          s" * 1000000 div ($k * t1 - t2) as bigint) end")
          .as("chi2_ppm"))
  }

  /** EXACT AUC of a scalar score against a binary label — the
    * probability a random positive outscores a random negative (ties
    * half credit), which is exactly U⁺/(n⁺·n⁻) (Mann–Whitney; Hanley
    * & McNeil 1982). Stays EXACT INTEGER via the [[Behavior
    * .mannWhitneyU]] DOUBLED-midrank device (2·mid = 2p + c + 1 per
    * distinct score value): auc_ppm = (Σ⁺2·mid − n⁺·(n⁺+1)) · 10⁶
    * div (2·n⁺·n⁻). One row: (n_pos, n_neg, auc_ppm). The
    * threshold-free twin of [[calibrationBins]]' threshold-table
    * view; both engines agree to the ppm.
    *
    * Scale shape: per-VALUE count frame + the distinct-value midrank
    * cumsum through [[Curation.withGlobalCumsums]]' two-level plan
    * (distinct scores are unbounded in principle — no unpartitioned
    * window), one final 1-row aggregate. */
  def aucExact(df: DataFrame, score: Column, label: Column)
      : DataFrame = {
    val base = df
      .select(score.cast("long").as("s"), label.cast("int").as("y"))
      .filter(col("s").isNotNull && col("y").isNotNull)
    val vals = base.groupBy(col("s"))
      .agg(count(when(col("y") === 1, 1)).as("cp"),
        count(when(col("y") === 0, 1)).as("cn"))
    // distinct-score cardinality is unbounded in principle — the
    // midrank cumsum goes through the two-level plan, never an
    // unpartitioned window (the Behavior.mannWhitneyU contract)
    val ranked = Curation.withGlobalCumsums(vals, Seq(col("s")),
        Seq("t" -> (col("cp") + col("cn"))))
      .withColumn("two_mid",
        lit(2) * (col("cum_t") - (col("cp") + col("cn")))
          + col("cp") + col("cn") + lit(1))
    ranked.agg(sum(col("cp")).as("n_pos"), sum(col("cn")).as("n_neg"),
        sum(dec(col("cp")) * col("two_mid")).as("rp2"))
      .select(col("n_pos"), col("n_neg"),
        expr("cast((rp2 - cast(n_pos as decimal(38,0)) * (n_pos + 1))" +
          " * 1000000 div (2 * cast(n_pos as decimal(38,0)) * n_neg)" +
          " as bigint)").as("auc_ppm"))
  }

  /** ROC OPERATING POINTS of a scalar score against a binary label —
    * one row per DISTINCT score value v, read as the threshold
    * "predict positive when score ≥ v": exact TP/FP counts plus
    * tpr/fpr/precision in exact ppm (DECIMAL numerators). The curve
    * behind [[aucExact]]'s single number — pick a threshold by
    * reading the row, not by re-scoring; the (tpr, fpr) staircase
    * integrates to the same AUC (ties give [[aucExact]] half
    * credit). Thresholds ascend, so tpr/fpr DESCEND down the output.
    *
    * Scale shape: the same per-VALUE count frame as [[aucExact]],
    * with both running counts AND both grand totals from ONE
    * [[Curation.withGlobalCumsums]] two-level pass (`cum_p`/`cum_n`
    * + `tot_p`/`tot_n`) — no unpartitioned window anywhere; output
    * |distinct values| rows. */
  def rocPoints(df: DataFrame, score: Column, label: Column)
      : DataFrame = {
    val base = df
      .select(score.cast("long").as("s"), label.cast("int").as("y"))
      .filter(col("s").isNotNull && col("y").isNotNull)
    val vals = base.groupBy(col("s"))
      .agg(count(when(col("y") === 1, 1)).as("cp"),
        count(when(col("y") === 0, 1)).as("cn"))
    // both running counts + both grand totals in ONE two-level pass
    // (the [[aucExact]] no-unpartitioned-window contract)
    Curation.withGlobalCumsums(vals, Seq(col("s")),
        Seq("p" -> col("cp"), "n" -> col("cn")))
      .withColumn("n_pos", col("tot_p"))
      .withColumn("n_neg", col("tot_n"))
      // predict 1 when s >= v: positives/negatives at or above v
      .select(col("s").as("threshold"),
        (col("n_pos") - col("cum_p") + col("cp")).as("tp"),
        (col("n_neg") - col("cum_n") + col("cn")).as("fp"),
        col("n_pos"), col("n_neg"))
      .select(col("threshold"), col("tp"), col("fp"),
        expr("cast(cast(tp as decimal(38,0)) * 1000000 div n_pos" +
          " as bigint)").as("tpr_ppm"),
        expr("cast(cast(fp as decimal(38,0)) * 1000000 div n_neg" +
          " as bigint)").as("fpr_ppm"),
        expr("cast(cast(tp as decimal(38,0)) * 1000000 div (tp + fp)" +
          " as bigint)").as("precision_ppm"))
  }

  /** AVERAGE PRECISION (PR-AUC, the step-wise interpolation at
    * distinct thresholds) — [[aucExact]]'s imbalance-honest
    * companion (round 16): ROC-AUC stays near chance-insensitive to
    * prevalence, but when positives are rare the number a retrieval
    * or labeling pass should report is area under the
    * precision-recall curve. Processing DISTINCT scores descending,
    * after including score group i (cp_i positives, cn_i negatives):
    * tp_i / fp_i are the running sums, precision_i = tp_i/(tp_i+fp_i),
    * and AP = Σ_i cp_i · precision_i / n_pos — ties contribute their
    * whole group at the group's own precision (the deterministic
    * tie convention; no within-group order exists). Exact integers:
    * contrib_i = cp_i · (tp_i·10⁶ div (tp_i + fp_i)) in
    * DECIMAL(38,0), ap_ppm = Σ contrib div n_pos — truncating divs
    * mirrored verbatim in the oracle. One row: (n_pos, n_neg,
    * ap_ppm); NULL ap_ppm when no positives exist.
    *
    * Scale shape: one per-VALUE count aggregate, the running sums
    * through [[graft.operators.Curation.withGlobalCumsums]]' two-level
    * pass on the DESCENDING order (distinct scores are unbounded in
    * principle — never an unpartitioned window), one 1-row fold. */
  def averagePrecision(df: DataFrame, score: Column, label: Column)
      : DataFrame = {
    val base = df
      .select(score.cast("long").as("s"), label.cast("int").as("y"))
      .filter(col("s").isNotNull && col("y").isNotNull)
    val vals = base.groupBy(col("s"))
      .agg(count(when(col("y") === 1, 1)).as("cp"),
        count(when(col("y") === 0, 1)).as("cn"))
    Curation.withGlobalCumsums(vals, Seq(col("s").desc),
        Seq("p" -> col("cp"), "n" -> col("cn")))
      .select(col("cp"), col("cum_p"), col("cum_n"), col("tot_p"),
        col("tot_n"))
      .withColumn("contrib", dec(col("cp")) *
        expr("cum_p * 1000000 div (cum_p + cum_n)"))
      .agg(max(col("tot_p")).as("n_pos"), max(col("tot_n")).as("n_neg"),
        sum(col("contrib")).as("csum"))
      .select(col("n_pos"), col("n_neg"),
        expr("cast(csum div nullif(n_pos, 0) as bigint)").as("ap_ppm"))
  }

  /** INFORMATION GAIN of a binary split against a binary label
    * (Quinlan 1986 — the decision-stump score): IG = H(label) −
    * Σ_side (n_side/N)·H(label | side), in nats — the
    * labeling-function quality number that asks "how many bits (nats)
    * does this rule actually buy", complementing accuracy-shaped
    * summaries (MCC q327, AUC q256, Youden q333) with the quantity a
    * tree learner or LF selector optimizes directly. Exact integer
    * cell counts (one conditional aggregate); the entropies use the
    * H = ln n − (Σ_c c·ln c)/n identity (zero cells contribute 0),
    * and the ONE float chain is mirrored operand-for-operand in the
    * oracle, rounded to 6 — each ln drifts ~10⁻¹⁵ and six terms stay
    * ~9 orders below the boundary (the q126 argument). One row:
    * (n, n_left, n_right, info_gain); NULL on an empty input.
    *
    * Scale shape: ONE conditional aggregate over the scan (map-side
    * partials), 1-row algebra. */
  def informationGain(df: DataFrame, split: Column, label: Column)
      : DataFrame = {
    def sl(c: Column) = when(c > 0,
      c.cast("double") * log(c.cast("double"))).otherwise(lit(0.0))
    df.filter(split.isNotNull && label.isNotNull)
      .agg(count(lit(1)).as("n"),
        sum((split && label === 1).cast("int")).as("a1"),
        sum((split && label === 0).cast("int")).as("a0"),
        sum((!split && label === 1).cast("int")).as("b1"),
        sum((!split && label === 0).cast("int")).as("b0"))
      .select(col("n"), (col("a1") + col("a0")).as("nl"),
        (col("b1") + col("b0")).as("nr"),
        col("a1"), col("a0"), col("b1"), col("b0"))
      .select(col("n"), col("nl").as("n_left"), col("nr").as("n_right"),
        when(col("n") > 0, round(
          (log(col("n").cast("double")) -
            (sl(col("a1") + col("b1")) + sl(col("a0") + col("b0"))) /
              col("n")) -
          (when(col("nl") > 0, col("nl").cast("double") *
              (log(col("nl").cast("double")) -
                (sl(col("a1")) + sl(col("a0"))) / col("nl")))
            .otherwise(lit(0.0)) +
           when(col("nr") > 0, col("nr").cast("double") *
              (log(col("nr").cast("double")) -
                (sl(col("b1")) + sl(col("b0"))) / col("nr")))
            .otherwise(lit(0.0))) / col("n"), 6) + lit(0.0))
          .as("info_gain"))
  }

  /** FLEISS' KAPPA over k ≥ 2 binary raters (Fleiss 1971) — the
    * multi-rater generalization of [[cohenKappa]] for the LF panels
    * [[majorityVote]] audits pairwise: with x_i raters voting 1 on
    * subject i, observed agreement P̄ = A/B for the integer sums
    * A = Σ_i (x_i² + (k−x_i)² − k), B = n·k·(k−1), and chance
    * agreement P̄_e = (S1² + S0²)/(nk)² for the integer vote totals;
    * clearing denominators gives κ_ppm = (A·E − B·C)·10⁶ div
    * (B·(E − C)) for C = S1² + S0², E = (nk)², every product
    * DECIMAL(38,0) — exact, no float probability (A·E ≤ n³k⁴, so
    * 10⁹ subjects × 10 raters stays under 38 digits). NULL when
    * E = C (all raters constant: P̄_e = 1). One row: (n, k, a,
    * kappa_ppm) with a = A, the observed-agreement numerator. Rows
    * where any rater abstains (NULL) are excluded — Fleiss assumes
    * complete panels.
    *
    * Scale shape: ONE conditional aggregate over the scan (x is a
    * row-local sum), 1-row output. */
  def fleissKappa(df: DataFrame, raters: Seq[Column]): DataFrame = {
    require(raters.size >= 2, s"need >= 2 raters, got ${raters.size}")
    val k = raters.size
    val x = raters.map(_.cast("int")).reduce(_ + _)
    val agg = df
      .select(x.as("x"))
      .filter(col("x").isNotNull)
      .agg(count(lit(1)).as("n"),
        sum(dec(col("x") * col("x")
          + (lit(k) - col("x")) * (lit(k) - col("x")) - lit(k)))
          .as("a"),
        sum(dec(col("x"))).as("s1"))
    agg.select(col("n"), lit(k).as("k"), col("a"),
        (col("s1") * col("s1")
          + (dec(col("n")) * k - col("s1"))
            * (dec(col("n")) * k - col("s1"))).as("c_num"))
      .select(col("n"), col("k"),
        expr("cast(a as bigint)").as("a"),
        expr(
          s"case when cast(n as decimal(38,0)) * n * $k * $k - c_num" +
            " <> 0 then" +
            s" cast((a * cast(n as decimal(38,0)) * n * $k * $k" +
            s" - cast(n as decimal(38,0)) * $k * ($k - 1) * c_num)" +
            " * 1000000" +
            s" div (cast(n as decimal(38,0)) * $k * ($k - 1)" +
            s" * (cast(n as decimal(38,0)) * n * $k * $k - c_num))" +
            " as bigint) end").as("kappa_ppm"))
  }

  /** DAWID–SKENE, binary form — the crowdsourcing-standard label
    * model (Dawid & Skene 1979; the confusion-matrix rung above
    * [[weightedVote]]'s single accuracy number): each rater j gets a
    * SENSITIVITY a_j = P(vote 1 | true 1) and SPECIFICITY
    * b_j = P(vote 0 | true 0), estimated jointly with the class prior
    * π by EM over the unlabeled votes. FIXED `iters` iterations,
    * ALL-INTEGER ppm:
    *
    *   E (per unit): r_u = w₁·10⁶ div (w₁ + w₀),
    *     w₁ = π·Π_j f₁ⱼ,  f₁ⱼ = vⱼ NULL ? 10⁶ : vⱼ=1 ? a_j : 10⁶−a_j
    *     w₀ = (10⁶−π)·Π_j f₀ⱼ, f₀ⱼ = vⱼ NULL ? 10⁶ : vⱼ=1 ? 10⁶−b_j : b_j
    *   M: a_j = Σ_{vⱼ=1} r_u · 10⁶ div Σ_{vⱼ≠NULL} r_u   (clamped)
    *      b_j = Σ_{vⱼ=0} (10⁶−r_u) · 10⁶ div Σ_{vⱼ≠NULL} (10⁶−r_u)
    *      π   = Σ r_u div n_units
    *
    * Abstentions (NULL votes) contribute the NEUTRAL factor 10⁶, so
    * both weights keep the same 10⁶·(10⁶)ᵏ scale and the
    * responsibility stays a clean ratio — the model Dawid–Skene's
    * missing-at-random reading implies. Every division truncates on
    * non-negative operands; every updated parameter clamps to
    * [1, 10⁶−1] ppm (the PSI rule — a pinned 0/1 would zero a weight
    * product). Init π⁰ = 500000, a⁰ = b⁰ = 700000 (better-than-chance
    * raters — the standard symmetric start; EM cannot break the
    * label-swap symmetry from a perfectly uninformative start). A
    * rater with zero responsibility mass in an iteration keeps its
    * previous estimate (the EM fixed-point reading of an empty
    * update). One row: (n_units, pi_ppm, a0..a{k−1}_ppm, b0.._ppm);
    * NULL parameters when no unit carries a vote at all.
    *
    * Scale shape: the units frame (one int column per rater) is the
    * only data-sized object; each iteration is one map-only E
    * projection (parameters are 2k+1 ppm literals — bounded driver
    * state, the refinement-loop convention) into ONE conditional M
    * aggregate (map-side combined) — iters jobs, no key shuffle at
    * all. */
  /** The E-step responsibility expression for the CURRENT parameter
    * literals — shared by the fit loop and the posterior projection. */
  private def dsRespExpr(k: Int, pi: Long, a: Array[Long],
      b: Array[Long]): String = {
    def f(j: Int, cls: Int) =
      if (cls == 1)
        s"(case when v$j is null then 1000000L when v$j = 1 " +
          s"then ${a(j)}L else ${1000000L - a(j)}L end)"
      else
        s"(case when v$j is null then 1000000L when v$j = 1 " +
          s"then ${1000000L - b(j)}L else ${b(j)}L end)"
    val w1 = (s"cast(${pi}L as decimal(38,0))" +:
      (0 until k).map(f(_, 1))).mkString(" * ")
    val w0 = (s"cast(${1000000L - pi}L as decimal(38,0))" +:
      (0 until k).map(f(_, 0))).mkString(" * ")
    s"cast(($w1) * 1000000 div (($w1) + ($w0)) as bigint)"
  }

  /** [[dawidSkene]]'s EM loop over a prepared units frame (columns
    * v0..v{k−1}, possibly extra carried columns) — returns
    * (n_units, pi, a, b, dead). With `wt` set, each row counts as
    * that many IDENTICAL voting units (the [[dsPatternState]] form):
    * every E/M sum multiplies by the integer weight, which is
    * arithmetic-identical to unrolling the rows — same multiset,
    * same parameters, exactly. */
  private def dsFit(units: DataFrame, k: Int, iters: Int,
      wt: Option[String] = None)
      : (Long, Long, Array[Long], Array[Long], Boolean) = {
    var pi = 500000L
    val a = Array.fill(k)(700000L)
    val b = Array.fill(k)(700000L)
    var n = 0L
    var dead = false // no voting unit at all -> NULL parameters
    val w = wt.map(col).getOrElse(lit(1L))
    (1 to iters).foreach { it =>
      if (!dead) {
        val e = units.withColumn("r", expr(dsRespExpr(k, pi, a, b)))
          def dec(s: String) = s"cast($s as decimal(38,0))"
          val aggs = (0 until k).flatMap { j => Seq(
            sum(when(col(s"v$j").isNotNull,
              expr(dec("r")) * w)).as(s"d_a$j"),
            sum(when(col(s"v$j") === 1,
              expr(dec("r")) * w)).as(s"n_a$j"),
            sum(when(col(s"v$j").isNotNull,
              expr(dec("1000000 - r")) * w)).as(s"d_b$j"),
            sum(when(col(s"v$j") === 0,
              expr(dec("1000000 - r")) * w)).as(s"n_b$j"))
          }
          val row = e.agg(coalesce(sum(w), lit(0L)).cast("long").as("n"),
            (sum(expr(dec("r")) * w).as("s_r") +: aggs): _*)
            .collect().head
          n = row.getLong(0)
          if (n == 0) dead = true
          else {
            def clamp(x: BigInt): Long =
              x.max(BigInt(1)).min(BigInt(999999)).toLong
            def big(i: Int): BigInt =
              if (row.isNullAt(i)) BigInt(0)
              else BigInt(row.getDecimal(i).toBigInteger)
            pi = clamp(big(1) / n)
            (0 until k).foreach { j =>
              val base = 2 + j * 4
              val (da, na, db, nb) =
                (big(base), big(base + 1), big(base + 2), big(base + 3))
              if (da > 0) a(j) = clamp(na * 1000000 / da)
              if (db > 0) b(j) = clamp(nb * 1000000 / db)
            }
          }
      }
    }
    (n, pi, a, b, dead)
  }

  def dawidSkene(df: DataFrame, raters: Seq[Column],
      iters: Int = 2): DataFrame = {
    require(raters.size >= 2 && raters.size <= 4,
      s"2..4 raters (weight products must fit DECIMAL(38)), " +
        s"got ${raters.size}")
    require(iters >= 1 && iters <= 3, s"iters=$iters")
    val k = raters.size
    val spark = df.sparkSession
    val units = df
      .select(raters.zipWithIndex.map { case (c, j) =>
        c.cast("int").as(s"v$j") }: _*)
      .filter((0 until k).map(j => col(s"v$j").isNotNull)
        .reduce(_ || _))
      .persist()
    try {
      val (n, pi, a, b, dead) = dsFit(units, k, iters)
      val out = Seq(lit(n).as("n_units")) ++
        Seq(if (dead) lit(null).cast("bigint").as("pi_ppm")
          else lit(pi).as("pi_ppm")) ++
        (0 until k).map(j => if (dead) lit(null).cast("bigint")
          .as(s"a${j}_ppm") else lit(a(j)).as(s"a${j}_ppm")) ++
        (0 until k).map(j => if (dead) lit(null).cast("bigint")
          .as(s"b${j}_ppm") else lit(b(j)).as(s"b${j}_ppm"))
      spark.range(1).select(out: _*)
    } finally units.unpersist(false)
  }

  /** DAWID–SKENE POSTERIOR LABELS — the apply seam over
    * [[dawidSkene]] (the bpeMerges→bpeEncode / isotonic train→apply
    * pattern): fit the model's 2k+1 ppm parameters, then ONE more
    * map-only E projection assigns every voting unit its posterior
    * P(true = 1 | votes) in exact ppm and the MAP label
    * (posterior ≥ 500000). Units where every rater abstains carry no
    * evidence and are omitted (they would all read the prior). The
    * probabilistic consensus [[majorityVote]]'s hard count cannot
    * express: a vote from a high-sensitivity rater moves the
    * posterior more than one from a coin-flipper.
    *
    * Scale shape: the fit's iters bounded-state jobs, then one
    * map-only projection — parameters are literals, the frame is
    * never shuffled (the ORDER BY is presentation). */
  def dawidSkenePosterior(df: DataFrame, unit: Column,
      raters: Seq[Column], iters: Int = 2): DataFrame = {
    require(raters.size >= 2 && raters.size <= 4,
      s"2..4 raters (weight products must fit DECIMAL(38)), " +
        s"got ${raters.size}")
    require(iters >= 1 && iters <= 3, s"iters=$iters")
    val k = raters.size
    val units = df
      .select(unit.as("unit") +: raters.zipWithIndex.map {
        case (c, j) => c.cast("int").as(s"v$j") }: _*)
      .filter((0 until k).map(j => col(s"v$j").isNotNull)
        .reduce(_ || _))
      .persist()
    try {
      val (_, pi, a, b, dead) = dsFit(units, k, iters)
      val scored =
        if (dead) units.filter(lit(false))
        else units
      scored
        .withColumn("posterior_ppm", expr(dsRespExpr(k, pi, a, b)))
        .select(col("unit"), col("posterior_ppm"),
          (col("posterior_ppm") >= 500000L).cast("int").as("label"))
        .orderBy(col("unit"))
    } finally units.unpersist(false)
  }

  /** MULTI-CLASS DAWID–SKENE — the full confusion-matrix EM (Dawid &
    * Skene 1979, §2 general form) that the binary [[dawidSkene]]
    * specializes: each rater j carries a C×C ppm confusion matrix
    * conf_j[c, v] = P(votes v | true class c) and the prior is a
    * C-vector. Same exactness contract as the binary form: class
    * weights are DECIMAL(38,0) products of ppm integers
    * (π_c · Π_j conf_j[c, v_j], abstain = neutral 10⁶ factor, and a
    * vote OUTSIDE 0..C−1 is treated as abstain — cast/clip upstream
    * if that is not intended), responsibilities are truncating-ppm,
    * every M update is clamped to [1, 999999] with the
    * no-evidence-keeps-prior fallback, and the fitted parameters are
    * (1 + C + k·C²) ppm literals of bounded driver state per
    * iteration. k ≤ 4 and C ≤ 4 keep every product inside
    * DECIMAL(38).
    *
    * Output: one row — n_units, pi{c}_ppm, and c{j}_{c}{v}_ppm for
    * every (rater j, true class c, vote v).
    *
    * Scale shape: `iters` map-only E projections each feeding ONE
    * conditional aggregate (map-side combined); no key shuffle at
    * all (the [[dawidSkene]] regime, C× wider). */
  def dawidSkeneMulti(df: DataFrame, raters: Seq[Column],
      nClasses: Int = 3, iters: Int = 2): DataFrame = {
    require(raters.size >= 2 && raters.size <= 4,
      s"2..4 raters, got ${raters.size}")
    require(nClasses >= 2 && nClasses <= 4, s"nClasses=$nClasses")
    require(iters >= 1 && iters <= 3, s"iters=$iters")
    val k = raters.size
    val C = nClasses
    val spark = df.sparkSession
    val units = df
      .select(raters.zipWithIndex.map { case (c, j) =>
        c.cast("int").as(s"v$j") }: _*)
      .filter((0 until k).map(j => col(s"v$j").isNotNull)
        .reduce(_ || _))
      .persist()
    val pi = Array.fill(C)(1000000L / C)
    val conf = Array.tabulate(k, C, C) { (j, c, v) =>
      if (v == c) 700000L else 300000L / (C - 1) }
    var n = 0L
    var dead = false
    def clamp(x: BigInt): Long =
      x.max(BigInt(1)).min(BigInt(999999)).toLong
    try {
      (1 to iters).foreach { _ =>
        if (!dead) {
          def f(j: Int, c: Int) =
            s"(case when v$j is null then 1000000L else case v$j " +
              (0 until C).map(v =>
                s"when $v then ${conf(j)(c)(v)}L").mkString(" ") +
              " else 1000000L end end)"
          def w(c: Int) =
            (s"cast(${pi(c)}L as decimal(38,0))" +:
              (0 until k).map(f(_, c))).mkString(" * ")
          val sumW = (0 until C).map(c => s"(${w(c)})").mkString(" + ")
          val e = units.select(col("*") +: (0 until C).map(c =>
            expr(s"cast((${w(c)}) * 1000000 div ($sumW) as bigint)")
              .as(s"r$c")): _*)
          def dec(s: String) = s"cast($s as decimal(38,0))"
          val aggs =
            (0 until C).map(c => sum(expr(dec(s"r$c"))).as(s"s$c")) ++
            (for (j <- 0 until k; c <- 0 until C) yield
              sum(when(col(s"v$j").isNotNull, expr(dec(s"r$c"))))
                .as(s"d_${j}_$c")) ++
            (for (j <- 0 until k; c <- 0 until C; v <- 0 until C)
              yield sum(when(col(s"v$j") === v, expr(dec(s"r$c"))))
                .as(s"n_${j}_${c}_$v"))
          val row = e.agg(count(lit(1)).as("n"), aggs: _*)
            .collect().head
          def big(name: String): BigInt = {
            val i = row.fieldIndex(name)
            if (row.isNullAt(i)) BigInt(0)
            else BigInt(row.getDecimal(i).toBigInteger)
          }
          n = row.getLong(0)
          if (n == 0) dead = true
          else {
            (0 until C).foreach { c => pi(c) = clamp(big(s"s$c") / n) }
            for (j <- 0 until k; c <- 0 until C) {
              val d = big(s"d_${j}_$c")
              if (d > 0) (0 until C).foreach { v =>
                conf(j)(c)(v) =
                  clamp(big(s"n_${j}_${c}_$v") * 1000000 / d)
              }
            }
          }
        }
      }
      def out(v: Long, name: String) =
        (if (dead) lit(null).cast("bigint") else lit(v)).as(name)
      val cols = Seq(lit(n).as("n_units")) ++
        (0 until C).map(c => out(pi(c), s"pi${c}_ppm")) ++
        (for (j <- 0 until k; c <- 0 until C; v <- 0 until C)
          yield out(conf(j)(c)(v), s"c${j}_${c}${v}_ppm"))
      spark.range(1).select(cols: _*)
    } finally units.unpersist(false)
  }

  /** DAWID–SKENE SUFFICIENT-STATS STATE — the pattern-count frame
    * that makes [[dawidSkene]] INCREMENTAL AND EXACT: the EM's E and
    * M steps depend on each unit only through its vote PATTERN
    * (v0..v{k−1}), so the (pattern → unit count) table is a complete
    * sufficient statistic. State size is ≤ 3^k rows (k ≤ 4 → ≤ 81)
    * regardless of corpus size; merging two states is a count sum
    * ([[mergeDsPatternState]]); and [[dawidSkeneFromState]] refits
    * over the weighted patterns with sums that are ARITHMETIC-
    * IDENTICAL to the full-corpus fit — not an approximation, the
    * exact parameters (the [[graft.operators.TimeSeries
    * .ewmaDailyAppend]] contract, but here the state is a histogram
    * rather than a seam). All-abstain rows are dropped exactly as
    * [[dawidSkene]] drops them.
    *
    * Scale shape: ONE pattern aggregate (map-side combined into ≤ 3^k
    * groups) per batch; merge and refit touch only pattern-sized
    * frames. */
  def dsPatternState(df: DataFrame, raters: Seq[Column]): DataFrame = {
    require(raters.size >= 2 && raters.size <= 4,
      s"2..4 raters (weight products must fit DECIMAL(38)), " +
        s"got ${raters.size}")
    val k = raters.size
    df.select(raters.zipWithIndex.map { case (c, j) =>
        c.cast("int").as(s"v$j") }: _*)
      .filter((0 until k).map(j => col(s"v$j").isNotNull)
        .reduce(_ || _))
      .groupBy((0 until k).map(j => col(s"v$j")): _*)
      .agg(count(lit(1)).as("wt"))
  }

  /** Merge two [[dsPatternState]] frames — a pattern-keyed count sum
    * (exact, associative, commutative). */
  def mergeDsPatternState(a: DataFrame, b: DataFrame): DataFrame = {
    val ks = a.columns.filter(_ != "wt").toSeq
    a.unionByName(b).groupBy(ks.map(col): _*)
      .agg(sum(col("wt")).as("wt"))
  }

  /** Refit [[dawidSkene]] from a [[dsPatternState]] frame — same
    * output row (n_units, pi_ppm, a*_ppm, b*_ppm), exactly the
    * parameters the full-corpus fit produces. */
  def dawidSkeneFromState(state: DataFrame, iters: Int = 2)
      : DataFrame = {
    require(iters >= 1 && iters <= 3, s"iters=$iters")
    val k = state.columns.count(_ != "wt")
    require(k >= 2 && k <= 4, s"state carries $k vote columns")
    val spark = state.sparkSession
    val st = state.persist()
    try {
      val (n, pi, a, b, dead) = dsFit(st, k, iters, Some("wt"))
      val out = Seq(lit(n).as("n_units")) ++
        Seq(if (dead) lit(null).cast("bigint").as("pi_ppm")
          else lit(pi).as("pi_ppm")) ++
        (0 until k).map(j => if (dead) lit(null).cast("bigint")
          .as(s"a${j}_ppm") else lit(a(j)).as(s"a${j}_ppm")) ++
        (0 until k).map(j => if (dead) lit(null).cast("bigint")
          .as(s"b${j}_ppm") else lit(b(j)).as(s"b${j}_ppm"))
      spark.range(1).select(out: _*)
    } finally st.unpersist(false)
  }

  /** KRIPPENDORFF'S ALPHA, nominal metric — the agreement coefficient
    * that HANDLES MISSING RATINGS, which Cohen's κ (pairs only) and
    * Fleiss' κ (every rater rates every unit) cannot: raters may
    * abstain per unit (NULL), and any unit with ≥ 2 ratings
    * contributes. Computed from the coincidence-matrix identities so
    * no pair of ratings ever forms:
    *
    *   Do·10⁶ = Σ_{units u, m_u ≥ 2} (m_u² − Σ_c n_uc²)·10⁶ div (m_u−1)
    *   De·10⁶ = (n² − Σ_c n_c²)·10⁶ div (n−1)
    *   α      = (De − Do) / De        (sign-safe truncating ppm)
    *
    * where n_uc = unit u's count of value c, m_u = Σ_c n_uc, and
    * n_c / n sum over PAIRABLE units only (the Krippendorff 2011
    * recipe). m_u² − Σ n_uc² is the unit's ordered disagreeing-pair
    * count — an integer — so every term is exact; the per-unit and
    * final divisions truncate (sign-safe form for α, which is
    * negative under systematic disagreement). Values are compared
    * nominally as strings. One row: (n_units pairable, n_values,
    * n ratings, do_ppm, de_ppm, alpha_ppm); NULL α when De = 0
    * (fewer than 2 ratings total, or a single value everywhere —
    * agreement is then undefined, not perfect).
    *
    * Scale shape: one generator explode (unit, value), ONE
    * (unit, value) count aggregate — the only data-sized shuffle —
    * then unit-sized and values-sized aggregates. No rating pair
    * ever materializes. */
  def krippendorffAlpha(df: DataFrame, unit: Column,
      raters: Seq[Column]): DataFrame = {
    require(raters.size >= 2, s"need >= 2 raters, got ${raters.size}")
    val stacked = df
      .select(unit.as("u"), explode(array(raters.map(
        _.cast("string")): _*)).as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull)
    val uc = stacked.groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("c"))
    val um = uc.groupBy(col("u"))
      .agg(sum(col("c")).as("m"), sum(dec(col("c")) * col("c")).as("s2"))
      .filter(col("m") >= 2)
    val doRow = um
      .select(expr("(cast(m as decimal(38,0)) * m - s2) * 1000000" +
        " div (m - 1)").as("t"))
      .agg(coalesce(sum(col("t")), lit(0).cast("decimal(38,0)"))
        .as("do_ppm"), count(lit(1)).as("n_units"))
    val nc = uc.join(um.select(col("u")), Seq("u"))
      .groupBy(col("v")).agg(sum(col("c")).as("ncv"))
    val deRow = nc.agg(
      coalesce(sum(col("ncv")), lit(0)).as("n"),
      count(lit(1)).as("n_values"),
      coalesce(sum(dec(col("ncv")) * col("ncv")),
        lit(0).cast("decimal(38,0)")).as("sc2"))
    doRow.crossJoin(deRow)
      .select(col("n_units"), col("n_values"),
        col("n").cast("bigint").as("n"),
        expr("cast(do_ppm as bigint)").as("do_ppm"),
        expr("case when n > 1 then cast((cast(n as decimal(38,0)) * n" +
          " - sc2) * 1000000 div (n - 1) as bigint) end").as("de_ppm"))
      .withColumn("alpha_ppm",
        expr("case when de_ppm > 0 then cast(cast(sign(de_ppm" +
          " - do_ppm) as decimal(38,0)) * (abs(cast(de_ppm as" +
          " decimal(38,0)) - do_ppm) * 1000000 div de_ppm)" +
          " as bigint) end"))
  }

  /** CALIBRATION TABLE of a ppm-scaled score against a binary label —
    * the reliability diagram as exact integers: rows land in
    * `bins` equal-width score buckets (bin = score·bins div 10⁶,
    * clamped to bins−1 so score = 10⁶ joins the top bucket), and each
    * bucket reports (bin, n, mean_score_ppm, pos_ppm) — a calibrated
    * scorer has mean_score_ppm ≈ pos_ppm per row. Scores must already
    * be in [0, 10⁶] (fail-fast otherwise): calibration is a claim
    * about probabilities, so the caller picks the probability scale.
    *
    * Scale shape: one groupBy over ≤ `bins` keys — pure map-side
    * aggregation; empty buckets are absent (count is zero). */
  def calibrationBins(df: DataFrame, scorePpm: Column, label: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins=$bins")
    val base = df
      .select(scorePpm.cast("long").as("s"), label.cast("int").as("y"))
      .filter(col("s").isNotNull && col("y").isNotNull)
    base
      .withColumn("ok",
        assert_true(col("s") >= 0 && col("s") <= 1000000,
          lit("calibrationBins: score out of [0, 1000000] ppm")))
      .filter(col("ok").isNull)
      .groupBy(least(lit(bins - 1),
        expr(s"s * $bins div 1000000")).cast("int").as("bin"))
      .agg(count(lit(1)).as("n"),
        expr("cast(sum(cast(s as decimal(38,0))) div count(1)" +
          " as bigint)").as("mean_score_ppm"),
        expr("cast(cast(count(if(y = 1, 1, null)) as decimal(38,0))" +
          " * 1000000 div count(1) as bigint)").as("pos_ppm"))
  }

  /** EXPECTED + MAXIMUM CALIBRATION ERROR over the [[calibrationBins]]
    * table (Naeini et al., AAAI 2015) — the one-number summaries of
    * q257's reliability diagram: ECE = Σ_b (n_b/N)·|pos_b − conf_b|
    * (the bin-weighted gap between claimed confidence and observed
    * rate) and MCE = max_b |pos_b − conf_b|. Both EXACT integer ppm:
    * the bins table's pos_ppm/mean_score_ppm are already truncating-
    * division integers, so ece_ppm = Σ n_b·|…| div N replays in any
    * engine; no float anywhere. The acceptance gate a calibration fix
    * (q278's isotonic) is judged by — run before and after.
    *
    * Scale shape: the corpus-sized bins aggregate (the
    * [[calibrationBins]] pass), then ONE bins-sized (≤ `bins`-row)
    * aggregate. */
  def calibrationError(df: DataFrame, scorePpm: Column, label: Column,
      bins: Int = 10): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    calibrationBins(df, scorePpm, label, bins)
      .agg(sum(col("n")).as("n_rows"),
        count(lit(1)).as("n_bins"),
        sum(dec(col("n")) *
          abs(col("pos_ppm") - col("mean_score_ppm"))).as("gap"),
        max(abs(col("pos_ppm") - col("mean_score_ppm"))).as("mce_ppm"))
      .select(col("n_rows"), col("n_bins"),
        expr("cast(gap div nullif(n_rows, 0) as bigint)").as("ece_ppm"),
        col("mce_ppm"))
  }

  /** BRIER SCORE + MURPHY DECOMPOSITION (Brier 1950; Murphy 1973) —
    * the squared-error score of a ppm probability against a binary
    * label, with the reliability / resolution split over the
    * [[calibrationBins]] table: all exact integers in MICRO units
    * (score·10⁶):
    *   brier_micro       = Σ (s − y·10⁶)² div (N·10⁶),
    *   reliability_micro = Σ n_b·(conf_b − acc_b)² div (N·10⁶),
    *   resolution_micro  = Σ n_b·(acc_b − ȳ_ppm)² div (N·10⁶),
    *   uncertainty_micro = ȳ_ppm·(10⁶ − ȳ_ppm) div 10⁶,
    * with ȳ_ppm the exact global positive rate and conf/acc the bins
    * table's truncated integers — the decomposition is DEFINED over
    * the binned table (Murphy's identity brier = rel − res + unc
    * holds only up to within-bin variance, as always under binning).
    * Where [[calibrationError]] reports |gaps| (ECE/MCE), this is the
    * proper-scoring-rule view: resolution says whether the score
    * RANKS, reliability whether it is HONEST.
    *
    * Scale shape: two corpus aggregates (global + bins) + one
    * bins-sized fold. */
  def brierDecomposition(df: DataFrame, scorePpm: Column, label: Column,
      bins: Int = 10): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val base = df
      .select(scorePpm.cast("long").as("s"), label.cast("int").as("y"))
      .filter(col("s").isNotNull && col("y").isNotNull)
    val glob = base.agg(count(lit(1)).as("n_rows"),
        sum(dec((col("s") - col("y") * 1000000L)) *
          (col("s") - col("y") * 1000000L)).as("se"),
        expr("cast(cast(count(if(y = 1, 1, null)) as decimal(38,0))" +
          " * 1000000 div count(1) as bigint)").as("ybar_ppm"))
    val binAgg = calibrationBins(df, scorePpm, label, bins)
      .crossJoin(broadcast(glob.select(col("ybar_ppm"))))
      .agg(
        sum(dec(col("n")) *
          (col("mean_score_ppm") - col("pos_ppm")) *
          (col("mean_score_ppm") - col("pos_ppm"))).as("rel"),
        sum(dec(col("n")) *
          (col("pos_ppm") - col("ybar_ppm")) *
          (col("pos_ppm") - col("ybar_ppm"))).as("res"))
    glob.crossJoin(broadcast(binAgg))
      .select(col("n_rows"),
        expr("cast(se div (cast(n_rows as decimal(38,0)) * 1000000)" +
          " as bigint)").as("brier_micro"),
        expr("cast(rel div (cast(n_rows as decimal(38,0)) * 1000000)" +
          " as bigint)").as("reliability_micro"),
        expr("cast(res div (cast(n_rows as decimal(38,0)) * 1000000)" +
          " as bigint)").as("resolution_micro"),
        expr("cast(ybar_ppm * (1000000 - ybar_ppm) div 1000000" +
          " as bigint)").as("uncertainty_micro"))
  }

  /** ISOTONIC (PAV) CALIBRATION over the [[calibrationBins]] table —
    * the monotone recalibration map (Zadrozny & Elkan, KDD 2002) that
    * turns a raw score into a probability: the pool-adjacent-violators
    * fit, computed by its exact MINIMAX characterization
    *
    *   cal(i) = max_{j ≤ i} min_{k ≥ i} rate(j..k),
    *   rate(j..k) = Σ pos · 10⁶ div Σ n   over bins j..k
    *
    * — no sequential pooling loop, just range aggregates over the
    * BINS-SIZED table (B bins → B·(B+1)/2 ranges, ≤ B³ comparisons:
    * tiny-frame algebra, the [[majorityVoteFromState]] regime). Rates
    * are exact truncating-division ppm INTEGERS, so the fit replays
    * engine-exactly; monotonicity is structural (max-of-min over
    * nested k-sets), unaffected by the truncation. Empty bins simply
    * don't appear (no row, no pooled weight — exactly PAV on the
    * present bins). Output per present bin: (bin, n, pos_ppm raw,
    * cal_ppm fitted), cal_ppm non-decreasing in bin.
    *
    * Scale shape: one scan to the B-row bin table (the only
    * data-sized work), then literal algebra on B-row frames. */
  def isotonicCalibration(df: DataFrame, scorePpm: Column, label: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins=$bins")
    val binned = df
      .select(scorePpm.cast("long").as("s"), label.cast("int").as("y"))
      .filter(col("s").isNotNull && col("y").isNotNull)
      .withColumn("ok",
        assert_true(col("s") >= 0 && col("s") <= 1000000,
          lit("isotonicCalibration: score out of [0, 1000000] ppm")))
      .filter(col("ok").isNull)
      .groupBy(least(lit(bins - 1),
        expr(s"s * $bins div 1000000")).cast("int").as("b"))
      .agg(count(lit(1)).as("n"),
        count(when(col("y") === 1, lit(1))).as("p"))
    // pooled rate of every bin range j..k (exact ppm, truncating div)
    val ranges = binned.select(col("b").as("j"))
      .join(binned.select(col("b").as("k")), col("j") <= col("k"))
      .join(binned, col("b").between(col("j"), col("k")))
      .groupBy(col("j"), col("k"))
      .agg(expr("cast(cast(sum(p) as decimal(38,0)) * 1000000" +
        " div sum(n) as bigint)").as("r"))
    // cal(i) = max over j<=i of (min over k>=i of r(j,k))
    val cal = ranges
      .join(binned.select(col("b").as("i")),
        col("j") <= col("i") && col("k") >= col("i"))
      .groupBy(col("j"), col("i")).agg(min(col("r")).as("mn"))
      .groupBy(col("i")).agg(max(col("mn")).as("cal_ppm"))
    binned.join(cal, col("b") === col("i"))
      .select(col("b").as("bin"), col("n"),
        expr("cast(cast(p as decimal(38,0)) * 1000000 div n" +
          " as bigint)").as("pos_ppm"),
        col("cal_ppm"))
  }

  /** APPLY-side isotonic calibration — closes the train→apply loop
    * over [[isotonicCalibration]] (the bpeMerges→bpeEncode pattern):
    * each row's raw ppm score maps to the monotone calibrated rate
    * the PAV table assigns its bin. The calibration table is
    * BINS-SIZED, so the apply plan is MAP-ONLY: one broadcast hash
    * join against the B-row map, no shuffle of the scored frame at
    * all — the shape that serves 100 TB of scores untouched. Scores
    * landing in a bin the training table never saw (possible when
    * train and apply frames differ) calibrate to NULL — surfacing the
    * coverage gap beats silently extrapolating. Output: the input
    * columns plus (bin, cal_ppm); same [0, 10⁶] ppm fail-fast as
    * training. `cal` must be [[isotonicCalibration]]'s output (its
    * (bin, cal_ppm) columns are read; built with the same `bins`). */
  def isotonicApply(df: DataFrame, scorePpm: Column, cal: DataFrame,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins=$bins")
    val scored = df
      .withColumn("score_ppm_", scorePpm.cast("long"))
      .filter(col("score_ppm_").isNotNull)
      .withColumn("ok",
        assert_true(col("score_ppm_") >= 0 && col("score_ppm_") <= 1000000,
          lit("isotonicApply: score out of [0, 1000000] ppm")))
      .filter(col("ok").isNull).drop("ok")
      .withColumn("bin", least(lit(bins - 1),
        expr(s"score_ppm_ * $bins div 1000000")).cast("int"))
      .drop("score_ppm_")
    scored.join(
      broadcast(cal.select(col("bin"), col("cal_ppm"))),
      Seq("bin"), "left")
  }
}
