package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval fusion (north-star X3/X4; SURVEY.md §2.12): combine
  * independently ranked candidate lists — lexical (BM25), dense
  * (embedding cosine), or any other retriever — into one ranking with
  * reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
  * `score(d) = Σ_lists 1/(K + rank_list(d))`. RRF needs only RANKS, not
  * comparable scores, which is exactly why it is the standard way to
  * fuse BM25 (unbounded score) with cosine (bounded [-1, 1]) in a
  * retrieval-augmented data pipeline.
  *
  * Determinism: the per-rank weight is the INTEGER `1e9 // (K + rank)`
  * (pure integer floor division — no float anywhere), and the per-id
  * fusion is an exact long sum, so the fused ranking replays
  * bit-identically on any engine regardless of partition or list order.
  *
  * Scale shape: each input list is already top-N (N constant, produced
  * by a TakeOrderedAndProject upstream), so every DataFrame here is
  * K-sized — the union/groupBy shuffles move O(lists × N) rows no matter
  * how big the corpus behind the retrievers is. The single-partition
  * ranking window is bounded by the same constant. */
object Retrieval {

  /** Ranks an already-scored candidate table: keeps the global top `n`
    * by (`scoreCol` DESC, `idCol` ASC) — a TakeOrderedAndProject, no
    * global sort — then assigns dense 1-based ranks in that same total
    * order. The unpartitioned window is safe by construction: its input
    * is the n-row limit output, never the corpus. */
  def rankTopN(scored: DataFrame, idCol: String, scoreCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"n=$n")
    val limited = scored
      .orderBy(col(scoreCol).desc, col(idCol))
      .limit(n)
      .select(col(idCol).cast("long").as("id"), col(scoreCol).as("score"))
    limited.withColumn("rnk",
      row_number().over(Window.orderBy(col("score").desc, col("id"))))
      .select(col("id"), col("rnk"))
  }

  /** Fuses named rank lists (each `(id, rnk)`, rnk 1-based) by RRF.
    * Output: one row per id seen in ANY list — per-list rank columns
    * (`<name>_rank`, 0 when the list missed the id), `n_lists`, the
    * exact integer `rrf_micro = Σ 1e9 // (kConst + rank)`, and the
    * display-scaled `rrf` — top `topN` by (`rrf_micro` DESC, id). */
  def rrfFuse(lists: Seq[(String, DataFrame)], kConst: Int,
      topN: Int): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one list")
    require(kConst >= 1 && topN >= 1, s"kConst=$kConst topN=$topN")
    val tagged = lists.map { case (name, df) =>
      df.select(col("id"), col("rnk"), lit(name).as("src"))
    }
    val u = tagged.reduce(_ unionByName _)
    // floor(double) here IS exact integer division: 1e9/(K+rnk) has
    // relative double error ~2^-53, while the nearest integer is at
    // least 1/(K+N) away in exact arithmetic — no boundary crossing.
    val micro = floor(lit(1000000000L) / (lit(kConst) + col("rnk")))
      .cast("long")
    val perList = lists.map { case (name, _) =>
      coalesce(max(when(col("src") === name, col("rnk"))), lit(0))
        .as(s"${name}_rank")
    }
    val aggs = perList ++ Seq(
      count(lit(1)).cast("int").as("n_lists"),
      sum(micro).as("rrf_micro"))
    u.groupBy(col("id"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("rrf", round(col("rrf_micro") / lit(1e9), 6))
      .orderBy(col("rrf_micro").desc, col("id"))
      .limit(topN)
  }
}
