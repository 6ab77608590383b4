package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph operators over edge tables (complementing the min-label
  * connected components in [[Dedup.connectedComponents]]): iterative
  * rank propagation in the Pregel/GraphX shape — broadcast-free,
  * one co-partitioned join per superstep — but expressed on DataFrames
  * so Catalyst/AQE keep owning the physical plan. */
object Graph {

  /** PageRank in integer MICRO-units — damping 0.85, every step exact
    * 64-bit arithmetic: ranks start at 1_000_000, a node sends
    * `r div outdeg` to each out-neighbor (integer division), and the
    * update is `150_000 + (850_000 · Σin) div 1_000_000`. No floating
    * point anywhere, so any engine (and any partitioning) replays the
    * exact ranks — the same reproducibility contract as the hash
    * samplers in [[Curation]]. Dangling nodes keep their mass (the
    * simplified non-normalized variant; ranks are scores, not a
    * probability distribution — what ranking consumers actually use).
    *
    * Scale shape: the edge table is hash-partitioned on `src` ONCE
    * (localCheckpoint preserves the partitioning), so each of the
    * `iters` supersteps (1) joins the narrow rank table to edges on
    * `src` shuffling only the rank side — node-sized, never the edges —
    * and (2) partial-aggregates the contributions on `dst` (map-side
    * combine cuts that shuffle to one row per (partition, dst)). Edges
    * are never driver-collected and never re-shuffled; rank state is
    * one narrow (node, long) row per node, localCheckpoint'd per
    * superstep so the plan stays O(1) deep. Rank/outdeg tables are
    * node-cardinality, so they are deliberately NOT broadcast — at
    * graph scale they don't fit; the co-partitioned shuffle join is
    * the honest plan.
    * Overflow headroom: 850_000 · Σin stays under 2⁶³ while the graph's
    * total in-mass per node is below ~10¹³ micro-units (≈10⁷ full-rank
    * in-neighbors); beyond that, drop the micro scale a decade.
    *
    * Input: a directed edge table; duplicate edges are collapsed.
    * Output: (node, r) final micro-ranks for every node. */
  def pageRankMicro(edges: DataFrame, iters: Int,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(iters >= 1, s"iters=$iters")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct()
      .repartition(col("src")).localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    var rank = nodes.withColumn("r", lit(1000000L)).localCheckpoint()
    for (_ <- 1 to iters) {
      // outdeg folds into the node-sized rank table FIRST (inner join:
      // only nodes with out-edges send mass), so the edge table takes
      // exactly ONE join per superstep; the hash-join hint keeps the
      // co-partitioned edge side sort-free (rank is the build side)
      val sending = rank.withColumnRenamed("node", "src")
        .join(outdeg, "src")
        .select(col("src"), expr("r div outdeg").as("c"))
      val contrib = e.join(sending.hint("SHUFFLE_HASH"), "src")
        .groupBy(col("dst").as("node")).agg(sum(col("c")).as("s"))
      rank = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"), (lit(150000L) +
          expr("(850000 * coalesce(s, 0L)) div 1000000")).as("r"))
        .localCheckpoint()
    }
    rank
  }
}
