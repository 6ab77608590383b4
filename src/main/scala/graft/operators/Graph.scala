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
    * Scale shape: each of the `iters` supersteps is (1) a join of the
    * rank table to edges on `src` — both sides hash-partitioned on the
    * same key, so pre-bucketing edges by src makes it co-located — and
    * (2) a partial-aggregated groupBy on `dst` (map-side combine cuts
    * the shuffle to one row per (partition, dst)). Edges are never
    * driver-collected; rank state is one narrow (node, long) row per
    * node, localCheckpoint'd per superstep so the plan stays O(1) deep.
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
      col(dstCol).cast("long").as("dst")).distinct().localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    var rank = nodes.withColumn("r", lit(1000000L)).localCheckpoint()
    for (_ <- 1 to iters) {
      val contrib = e
        .join(outdeg, "src")
        .join(rank.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("r div outdeg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      rank = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"), (lit(150000L) +
          expr("(850000 * coalesce(s, 0L)) div 1000000")).as("r"))
        .localCheckpoint()
    }
    rank
  }
}
