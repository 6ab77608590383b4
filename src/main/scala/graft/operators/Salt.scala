package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md §7 "100 TB design notes"): when one join/agg
  * key dominates, a single reducer drowns no matter how many executors the
  * cluster has. Salting splits the hot key's rows across `buckets`
  * sub-keys; the other side replicates per salt, restoring correctness.
  * AQE's skew-join handles the join case adaptively at runtime — this
  * operator is the explicit form for when the skew is known up front (or
  * for aggregates AQE doesn't rewrite). */
object Salt {

  /** Equi-join with a salted fact side: `fact ⋈ dim` on `key`, with fact
    * rows scattered over `buckets` sub-partitions and the (small) dim side
    * replicated `buckets` times. Result rows are identical to the plain
    * join — only the shuffle distribution changes. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      buckets: Int): DataFrame = {
    // any distribution is correct; partition id spreads a hot key's rows
    // across input splits without a per-row RNG (deterministic per task)
    val salted = fact.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets))
        .cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase salted aggregation: partial per (key, salt), final per key.
    * Spark's hash aggregate already does map-side partials for algebraic
    * functions; this explicit form is for the cases that don't get them
    * (e.g. exact count-distinct rewritten as two-level sets). */
  def saltedCountDistinct(df: DataFrame, key: String, valueCol: String,
      buckets: Int): DataFrame =
    df
      .withColumn("__salt", pmod(hash(col(valueCol)), lit(buckets)))
      .groupBy(col(key), col("__salt"))
      .agg(countDistinct(col(valueCol)).as("__partial"))
      // value-hash salting ⇒ identical values share a salt ⇒ partial
      // distinct counts are disjoint and sum exactly
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"n_distinct_$valueCol"))
}
