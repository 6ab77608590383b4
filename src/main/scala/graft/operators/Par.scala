package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism guard for compute-bound per-row stages (shingle hashing,
  * dot products, fingerprints).
  *
  * Spark sizes scan partitions by BYTES (`spark.sql.files.maxPartitionBytes`,
  * 128 MB default), which is right for IO-bound scans but wrong for
  * CPU-bound transforms over small-but-dense inputs: a sub-megabyte parquet
  * file of 5k documents arrives as ONE partition and every downstream
  * per-row computation serializes onto a single core no matter how many the
  * cluster has. The north-star operators do thousands of arithmetic ops per
  * row, so that single partition is the whole wall-clock.
  */
object Par {

  /** Round-robin repartition `df` to the cluster's default parallelism IFF
    * it currently has fewer partitions. At 100 TB the scan already yields
    * thousands of partitions and this is a NO-OP — no shuffle is inserted;
    * the guard only fires in the small-file regime where the shuffled bytes
    * are by construction trivial. */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
