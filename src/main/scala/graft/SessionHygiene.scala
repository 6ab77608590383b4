package graft

import org.apache.spark.sql.SparkSession

/** Per-query hygiene for long-lived many-query sessions (Bench, Verify,
  * or any driver-style runner): blocking-unpersist whatever the last
  * query left pinned, drop cached relations, and FORCE a GC.
  *
  * The GC is the load-bearing step: broadcasts, shuffle registrations,
  * and checkpoint blocks are reclaimed by ContextCleaner only after
  * their driver references are enqueued BY A GC, and Spark's own
  * periodic full GC (`spark.cleaner.periodicGC.interval`) defaults to
  * 30 minutes — never, within a bench-length run. Without this, state
  * compounds across queries and a 123-query session degrades ~10×
  * (round-4 pathology: 1213 s vs 95 s for identical plans). */
object SessionHygiene {
  def cleanup(spark: SparkSession): Unit = {
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    spark.catalog.clearCache()
    System.gc()
  }
}
