package graft.operators

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession

/** Table-maintenance operators for the ingest side of a 100 TB pipeline.
  *
  * Incremental ingest (one file per micro-batch per partition — see
  * `streaming/StreamingIngest`) accretes small files; scan cost then
  * degrades from "bytes read" to "files opened" (footer reads, listing,
  * task-per-file scheduling). Periodic compaction rewrites a directory
  * toward a target file size — the maintenance job every table format
  * (Hive, Delta, Iceberg) schedules; this is the dependency-free parquet
  * form. */
object Maintenance {

  /** Result of one [[compactParquet]] run. */
  case class CompactionStats(filesBefore: Int, filesAfter: Int,
      bytes: Long, rows: Long)

  /** Rewrite the parquet files of `dir` into ~`ceil(bytes/targetFileBytes)`
    * files of roughly equal size: write to a staging dir, move the new
    * files IN, then delete the old ones. The ordering is chosen for
    * crash-safety over snapshot isolation — a crash mid-swap leaves the
    * directory with a recoverable SUPERSET (old + some new, i.e.
    * transiently duplicated rows), never with data missing. A concurrent
    * reader listing mid-swap can likewise see the overlap; run compaction
    * in a maintenance window, or use the manifest layer
    * ([[graft.sources.ManifestTable]] — this protocol plus an atomic
    * manifest pointer, as in Delta/Iceberg) when readers need snapshot
    * isolation.
    *
    * `shuffle = false` uses `coalesce` (no exchange: existing partitions
    * are concatenated — cheapest, but file sizes inherit input skew);
    * `shuffle = true` uses `repartition` (one round-robin exchange —
    * pays a shuffle for evenly-sized output, the right call when the
    * input is pathologically skewed). */
  def compactParquet(spark: SparkSession, dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      shuffle: Boolean = false): CompactionStats = {
    val d = new File(dir)
    val before = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    require(before.nonEmpty, s"no parquet files under $dir")
    val bytes = before.map(_.length()).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)

    val df = spark.read.parquet(dir)
    val rows = df.count()
    val staged = dir.stripSuffix("/") + "_compact_staging"
    val sized = if (shuffle) df.repartition(nOut) else df.coalesce(nOut)
    sized.write.mode("overwrite").parquet(staged)

    // swap, new-in-first: Spark part-file names are UUID-unique, so the
    // moves cannot collide with the old files; only after every new file
    // is in place do the old ones go. A crash anywhere in between leaves
    // old+new (duplicates, recoverable) — never a hole.
    val stagedFiles = new File(staged).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    stagedFiles.foreach { f =>
      Files.move(f.toPath, Paths.get(dir, f.getName),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    }
    before.foreach(f => Files.deleteIfExists(f.toPath))
    Option(new File(staged).listFiles()).getOrElse(Array.empty)
      .foreach(f => Files.deleteIfExists(f.toPath))
    Files.deleteIfExists(Paths.get(staged))

    CompactionStats(before.length, stagedFiles.length, bytes, rows)
  }
}
