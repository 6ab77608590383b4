package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-based snapshot isolation over a plain parquet directory — the
  * commit protocol that table formats (Delta's `_delta_log`, Iceberg's
  * metadata tree) layer on top of object storage, in its minimal
  * dependency-free form:
  *
  *   - data files live under `<dir>/data/` and are IMMUTABLE once
  *     committed — a writer never mutates or deletes a live file;
  *   - `<dir>/_manifests/v<N>.manifest` lists the exact data files of
  *     snapshot N (one name per line);
  *   - `<dir>/_manifests/CURRENT` holds the committed version number and
  *     is replaced by ATOMIC file rename — the single linearization
  *     point. Readers resolve CURRENT → manifest → file list, so they
  *     see exactly one committed snapshot, never a mid-write directory
  *     listing (the failure mode `Maintenance.compactParquet` documents).
  *
  * Commits use optimistic concurrency: a writer records the version it
  * read, prepares files + the next manifest, and publishes only if
  * CURRENT still holds the expected version ([[ConcurrentCommitException]]
  * otherwise — caller re-reads and retries, exactly Delta's protocol).
  * On a real object store the rename-if-absent of `v<N+1>.manifest`
  * itself is the compare-and-swap; the CURRENT pointer file keeps reads
  * a single fixed-name fetch.
  *
  * Scale note: the manifest is O(files), not O(rows) — at 100 TB with
  * 128 MB files that is ~800k lines per manifest, which is why real
  * formats split manifests into a tree; the protocol is unchanged.
  *
  * Crash safety: every mutation is (1) write data files, (2) write
  * manifest, (3) atomic-rename CURRENT. A crash before (3) leaves
  * orphaned files invisible to every reader; [[vacuum]] reclaims them.
  */
object ManifestTable {

  class ConcurrentCommitException(msg: String) extends RuntimeException(msg)

  private def manifestDir(dir: String): Path = Paths.get(dir, "_manifests")
  private def dataDir(dir: String): Path = Paths.get(dir, "data")
  private def currentPtr(dir: String): Path = manifestDir(dir).resolve("CURRENT")
  private def manifestPath(dir: String, v: Long): Path =
    manifestDir(dir).resolve(s"v$v.manifest")

  /** Create an empty table (version 0, no files). No-op if it exists. */
  def create(dir: String): Unit = synchronized {
    Files.createDirectories(dataDir(dir))
    Files.createDirectories(manifestDir(dir))
    if (!Files.exists(currentPtr(dir))) {
      Files.write(manifestPath(dir, 0L), Array.empty[Byte])
      publish(dir, 0L)
    }
  }

  /** The committed snapshot version readers currently resolve. */
  def currentVersion(dir: String): Long =
    new String(Files.readAllBytes(currentPtr(dir)), StandardCharsets.UTF_8)
      .trim.toLong

  /** Data files of snapshot `v` (absolute paths). */
  def files(dir: String, v: Long): Seq[String] = {
    val lines = new String(Files.readAllBytes(manifestPath(dir, v)),
      StandardCharsets.UTF_8)
    lines.split("\n").filter(_.nonEmpty).toSeq
      .map(n => dataDir(dir).resolve(n).toString)
  }

  /** Read the CURRENT snapshot (resolves the pointer once — the returned
    * plan is pinned to that version and unaffected by later commits,
    * compactions, or vacuums of other versions). Empty snapshot → empty
    * DataFrame with the schema unknowable → caller passes `schemaFrom`. */
  def read(spark: SparkSession, dir: String): (Long, DataFrame) = {
    val v = currentVersion(dir)
    val fs = files(dir, v)
    require(fs.nonEmpty, s"snapshot v$v is empty — nothing to read")
    (v, spark.read.parquet(fs: _*))
  }

  /** Append `df` as a new snapshot: new part files + a manifest listing
    * old ∪ new, then the atomic pointer swap. `expectedVersion` is the
    * version the caller based its write on. */
  def append(spark: SparkSession, dir: String, df: DataFrame,
      expectedVersion: Long): Long =
    commit(dir, expectedVersion, keepOld = true) { staging =>
      df.write.mode("append").parquet(staging.toString)
    }

  /** Time-travel read: the exact file set of historical snapshot `v`
    * (valid until [[vacuum]]'s retention window passes it). */
  def readVersion(spark: SparkSession, dir: String, v: Long): DataFrame = {
    val fs = files(dir, v)
    require(fs.nonEmpty, s"snapshot v$v is empty — nothing to read")
    spark.read.parquet(fs: _*)
  }

  /** [[append]] wrapped in the standard optimistic-retry loop: re-read
    * the current version and retry on [[ConcurrentCommitException]], up
    * to `maxRetries` times. Appends commute (each only adds files), so
    * blind retry is safe — a compaction racing in between merely means
    * the retried append lands on the compacted snapshot. */
  def appendWithRetry(spark: SparkSession, dir: String, df: DataFrame,
      maxRetries: Int = 10): Long = {
    var attempt = 0
    while (true) {
      try return append(spark, dir, df, currentVersion(dir))
      catch {
        case e: ConcurrentCommitException =>
          attempt += 1
          if (attempt > maxRetries) throw e
      }
    }
    -1L // unreachable
  }

  /** Compact the CURRENT snapshot into `nFiles` files as a NEW snapshot
    * that references only the rewritten files. Readers pinned to older
    * versions keep their exact file set — this is the snapshot-isolated
    * compaction `Maintenance.compactParquet` (swap-in-place, brief
    * duplicate window) cannot give. */
  def compact(spark: SparkSession, dir: String, nFiles: Int): Long = {
    val (v, df) = read(spark, dir)
    commit(dir, expectedVersion = v, keepOld = false) { staging =>
      df.coalesce(nFiles).write.mode("append").parquet(staging.toString)
    }
  }

  /** Delete data files referenced by NO manifest ≤ the current version
    * and drop manifests older than `retainVersions` behind CURRENT.
    * Readers pinned to a vacuumed version lose their snapshot — the
    * retention window is the contract, as in every table format. */
  def vacuum(dir: String, retainVersions: Int = 1): Int = synchronized {
    val cur = currentVersion(dir)
    val keepFrom = math.max(0L, cur - retainVersions)
    val live: Set[String] = (keepFrom to cur).flatMap { v =>
      val p = manifestPath(dir, v)
      if (Files.exists(p)) files(dir, v).map(f => Paths.get(f).getFileName.toString)
      else Seq.empty
    }.toSet
    val dropped = Option(dataDir(dir).toFile.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !live.contains(f.getName))
    dropped.foreach(f => Files.deleteIfExists(f.toPath))
    Option(manifestDir(dir).toFile.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.matches("v\\d+\\.manifest") &&
        f.getName.stripPrefix("v").stripSuffix(".manifest").toLong < keepFrom)
      .foreach(f => Files.deleteIfExists(f.toPath))
    dropped.length
  }

  /** Exactly-once streaming sink: each micro-batch commits as one
    * manifest version, keyed by a (streamId, batchId) marker so a
    * replayed batch (restart after a crash between sink write and
    * checkpoint advance) is a NO-OP rather than a duplicate — the
    * manifest-layer equivalent of `sources/v2/WarehouseSink`'s
    * idempotent re-commit. `streamId` must be stable across restarts and
    * UNIQUE per writing query (batch ids are per-query counters — two
    * queries sharing a streamId would suppress each other's batches);
    * use the query name or checkpoint path.
    * Usage: `df.writeStream.foreachBatch(ManifestTable.streamingSink(dir, "myquery") _).…` */
  def streamingSink(dir: String, streamId: String)
      (batch: DataFrame, batchId: Long): Unit = {
    require(streamId.matches("[A-Za-z0-9_.-]+"),
      s"streamId '$streamId' must be filesystem-safe")
    val marker = manifestDir(dir).resolve(s"batch_${streamId}_$batchId")
    if (!Files.exists(marker)) {
      appendWithRetry(batch.sparkSession, dir, batch)
      Files.write(marker, Array.empty[Byte])
    }
  }

  /** The shared commit path: stage part files, move them (immutable,
    * UUID-named — collisions impossible) into data/, write manifest
    * N+1 = (old files if keepOld) ∪ new files, CAS-check, publish.
    * The version check and pointer swap are under the object lock —
    * the single-JVM stand-in for the store's atomic rename-if-absent. */
  private def commit(dir: String, expectedVersion: Long, keepOld: Boolean)
      (write: Path => Unit): Long = {
    val staging = Files.createTempDirectory(Paths.get(dir), ".commit_")
    try {
      write(staging)
      val newFiles = Option(staging.toFile.listFiles())
        .getOrElse(Array.empty[File])
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .map(_.getName).sorted
      synchronized {
        val cur = currentVersion(dir)
        if (cur != expectedVersion)
          throw new ConcurrentCommitException(
            s"table at v$cur, commit prepared against v$expectedVersion")
        val next = cur + 1
        newFiles.foreach { n =>
          Files.move(staging.resolve(n), dataDir(dir).resolve(n),
            StandardCopyOption.ATOMIC_MOVE)
        }
        val old = if (keepOld)
          files(dir, cur).map(f => Paths.get(f).getFileName.toString)
        else Seq.empty
        Files.write(manifestPath(dir, next),
          (old ++ newFiles).mkString("\n").getBytes(StandardCharsets.UTF_8))
        publish(dir, next)
        next
      }
    } finally {
      Option(staging.toFile.listFiles()).getOrElse(Array.empty)
        .foreach(f => Files.deleteIfExists(f.toPath))
      Files.deleteIfExists(staging)
    }
  }

  /** Atomic pointer swap: write CURRENT.tmp, ATOMIC_MOVE onto CURRENT. */
  private def publish(dir: String, v: Long): Unit = {
    val tmp = manifestDir(dir).resolve("CURRENT.tmp")
    Files.write(tmp, v.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, currentPtr(dir),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }
}
