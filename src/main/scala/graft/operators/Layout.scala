package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators for multi-dimensional scan pruning (100 TB
  * concern): Z-order (Morton) clustering of a table on two dimensions so
  * that parquet file/row-group min-max statistics prune box predicates on
  * EITHER OR BOTH dimensions, not just the leading sort key.
  *
  * Why this matters at scale: a table sorted by `x` alone answers
  * `x BETWEEN ..` with tight file pruning but reads EVERY file for a
  * selective `y BETWEEN ..`; interleaving the bits of (x, y) into one
  * Morton code and range-partitioning + sorting on it tiles the (x, y)
  * plane, so each file covers a small rectangle and a box predicate on
  * any combination of the dimensions overlaps only the files whose tile
  * intersects the box (the Delta/Iceberg `OPTIMIZE ZORDER BY` layout,
  * expressed with stock Spark operators: one range shuffle + an in-
  * partition sort — no custom writer needed).
  *
  * The code path is pure bit arithmetic on longs (codegen-friendly, no
  * UDF) and is oracle-checked bit-for-bit against DuckDB (q113).
  */
object Layout {

  /** Classic parallel-prefix bit spread: the low 16 bits of `c` end up at
    * the even bit positions of a 32-bit value (0 → 0, 0xFFFF →
    * 0x55555555). Masks are the textbook "Interleave bits by Binary Magic
    * Numbers" constants (Stanford Bit Twiddling Hacks). */
  private[operators] def spread16(c: Column): Column = {
    val m = Seq(0x00FF00FFL, 0x0F0F0F0FL, 0x33333333L, 0x55555555L)
    val shifts = Seq(8, 4, 2, 1)
    var x = c.bitwiseAND(lit(0xFFFFL))
    shifts.zip(m).foreach { case (s, mask) =>
      x = x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(mask))
    }
    x
  }

  /** 32-bit Morton code of two dimensions' low 16 bits: x at even bit
    * positions, y at odd. Monotone in the Z-curve order — adjacent codes
    * are spatially adjacent tiles, which is what makes a range partition
    * on the code a 2-D tiling. For dimensions wider than 16 bits, quantize
    * first (rank/bucket them into 0..65535 — the curve needs RELATIVE
    * position, not the raw value; equal-width buckets on a skewed
    * dimension degrade to the skew, so rank-based quantiles are the
    * robust choice at scale). */
  def morton2(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Write `df` as parquet clustered on the Z-order of (x, y):
    * range-partition into `numFiles` Morton-contiguous slices (one range
    * shuffle — the same exchange any global sort pays), then sort rows
    * within each partition so row-group stats are tight too. The helper
    * column is dropped before the write; a projection never reorders rows,
    * so the clustering survives.
    *
    * On a cluster this is exactly `OPTIMIZE table ZORDER BY (x, y)`:
    * numFiles sizes the output files (pick total_bytes / ~1 GB). */
  def zorderWrite(df: DataFrame, x: Column, y: Column, numFiles: Int,
      path: String): Unit =
    df.withColumn("__zcode", morton2(x, y))
      .repartitionByRange(numFiles, col("__zcode"))
      .sortWithinPartitions(col("__zcode"))
      .drop("__zcode")
      .write.mode("overwrite").parquet(path)

  /** Per-file bounding boxes of two columns — the min-max stats a scan
    * planner consults, materialized for inspection/tests. */
  def fileBoxes(spark: SparkSession, path: String, xName: String,
      yName: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(xName)).as("x_lo"), max(col(xName)).as("x_hi"),
        min(col(yName)).as("y_lo"), max(col(yName)).as("y_hi"))

  /** How many files a box predicate `x in [xLo,xHi] AND y in [yLo,yHi]`
    * must read under the given per-file boxes (interval-overlap count) —
    * the file-skipping effectiveness metric for [[zorderWrite]]. */
  def filesOverlapping(boxes: DataFrame, xLo: Long, xHi: Long, yLo: Long,
      yHi: Long): Long =
    boxes.filter(col("x_lo") <= xHi && col("x_hi") >= xLo &&
      col("y_lo") <= yHi && col("y_hi") >= yLo).count()
}
