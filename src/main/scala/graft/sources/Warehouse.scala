package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Upsert

/** S4/S5/S6: the warehouse sink contract of the reference (etl.py:110-180)
  * behind one trait. The reference's MySQL `CREATE TABLE IF NOT EXISTS` +
  * row-wise `INSERT IGNORE` + `UNIQUE(symbol, date)` becomes: declared
  * DECIMAL schema at the boundary, set-based anti-join append, engine-level
  * idempotence. A JDBC implementation would swap [[ParquetWarehouse]] for
  * `df.write.format("jdbc")` inside the same trait (no JDBC endpoint exists
  * in this environment).
  */
trait StockWarehouse {
  /** Idempotent append: exactly-once per (symbol, date) (etl.py:127, 142). */
  def append(batch: DataFrame): Unit
  /** S5: inspection read-back — last n rows by key desc (etl.py:174). */
  def readBack(n: Int): DataFrame
  /** S6: catalog inspection — (column, type) rows (etl.py:161-172). */
  def describe(): Seq[(String, String)]
}

object Warehouse {
  /** The at-rest schema of etl.py:115-129: DECIMAL(15,4) prices,
    * DECIMAL(10,4) change, TIMESTAMP load audit column.
    *
    * Documented divergence: the reference's AUTO_INCREMENT `id` surrogate
    * (etl.py:117) is omitted — a distributed engine has no cheap global
    * counter, the natural key is (symbol, date), and a
    * `monotonically_increasing_id()` stand-in would be non-contiguous and
    * non-deterministic across runs. */
  def toWarehouseSchema(df: DataFrame): DataFrame =
    df.select(
      col("symbol").cast("string").as("symbol"),
      col("date").cast("date").as("date"),
      col("open").cast("decimal(15,4)").as("open_price"),
      col("high").cast("decimal(15,4)").as("high_price"),
      col("low").cast("decimal(15,4)").as("low_price"),
      col("close").cast("decimal(15,4)").as("close_price"),
      col("volume").cast("long").as("volume"),
      col("daily_change_percentage").cast("decimal(10,4)")
        .as("daily_change_percentage"),
      current_timestamp().as("extraction_timestamp"))
}

/** Parquet-backed warehouse (the harness stand-in for MySQL). */
class ParquetWarehouse(spark: SparkSession, path: String) extends StockWarehouse {

  private def existsOnDisk: Boolean =
    new java.io.File(path).exists()

  private def current(): DataFrame =
    if (existsOnDisk) spark.read.parquet(path)
    else spark.emptyDataFrame

  override def append(batch: DataFrame): Unit = {
    val incoming = Warehouse.toWarehouseSchema(batch)
    val merged =
      if (!existsOnDisk) incoming.dropDuplicates(Seq("symbol", "date"))
      else Upsert.upsertIgnore(incoming, current(), Seq("symbol", "date"))
    // write-then-swap so the read inside upsertIgnore never races the write
    val tmp = path + "__staging"
    merged.write.mode("overwrite").parquet(tmp)
    val dir = new java.io.File(path)
    if (dir.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(dir)
    }
    new java.io.File(tmp).renameTo(dir)
  }

  override def readBack(n: Int): DataFrame =
    current().orderBy(desc("symbol"), desc("date")).limit(n)

  override def describe(): Seq[(String, String)] =
    current().schema.fields.toSeq.map(f => f.name -> f.dataType.simpleString)
}
