package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-profiling operators — the ANALYZE-TABLE / data-quality-monitor
  * surface of a warehouse: per-column statistics computed in one corpus
  * pass, for schema-drift and null-rate alerting over pipeline runs. */
object Profiling {

  /** Per-column profile: non-null count, null count, distinct count,
    * min and max (typed aggregation first, THEN cast to string so every
    * column fits one output schema). One row per profiled column.
    *
    * Scale shape: a single aggregate pass — no joins, no windows; the
    * row→column unpivot happens on the ONE aggregated row via an
    * explode of per-column structs. With `approx = false` the exact
    * `countDistinct` per column makes Catalyst plan an Expand (one
    * projection per distinct column — profiled-columns × corpus rows
    * streamed through the partial aggs); `approx = true` swaps in
    * `approx_count_distinct` (HLL++, relative error ≤ `rsd`) and the
    * pass is plain map-side-combine — THE 100 TB setting, where an
    * exact distinct of every column is an Expand over the whole corpus
    * for a number nobody needs exactly. Avoids sum/avg deliberately:
    * they are partition-order-dependent on doubles, while count/min/max
    * are exact on any engine. */
  def columnProfile(df: DataFrame, cols: Seq[String],
      approx: Boolean = false, rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    cols.foreach(c => require(df.columns.contains(c), s"no column '$c'"))
    // identifiers are referenced as backtick-quoted Columns (embedded
    // backticks doubled) and the unpivot is built from struct/explode
    // Column expressions — no string splicing anywhere, so a column
    // named "weird col" or "a.b" profiles correctly (ADVICE r6)
    def qc(c: String) = col("`" + c.replace("`", "``") + "`")
    def nd(c: String) =
      if (approx) approx_count_distinct(qc(c), rsd) else countDistinct(qc(c))
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(count(qc(c)).as(s"_p${i}_n"),
        count(when(qc(c).isNull, 1)).as(s"_p${i}_nulls"),
        nd(c).as(s"_p${i}_distinct"),
        min(qc(c)).cast("string").as(s"_p${i}_min"),
        max(qc(c)).cast("string").as(s"_p${i}_max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = array(cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("col_name"),
        col(s"_p${i}_n").as("n_non_null"),
        col(s"_p${i}_nulls").as("n_nulls"),
        col(s"_p${i}_distinct").as("n_distinct"),
        col(s"_p${i}_min").as("min_val"),
        col(s"_p${i}_max").as("max_val"))
    }: _*)
    one.select(explode(rows).as("r")).select("r.*")
  }
}
