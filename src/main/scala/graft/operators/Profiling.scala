package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-profiling operators — the ANALYZE-TABLE / data-quality-monitor
  * surface of a warehouse: per-column statistics computed in one corpus
  * pass, for schema-drift and null-rate alerting over pipeline runs. */
object Profiling {

  /** Per-column profile: non-null count, null count, exact distinct
    * count, min and max (typed aggregation first, THEN cast to string so
    * every column fits one output schema). One row per profiled column.
    *
    * Scale shape: a single aggregate pass — no joins, no windows; the
    * row→column unpivot happens on the ONE aggregated row via `stack`.
    * The exact `countDistinct` per column makes Catalyst plan an Expand
    * (one projection per distinct column — profiled-columns × corpus
    * rows streamed through the partial aggs); at 100 TB swap it for
    * `approx_count_distinct` and the pass is plain map-side-combine.
    * Avoids sum/avg deliberately: they are partition-order-dependent on
    * doubles, while count/min/max are exact on any engine. */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    cols.foreach(c => require(df.columns.contains(c), s"no column '$c'"))
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__n"),
        count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c => s"'$c', ${c}__n, ${c}__nulls, " +
      s"${c}__distinct, ${c}__min, ${c}__max").mkString(", ")
    one.selectExpr(s"stack(${cols.size}, $stacked) AS " +
      "(col_name, n_non_null, n_nulls, n_distinct, min_val, max_val)")
  }
}
