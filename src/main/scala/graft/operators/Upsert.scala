package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{col, count, lag, lead, lit,
  row_number, struct, when}

/** A7 idempotent upsert-ignore (SURVEY.md §2.4): the reference's
  * `INSERT IGNORE` + `UNIQUE(symbol, date)` sink contract (etl.py:127,
  * 141-145) re-expressed as a left-anti join — incoming rows whose key
  * already exists are dropped, everything else appends.
  *
  * Scale: the anti join shuffles both sides on the key once (or broadcasts
  * the smaller); `dropDuplicates` gives in-batch exactly-once. No
  * row-at-a-time round trips (the reference's etl.py:140 `iterrows` loop is
  * exactly the anti-pattern this replaces).
  */
object Upsert {

  /** Returns `existing ∪ (incoming ∖keys existing)`, with in-batch key dedup
    * on the incoming side first. Column sets must match by name. */
  def upsertIgnore(incoming: DataFrame, existing: DataFrame,
      keys: Seq[String]): DataFrame = {
    val fresh = incoming
      .dropDuplicates(keys)
      .join(existing.select(keys.map(col): _*), keys, "left_anti")
    existing.unionByName(fresh)
  }

  /** Slowly-changing-dimension Type 2 build (Kimball's dimensional
    * modeling, public since the 1996 Data Warehouse Toolkit): an
    * append-only change/event log becomes per-key VERSION intervals —
    * consecutive rows with an unchanged `state` collapse into one
    * version (CDC compaction), each surviving version carries
    * `valid_from` = its first observation, `valid_to` = the next
    * version's start (NULL while current), `is_current` = 1 on the open
    * interval. The reference's restated daily payloads (etl.py re-reads
    * `{symbol}_{date}.json` and re-inserts) are exactly this shape: a
    * keyed history where only CHANGES should version.
    *
    * Scale: ONE hash shuffle on `key`, then both window passes (the
    * lag change-detect and the lead interval-close) reuse the same
    * partitioning and sort — the filter between them preserves
    * distribution and order, so the plan carries a single Exchange and
    * per-key-sized state. No global window, no driver loop; at 10^12
    * change rows the cost is the one shuffle, which any SCD2 build
    * pays. Ordering inside a key is (ts, tie) with `tie` a unique
    * column, so versioning is total-order deterministic. */
  def scd2(changes: DataFrame, key: String, state: String,
      ts: String, tie: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tie))
    changes
      .withColumn("prev_state", lag(col(state), 1).over(w))
      .withColumn("rn", row_number().over(w))
      // NULL-SAFE change detect (ADVICE r7): `prev =!= state` is NULL
      // when either side is NULL, which silently drops a transition
      // INTO a NULL state and duplicates consecutive NULL states. The
      // <=> comparison treats NULL as a value; the rn === 1 guard keeps
      // each key's first row (whose lag default would otherwise
      // null-safe-equal a genuinely-NULL first state).
      .filter(col("rn") === 1 || !(col("prev_state") <=> col(state)))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .select(col(key), col(tie), col(state).as("state"),
        col(ts).as("valid_from"), col("valid_to"),
        when(col("valid_to").isNull, 1).otherwise(0).as("is_current"))
  }

  /** Incremental SCD2 maintenance: fold a NEW batch of change events
    * into an EXISTING [[scd2]] version table without rescanning the
    * source log — the nightly-merge form a warehouse actually runs.
    * Each existing version row IS a change row (its state first
    * observed at valid_from), so reopening the versions as changes,
    * unioning the batch, and re-running the [[scd2]] window pass
    * rebuilds the full table in O(|versions| + |batch|): the shared
    * (ts, tie) sort closes the previously-open interval against the
    * batch's first differing state and compacts a batch row that
    * merely repeats the open state — exactly what a full rebuild
    * would emit.
    *
    * Contract (the standard append-only CDC watermark): per key, every
    * batch row's (ts, tie) must order AFTER every row of the log the
    * existing table was built from. A LATE row landing between two
    * compacted-away historical duplicates cannot be replayed from the
    * compacted table (the duplicate that would re-open is gone) — late
    * data needs a rebuild from the retained log. Under the contract,
    * `scd2Merge(scd2(prefix), suffix) == scd2(full)` for ANY time-split
    * prefix/suffix — the property the spec replays. One key-sized
    * shuffle, same plan shape as [[scd2]]. */
  def scd2Merge(existing: DataFrame, batch: DataFrame, key: String,
      state: String, ts: String, tie: String): DataFrame = {
    val reopened = existing.select(col(key), col(tie),
      col("state").as(state), col("valid_from").as(ts))
    scd2(reopened.unionByName(
        batch.select(col(key), col(tie), col(state), col(ts))),
      key, state, ts, tie)
  }

  /** SNAPSHOT DIFF — the change-data-capture audit between two
    * versions of a keyed table ("what did this batch/backfill DO"):
    * one FULL OUTER join on the key classifies every key as added
    * (only in `b`, the new snapshot), removed (only in `a`), changed
    * or unchanged (NULL-SAFE struct compare over all non-key columns,
    * so a column going NULL counts as a change — the [[scd2]] `<=>`
    * rule), plus a per-column change profile (which columns drive the
    * churn — `changed:<col>` counts changed-or-nulled values among
    * rows present in both). Output long-format (dim, n) rows:
    * n_a, n_b, added, removed, changed, unchanged, changed:<col>….
    * CONTRACT: the key is unique within each snapshot (the
    * manifest/SCD grain) — a duplicated key would fan the outer join
    * out and double-count; enforce upstream with the q202
    * data-contract UNIQUE check.
    *
    * Scale shape: ONE key-keyed outer join (the same shuffle any
    * merge pays) feeding ONE conditional aggregate with 6 + |cols|
    * counters, then a constant-size unpivot — no second pass, no
    * row materialization of the diff. */
  def snapshotDiff(a: DataFrame, b: DataFrame, key: String): DataFrame = {
    require(a.columns.contains(key), s"'$key' missing from a")
    require(a.columns.toSet == b.columns.toSet,
      s"snapshot schemas differ: ${a.columns.toSet} vs ${b.columns.toSet}")
    val cols = a.columns.filterNot(_ == key).toSeq
    require(cols.nonEmpty, "need at least one non-key column")
    cols.foreach(c => require(c.matches("[A-Za-z0-9_]+"),
      s"column '$c' must be [A-Za-z0-9_]+ (it becomes a stack label)"))
    val aa = a.select(col(key).as("k"),
      struct(cols.map(col): _*).as("va"))
    val bb = b.select(col(key).as("k"),
      struct(cols.map(col): _*).as("vb"))
    val both = col("va").isNotNull && col("vb").isNotNull
    val aggs = Seq(
      count(col("va")).as("n_a"),
      count(col("vb")).as("n_b"),
      count(when(col("va").isNull, 1)).as("added"),
      count(when(col("vb").isNull, 1)).as("removed"),
      count(when(both && !(col("va") <=> col("vb")), 1)).as("changed"),
      count(when(both && (col("va") <=> col("vb")), 1)).as("unchanged")
    ) ++ cols.map(c => count(when(both &&
      !(col(s"va.$c") <=> col(s"vb.$c")), 1)).as(s"chg_$c"))
    val one = aa.join(bb, Seq("k"), "full_outer")
      .agg(aggs.head, aggs.tail: _*)
    val labels = Seq("n_a", "n_b", "added", "removed", "changed",
      "unchanged").map(d => s"'$d', $d") ++
      cols.map(c => s"'changed:$c', chg_$c")
    one.selectExpr(
      s"stack(${labels.size}, ${labels.mkString(", ")}) as (dim, n)")
  }
}
