package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

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
}
