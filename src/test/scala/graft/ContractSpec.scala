package graft

/** Self-test of the driver harness contract (the conditions the driver
  * checks before any query runs — fail here, not in the round). */
class ContractSpec extends SparkSpec {

  test("entry() returns rows on sf0.001 (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query, names are well-formed") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert((os -- qs).isEmpty, s"oracles without queries: ${os -- qs}")
    assert(qs.forall(_.matches("q\\d{2,3}_[a-z0-9_]+")), qs)
    val unoracled = qs -- os
    // Since r6 every query carries an oracle: the four approximate ops
    // (q19 HLL, q40 simhash, q43 LSH-ANN, q53 IVF) emit in-query
    // exactness-bound summaries instead of raw sketch values.
    assert(unoracled.isEmpty, s"unexpected rows-only set: $unoracled")
  }

  test("every query runs and returns a non-empty result at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          if (fn(spark, "/root/testdata/sf0.001").count() == 0) Some(s"$name: 0 rows")
          else None
        } catch { case e: Exception => Some(s"$name: ${e.getMessage.take(80)}") }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }
}
