package graft

/** Drives the exact `--linkage` CLI code path end-to-end over the
  * sf0.01 fixture (sf0.001 has no candidate pairs under the fine
  * composite block): the whole record-linkage ladder (block audit,
  * field weights, pair scoring, tf rescoring, evidence waterfall,
  * EM, entity clustering) executes via show() — the wiring check;
  * each rung's VALUES are pinned by its own operator spec and oracle
  * (q275–q276, q279–q280, q282, q284, q291). */
class DemoLinkageSpec extends SparkSpec {
  test("--linkage mode runs the full record-linkage ladder " +
      "(CLI code path)") {
    DemoPipeline.runLinkage(spark, "/root/testdata/sf0.01")
  }
}
