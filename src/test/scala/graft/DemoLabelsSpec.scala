package graft

/** Drives the exact `--labels` CLI code path end-to-end over the
  * sf0.001 fixture: the whole weak-supervision audit battery (LF
  * vote, Cohen's κ, Fleiss' κ, AUC, ROC points, calibration table)
  * executes via show() — the wiring check; each statistic's VALUES
  * are pinned by its own operator spec and oracle (q254–q259). */
class DemoLabelsSpec extends SparkSpec {
  test("--labels mode runs the full label-quality battery (CLI code path)") {
    DemoPipeline.runLabels(spark, "/root/testdata/sf0.001")
  }
}
