package graft

/** Drives the exact `--experiment` CLI code path end-to-end over the
  * sf0.01 fixture: the whole experimentation ladder (fixed-horizon
  * A/B z, SPRT sequential monitor, log-rank survival comparison,
  * RMST effect size, Poisson-bootstrap CI, U-shaped attribution)
  * executes via show() — the wiring check; each rung's VALUES are
  * pinned by its own operator spec and oracle (q210, q294, q293,
  * q301, q303, q300). */
class DemoExperimentSpec extends SparkSpec {
  test("--experiment mode runs the full experimentation ladder " +
      "(CLI code path)") {
    DemoPipeline.runExperiment(spark, "/root/testdata/sf0.01")
  }
}
