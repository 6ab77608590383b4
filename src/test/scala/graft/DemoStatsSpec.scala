package graft

/** Drives the exact `--stats` CLI code path end-to-end over the
  * sf0.001 fixture: every statistic in the battery (conversion z,
  * Welch t, Mann–Whitney U, per-arm funnel) executes via show() —
  * the wiring check; each statistic's VALUES are pinned by its own
  * operator spec and oracle (q210/q241/q242/q247). */
class DemoStatsSpec extends SparkSpec {
  test("--stats mode runs the full experiment battery (CLI code path)") {
    DemoPipeline.runStats(spark, "/root/testdata/sf0.001")
  }
}
