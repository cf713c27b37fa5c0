package graft

import org.scalatest.funsuite.AnyFunSuite

/** The ledger parse feeding Bench's >2× self-adjudication and the
  * OpsServer baseline endpoint: it must read every baseline-recording
  * table shape the ledger actually uses, or the adjudication silently
  * compares against stale numbers. */
class BaselinesSpec extends AnyFunSuite {

  test("parses every registry query's latest sf0.1 baseline from the real ledger") {
    val b = Baselines.parse()
    val missing = SparkEntry.queries.keySet.diff(b.keySet)
    assert(missing.isEmpty, s"registry queries without a parsed baseline: $missing")
    // the q95 split rows are board extras with their own ledger rows
    assert(b.contains("q95_index_build") && b.contains("q95_probe_only"))
    assert(b.values.forall(v => v > 0 && v < 120), "baselines must be sane seconds")
    // the r8 full re-baseline board (appended WITHOUT a header row — the
    // shape-detected case) must win over the r2g/r7 tables before it
    assert(b("q01_scan_filter") == 0.891, s"r8 re-baseline not picked up: ${b("q01_scan_filter")}")
    // q152: the r12c decade-study table's quiet sf0.1 column re-baselines
    // its nine families by the documented last-wins contract (explicit in
    // the r12g ledger note); q153 is not in that table, so its latest
    // baseline is still the r11 judge-adjudicated one
    assert(b("q152_robust_profile") == 4.08)
    assert(b("q153_dist_drift") == 0.688)
  }

  test("header variants, sf filtering, suffix rows, and last-wins") {
    val md =
      """|# test ledger
         |
         || Query | sf | sec/query (baseline) | config | recorded |
         ||---|---|---|---|---|
         || qa | 0.1 | 1.5 | `local[32]` | r1 |
         || qa | 1 | 9.9 | `local[32]` | r1 |
         |
         || Query | first baseline | r6 | r7 median-of-5 | verdict |
         ||---|---|---|---|---|
         || qa | 1.5 | 3.0 | 1.6 | noise — must NOT re-baseline |
         |
         || Query | sf0.1 s (baseline) | sf1 s | ratio | recorded |
         ||---|---|---|---|---|
         || qb | 2.25 | 4.5 | 2.0 | r2 |
         |
         || Query | before | after | |
         ||---|---|---|---|
         || qb sf0.1 | 2.25 | 0.75 | 3.0× |
         || qb sf1 | 4.5 | 1.5 | 3.0× |
         |
         || qa | 0.1 | 1.75 | `local[32]`, AQE on | r8 |
         || qa | 0.01 | 0.2 | `local[32]`, AQE on | r8 |
         |""".stripMargin
    val f = java.nio.file.Files.createTempFile("baselines_spec", ".md")
    java.nio.file.Files.writeString(f, md)
    try {
      val b = Baselines.parse(f)
      assert(b == Map("qa" -> 1.75, "qb" -> 0.75),
        s"parse mismatch: $b")
    } finally java.nio.file.Files.delete(f)
  }
}
