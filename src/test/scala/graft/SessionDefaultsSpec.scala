package graft

import org.scalatest.funsuite.AnyFunSuite

/** The scale-tier conf derivation is library surface (VERDICT r16
  * item 4): pin the per-tier values, the override semantics, and the
  * corpus probe so Bench/PlanDump/JobStats stay mere consumers. */
class SessionDefaultsSpec extends AnyFunSuite {
  import SessionDefaults._

  test("fixture tier keeps Spark defaults (pinned plan contracts depend on it)") {
    val t = tierFor(17L << 20) // sf0.1 lineitem ≈ 11 MB
    assert(t.bcastStatic == "10m")
    assert(t.bcastAdaptive == "10m")
    assert(t.fileCompressionFactor == "1.0")
  }

  test("sf10 tier: 64m thresholds, no estimate correction") {
    val t = tierFor(1L << 30)
    assert(t.bcastStatic == "64m" && t.bcastAdaptive == "64m")
    assert(t.fileCompressionFactor == "1.0")
  }

  test("sf100 tier: static 384m / adaptive 128m / compression factor 6") {
    val t = tierFor(12L << 30)
    assert(t.bcastStatic == "384m")
    assert(t.bcastAdaptive == "128m") // compressed post-shuffle bound
    assert(t.fileCompressionFactor == "6.0")
  }

  test("tier floors are exclusive (a corpus AT the floor stays below)") {
    assert(tierFor(Sf10FloorBytes).bcastStatic == "10m")
    assert(tierFor(Sf100FloorBytes).bcastStatic == "64m")
  }

  test("override semantics: static override propagates to adaptive " +
      "unless adaptive is itself overridden") {
    val t1 = tierFor(12L << 30, Some("10m"), None)
    assert(t1.bcastStatic == "10m" && t1.bcastAdaptive == "10m")
    val t2 = tierFor(12L << 30, Some("10m"), Some("256m"))
    assert(t2.bcastStatic == "10m" && t2.bcastAdaptive == "256m")
    val t3 = tierFor(12L << 30, None, Some("256m"))
    assert(t3.bcastStatic == "384m" && t3.bcastAdaptive == "256m")
    // compression-factor correction is tier-keyed, not override-keyed
    assert(t1.fileCompressionFactor == "6.0")
  }

  test("confs carry every scale-survival key and maxResultSize") {
    val keys = tierFor(0L).confs.map(_._1).toSet
    assert(keys == Set(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.sources.fileCompressionFactor",
      "spark.driver.maxResultSize"))
  }

  test("corpus probe reads the fixture's lineitem footprint") {
    val b = lineitemBytes("/root/testdata/sf0.01")
    assert(b > 0, "fixture lineitem must be found")
    assert(tierFor(b).bcastStatic == "10m", "fixtures are fixture-tier")
    assert(lineitemBytes("/nonexistent") == 0L)
  }
}
