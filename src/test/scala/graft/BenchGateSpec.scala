package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's executable regression gates WITHOUT running a bench —
  * the r17 verdict's #1: the curated-band gate must be able to FIRE, and
  * its firing rule must be weather-robust (min-of-reps, not median). Pure
  * functions, exact cases. */
class BenchGateSpec extends AnyFunSuite {

  private val curated = Seq(
    "q_hot" -> ((0.50, 2.00)),
    "q_warm" -> ((0.20, 1.00)),
    "q_skipped" -> ((0.10, 0.80)))

  test("curated gate fires when EVERY rep exceeds hi (min > hi)") {
    val mins = Map("q_hot" -> 2.31, "q_warm" -> 0.4)
    assert(Bench.curatedBandMinFailures(curated, mins) ===
      Seq(("q_hot", 2.31, 2.00)))
  }

  test("curated gate stays silent on weather: median red, min in band") {
    // the r17 shape: a loaded host inflates the median past hi but one
    // rep lands near true cost — min-gating must NOT fire (the right
    // action is a quiet-host re-run, not a red round)
    val mins = Map("q_hot" -> 1.9, "q_warm" -> 0.95)
    assert(Bench.curatedBandMinFailures(curated, mins).isEmpty)
  }

  test("curated gate ignores failed queries (min = -1) and missing ones") {
    // a query whose every rep failed is the correctness gate's finding;
    // q_skipped absent from this run is the lost-band WARNING's finding
    val mins = Map("q_hot" -> -1.0, "q_warm" -> 0.3)
    assert(Bench.curatedBandMinFailures(curated, mins).isEmpty)
  }

  test("curated gate boundary: min exactly at hi passes") {
    val mins = Map("q_hot" -> 2.00, "q_warm" -> 1.0000001)
    assert(Bench.curatedBandMinFailures(curated, mins) ===
      Seq(("q_warm", 1.0000001, 1.00)))
  }

  test("floor drift warns past 5x prior AND the absolute floor") {
    val keys = Seq("q_a", "q_b", "q_c", "q_d")
    val medians = Map(
      "q_a" -> 2.40, // 48x its prior 0.05 — the advice's exact scenario
      "q_b" -> 0.20, // 10x prior but under minAbs 0.25 — noise, no warn
      "q_c" -> 0.30, // only 1.5x prior — no warn
      "q_d" -> 0.90) // no prior record — no warn
    val prior = Map("q_a" -> 0.05, "q_b" -> 0.02, "q_c" -> 0.20)
    assert(Bench.floorDriftWarnings(keys, medians, prior) ===
      Seq(("q_a", 2.40, 0.05)))
  }

  test("floor drift never warns with empty history") {
    assert(Bench.floorDriftWarnings(Seq("q_a"), Map("q_a" -> 2.0),
      Map.empty).isEmpty)
  }

  test("prior medians parse from a bench_full.json queries map") {
    val dir = java.nio.file.Files.createTempDirectory("gate-spec")
    val f = dir.resolve("bench_full.json")
    // the shape Bench.main writes: queries first, then spread/io/bands
    // whose nested objects must NOT leak into the parsed map
    java.nio.file.Files.write(f,
      ("""{"metric":"total","value":9.9,"unit":"sec","reps":3,""" +
        """"queries":{"q_a":1.25,"q_b":0.033},""" +
        """"spread":{"q_a":{"min":1.0,"max":9.0,"runs":3}},""" +
        """"bands":{"q_a":{"lo":0.1,"hi":2.0,"median":1.25,"in_band":true}}}""")
        .getBytes("UTF-8"))
    val parsed = Bench.priorMediansFromFullRecord(f.toString)
    assert(parsed === Map("q_a" -> 1.25, "q_b" -> 0.033))
  }

  test("prior medians degrade to empty on absent or malformed files") {
    assert(Bench.priorMediansFromFullRecord("/nonexistent/x.json").isEmpty)
    val dir = java.nio.file.Files.createTempDirectory("gate-spec2")
    val f = dir.resolve("bench_full.json")
    java.nio.file.Files.write(f, "not json at all".getBytes("UTF-8"))
    assert(Bench.priorMediansFromFullRecord(f.toString).isEmpty)
  }
}
