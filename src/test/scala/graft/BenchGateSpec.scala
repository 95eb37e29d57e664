package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench drift gate's pure logic, pinned without running Spark:
  * the baseline parser's whitespace tolerance (a json.dump'd baseline
  * once silently disabled the whole gate) and the CPU-corroboration
  * rule that separates external contention from real regressions. */
class BenchGateSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.1"
  private val compact =
    s"""{"metric":"total","value":1.0,"unit":"sec","queries":{"q1":0.5,"q2":1.25E-1},""" +
      s""""cpu_sec":{"q1":2.0,"q2":0.3},"sf":"$sf"}"""
  // json.dump-style re-serialization: ": " and ": {" separators
  private val pretty =
    s"""{"metric": "total", "value": 1.0, "queries": {"q1": 0.5, "q2": 0.125}, """ +
      s""""cpu_sec": {"q1": 2.0, "q2": 0.3}, "sf": "$sf"}"""

  test("parseSection reads the compact self-written format") {
    assert(Bench.parseSection(compact, "queries", sf) ==
      Map("q1" -> 0.5, "q2" -> 0.125))
    assert(Bench.parseSection(compact, "cpu_sec", sf) ==
      Map("q1" -> 2.0, "q2" -> 0.3))
  }

  test("parseSection tolerates a json.dump'd (': ' / ': {') baseline") {
    assert(Bench.parseSection(pretty, "queries", sf) ==
      Map("q1" -> 0.5, "q2" -> 0.125))
    assert(Bench.parseSection(pretty, "cpu_sec", sf) ==
      Map("q1" -> 2.0, "q2" -> 0.3))
  }

  test("parseSection returns empty for a different SF dir or missing section") {
    assert(Bench.parseSection(compact, "queries", "/other/sf").isEmpty)
    assert(Bench.parseSection(compact, "no_such_section", sf).isEmpty)
    assert(Bench.parseSection("", "queries", sf).isEmpty)
  }

  test("cpuCorroborated: flat CPU is contention, added CPU seconds are a regression") {
    // flat: same CPU -> not corroborated (classified contended)
    assert(!Bench.cpuCorroborated(cur = 2.0, prev = 2.0))
    // sub-second noise: 0.39 vs 0.29 is a 1.34x "ratio" but within the
    // 0.5s grace -> contention, not regression
    assert(!Bench.cpuCorroborated(cur = 0.39, prev = 0.29))
    // genuine: CPU seconds added well past ratio+grace -> regression
    assert(Bench.cpuCorroborated(cur = 10.0, prev = 3.0))
    // no usable history -> wall axis alone decides (corroborated)
    assert(Bench.cpuCorroborated(cur = 2.0, prev = -1.0))
    assert(Bench.cpuCorroborated(cur = -1.0, prev = 2.0))
  }
}
