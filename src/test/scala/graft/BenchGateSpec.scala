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

  test("cpuCorroborated: speed-normalized CPU cancels whole-box contention (r9 q147)") {
    // The r9 false positive verbatim: CPU 11.3 -> 25.5 s under load.
    // Unnormalized, that reads as a confirmed regression…
    assert(Bench.cpuCorroborated(cur = 25.5, prev = 11.3))
    // …but the spin probe measured the box ~2.3x slower, and the
    // deflated CPU (25.5/2.3 = 11.1) is flat -> contention.
    assert(!Bench.cpuCorroborated(cur = 25.5, prev = 11.3, speedRatio = 2.3))
    // A REAL regression survives normalization: CPU 11.3 -> 60 on a
    // 1.5x-slower box still deflates to 40 s >> 11.3*1.3+0.5.
    assert(Bench.cpuCorroborated(cur = 60.0, prev = 11.3, speedRatio = 1.5))
    // speedRatio < 1 (faster box now) never inflates: clamped to 1.
    assert(!Bench.cpuCorroborated(cur = 2.0, prev = 2.0, speedRatio = 0.5))
  }

  test("tripped: absolute +0.3s grace shields sub-second entries (r9 noise re-runs)") {
    // 0.2 s -> 0.31 s is a 1.55x ratio but only 110 ms: no trip
    assert(!Bench.tripped(v = 0.31, gate = 0.2))
    // the r9 judge-run q37 case: 0.989 vs 0.657 (4 ms over 1.5x): no trip
    assert(!Bench.tripped(v = 0.989, gate = 0.657))
    // a real multi-second regression still trips: 2 s -> 3.6 s
    assert(Bench.tripped(v = 3.6, gate = 2.0))
    // boundary: needs BOTH 1.5x and +0.3 s past it
    assert(!Bench.tripped(v = 3.2, gate = 2.0)) // 1.6x but only 3.0+0.2
    assert(Bench.tripped(v = 3.31, gate = 2.0))
    // no usable history -> no trip
    assert(!Bench.tripped(v = 5.0, gate = -1.0))
    assert(!Bench.tripped(v = -1.0, gate = 2.0))
  }

  private val quiet: String => Boolean = _ => false
  // positive during-run witness present and clean, for tests whose
  // scenarios exercise the OTHER axes
  private val witnessed: String => Boolean = _ => true
  private def ratio(r: Double): String => Double = _ => r

  test("classify: a loaded box can never confirm a regression (r9 rc=1 fix)") {
    val wallBad = Seq("q147", "q10")
    val cpuNow = Map("q147" -> 25.5, "q10" -> 15.0)
    val cpuPrev = Map("q147" -> 11.3, "q10" -> 3.0)
    // quiet box, no speed skew: both CPU-corroborated -> regressed
    assert(Bench.classify(wallBad, cpuNow, cpuPrev, ratio(1.0),
      loadHigh = false, quiet, witnessed) == ((Seq("q147", "q10"), Seq())))
    // loaded box: EVERYTHING lands contended regardless of CPU
    assert(Bench.classify(wallBad, cpuNow, cpuPrev, ratio(1.0),
      loadHigh = true, quiet, witnessed) == ((Seq(), Seq("q147", "q10"))))
    // quiet box but the probe saw a 2.3x-slower machine: q147's CPU
    // normalizes flat (contended), q10's 3x CPU still confirms
    val (reg, cont) = Bench.classify(wallBad, cpuNow, cpuPrev, ratio(2.3),
      loadHigh = false, quiet, witnessed)
    assert(reg == Seq("q10") && cont == Seq("q147"))
  }

  test("classify: a loaded TAIL entry can never be regressed (r10 q217_x10 fix)") {
    // Quiet run start (global loadHigh=false), but the entry's OWN
    // windows — first pass and retry — measured loaded: no
    // trustworthy measurement exists for it, so even a 4x CPU blow-up
    // recorded under that load cannot confirm a regression.
    val cpuNow = Map("q217_x10" -> 173.7, "q03" -> 15.0)
    val cpuPrev = Map("q217_x10" -> 40.3, "q03" -> 3.0)
    val loadedTail: String => Boolean = _ == "q217_x10"
    val (reg, cont) = Bench.classify(Seq("q217_x10", "q03"), cpuNow, cpuPrev,
      ratio(1.0), loadHigh = false, loadedTail, witnessed)
    // q217_x10 -> contended despite corroborating CPU; the genuinely
    // quiet q03 regression is still caught
    assert(reg == Seq("q03") && cont == Seq("q217_x10"))
  }

  test("classify replaying BENCH_r10's recorded numbers lands q217_x10 contended") {
    // The artifact's own fields, verbatim: wall 9.80 s vs gate 4.22
    // (tripped), CPU 173.7 vs 40.3, start loadavg 3.44 (global gate
    // quiet), entry_loadavg 25.21 on a 32-core box (threshold 8).
    val entryLoadavg = Map("q217_x10" -> 25.21)
    val entryLoadHigh: String => Boolean =
      k => entryLoadavg.getOrElse(k, 0.0) > 32.0 / 4.0
    val (reg, cont) = Bench.classify(Seq("q217_x10"),
      Map("q217_x10" -> 173.7), Map("q217_x10" -> 40.3),
      ratio(1.281), loadHigh = false, entryLoadHigh, witnessed)
    assert(reg.isEmpty && cont == Seq("q217_x10"))
  }

  test("classify: retry-time probe deflates a tail-contention CPU blow-up") {
    // Same r10 shape but suppose only the FIRST pass was loaded (the
    // retry ran quiet, so entryLoadHigh=false): the probe re-run next
    // to the retry measured the box ~5x slower, and 173.7/5.3 = 32.8
    // deflates BELOW the 40.3 baseline — not corroborated, contended.
    // The start-time ratio (1.281) alone would have called it
    // regressed; this is exactly the r10 false rc=1.
    val cpu = Map("q217_x10" -> 173.7); val prev = Map("q217_x10" -> 40.3)
    assert(Bench.classify(Seq("q217_x10"), cpu, prev, ratio(1.281),
      loadHigh = false, quiet, witnessed) == ((Seq("q217_x10"), Seq())))
    assert(Bench.classify(Seq("q217_x10"), cpu, prev, ratio(5.3),
      loadHigh = false, quiet, witnessed) == ((Seq(), Seq("q217_x10"))))
  }

  test("classify replaying BENCH_r11's recorded numbers lands q150_x10 contended") {
    // The fourth consecutive false rc=1, replayed from the artifact:
    // wall 14.58 vs gate 7.11 (2.05x, tripped twice), CPU 293.51 vs
    // baseline 127.2 (corroborates even at ratio 1.3), entry started
    // at loadavg 6.22 (< 8 threshold -> entryLoadHigh false), retry
    // probe 0.306 vs baseline 0.379 (a quiet GAP -> ratio clamps to
    // 1.0). Every between-runs witness read quiet; only a DURING-run
    // witness can see the SMT/bandwidth sharing that inflated both
    // axes. r11's artifact has no conc_probe history -> no positive
    // quiet witness -> contended, rc=0.
    val noWitness: String => Boolean = _ => false
    val (reg, cont) = Bench.classify(Seq("q150_x10"),
      Map("q150_x10" -> 293.51), Map("q150_x10" -> 127.2),
      ratio(1.0), loadHigh = false, quiet, noWitness)
    assert(reg.isEmpty && cont == Seq("q150_x10"))
    // With history, the same numbers under a VERIFIED-quiet during-run
    // witness are a double-confirmed real regression: rc=1 is still
    // reachable once the witness exists.
    val (reg2, cont2) = Bench.classify(Seq("q150_x10"),
      Map("q150_x10" -> 293.51), Map("q150_x10" -> 127.2),
      ratio(1.0), loadHigh = false, quiet, witnessed)
    assert(reg2 == Seq("q150_x10") && cont2.isEmpty)
    // And a during-run witness reading 2.3x-slow deflates the CPU
    // blow-up flat (293.51/2.3 = 127.6 ~ baseline) even if the quiet
    // gate were (mis)judged true: belt and braces.
    val (reg3, cont3) = Bench.classify(Seq("q150_x10"),
      Map("q150_x10" -> 293.51), Map("q150_x10" -> 127.2),
      ratio(2.3), loadHigh = false, quiet, witnessed)
    assert(reg3.isEmpty && cont3 == Seq("q150_x10"))
  }

  test("windowLoaded: flat threshold plus entry-width oversubscription") {
    val cpus = 32.0; val thr = cpus / 4
    // flat test unchanged: load 9 > 8 is loaded even for a 1-wide entry
    assert(Bench.windowLoaded(9.0, thr, 1.0, cpus))
    assert(!Bench.windowLoaded(6.0, thr, 1.0, cpus))
    // width-aware: loadavg 6 saturates a 28-core-wide entry (6+28>32)
    assert(Bench.windowLoaded(6.0, thr, 28.0, cpus))
    // …but not an 18-core one (6+18<32)
    assert(!Bench.windowLoaded(6.0, thr, 18.0, cpus))
    // no baseline width (-1): flat test alone
    assert(!Bench.windowLoaded(6.0, thr, -1.0, cpus))
    // unknown load (-1): not loaded (evidence absent, handled upstream)
    assert(!Bench.windowLoaded(-1.0, thr, 28.0, cpus))
  }

  test("gateCarry: a regressed/contended verdict never raises the gate") {
    // clean entry: its measurement becomes the gate (down or up)
    assert(Bench.gateCarry(5.0, 7.11, suspect = false) == 5.0)
    assert(Bench.gateCarry(9.0, 7.11, suspect = false) == 9.0)
    // suspect entry: prior clean gate carries forward — the r11
    // pollution (14.58 recorded over 7.11) is impossible
    assert(Bench.gateCarry(14.58, 7.11, suspect = true) == 7.11)
    // suspect but FASTER than the old gate: the better number wins
    assert(Bench.gateCarry(6.0, 7.11, suspect = true) == 6.0)
    // suspect with no history: the measurement is all there is
    assert(Bench.gateCarry(14.58, -1.0, suspect = true) == 14.58)
  }

  test("windowLoaded: busy margin — a settled box is quiet at EVERY width (ADVICE r13)") {
    val cpus = 32.0; val thr = cpus / 4
    // pre-r14 hole: a full-width (32) entry read "loaded" at ANY
    // load1 > 0, so its regressions were unconfirmable forever. With
    // the max(1, cpus/16)=2.0 margin a settled box reads quiet…
    assert(!Bench.windowLoaded(0.4, thr, 32.0, cpus))
    assert(!Bench.windowLoaded(1.9, thr, 32.0, cpus))
    // …while real residual load still reads loaded for a wide entry
    assert(Bench.windowLoaded(2.5, thr, 32.0, cpus))
    assert(Bench.windowLoaded(6.22, thr, 32.0, cpus))
  }

  test("peakWidth: bursty plans count as full-width, narrow ones as themselves") {
    // r12 q266 baseline: cpu 14.81 / wall 3.758 = 3.94 average — but
    // the plan bursts all 32 threads during its scan stages, so load
    // competes with 32, not 4
    assert(Bench.peakWidth(14.81, 3.758, 32.0) == 32.0)
    // genuinely narrow entry (cpu/wall 1.5): its own width
    assert(Bench.peakWidth(3.0, 2.0, 32.0) == 1.5)
    // no baseline: -1 (flat threshold test alone)
    assert(Bench.peakWidth(-1.0, 2.0, 32.0) == -1.0)
    assert(Bench.peakWidth(3.0, -1.0, 32.0) == -1.0)
  }

  test("smtCoupled: CPU inflating disproportionately more than wall is contention") {
    // r10 q217_x10 verbatim: wall 9.80 vs 4.22 (2.32x), CPU 173.7 vs
    // 40.3 (4.31x) — CPU inflated 1.86x MORE than wall: only slower
    // cycles do that; more work inflates both together
    assert(Bench.smtCoupled(9.80, 4.22, 173.7, 40.3))
    // a genuine 2x regression: both axes together -> NOT the signature
    assert(!Bench.smtCoupled(4.0, 2.0, 20.0, 10.0))
    // r12 q266 (wall 1.62x, cpu 1.91x): coupled within the bound ->
    // not this signature (that case is caught by peak-width loading)
    assert(!Bench.smtCoupled(6.09, 3.758, 28.255, 14.81))
    // missing evidence on any axis -> false (other rules decide)
    assert(!Bench.smtCoupled(-1.0, 4.22, 173.7, 40.3))
    assert(!Bench.smtCoupled(9.8, 4.22, 173.7, -1.0))
  }

  test("classify replaying BENCH_r12's recorded numbers lands q266 contended") {
    // The fifth false rc=1, replayed from the artifact verbatim: wall
    // 6.09 vs gate 3.758 (1.62x, tripped), CPU 28.255 vs 14.81
    // (corroborates), entry_loadavg_pre 12.03 / post 6.22, retry at
    // loadavg ~6.89, conc witness 0.021 vs gate 0.02 (read quiet —
    // the one-thread probe found an idle core). Peak width: baseline
    // cpu/wall 3.94 > 2 -> full-width 32 -> every window (12.03,
    // 6.22, 6.89) is past the 2.0 margin and oversubscribes -> the
    // entry has no trustworthy measurement -> contended, rc=0.
    val w = Bench.peakWidth(14.81, 3.758, 32.0)
    val thr = 8.0
    val firstPassLoaded = Bench.windowLoaded(12.03, thr, w, 32.0) &&
      Bench.windowLoaded(6.22, thr, w, 32.0)
    val retryLoaded = Bench.windowLoaded(6.89, thr, w, 32.0) &&
      Bench.windowLoaded(6.89, thr, w, 32.0)
    assert(firstPassLoaded && retryLoaded)
    val entryLoadHigh: String => Boolean = _ => firstPassLoaded && retryLoaded
    val (reg, cont) = Bench.classify(Seq("q266_curation_v6"),
      Map("q266_curation_v6" -> 28.255), Map("q266_curation_v6" -> 14.81),
      ratio(1.05), loadHigh = false, entryLoadHigh, witnessed,
      smtSignature = k => Bench.smtCoupled(6.09, 3.758, 28.255, 14.81))
    assert(reg.isEmpty && cont == Seq("q266_curation_v6"))
  }

  test("a genuine 2x regression on a settled box still trips rc=1 after round 14") {
    // Synthetic full-width entry, genuinely regressed: wall 3.0 vs
    // gate 1.5 (2x), CPU 40 vs 20 (2x — coupled, NOT the SMT shape),
    // first pass under the bench's own drain (load 5) but the
    // DEFERRED retry on a settled box (load 0.6 < margin 2.0): the
    // retry window is quiet at full width, the during-run witness is
    // quiet, no signature fires -> regressed.
    val w = Bench.peakWidth(40.0, 2.0, 32.0) // full-width plan
    assert(w == 32.0)
    val firstPassLoaded = Bench.windowLoaded(5.0, 8.0, w, 32.0)
    val retryLoaded = Bench.windowLoaded(0.6, 8.0, w, 32.0)
    assert(firstPassLoaded && !retryLoaded)
    val entryLoadHigh: String => Boolean = _ => firstPassLoaded && retryLoaded
    val (reg, cont) = Bench.classify(Seq("qX"),
      Map("qX" -> 40.0), Map("qX" -> 20.0),
      ratio(1.0), loadHigh = false, entryLoadHigh, witnessed,
      smtSignature = _ => Bench.smtCoupled(3.0, 1.5, 40.0, 20.0))
    assert(reg == Seq("qX") && cont.isEmpty)
  }

  test("ConcProbe samples concurrently, reports a median, and meters its own CPU") {
    val probe = new Bench.ConcProbe().start()
    Thread.sleep(1500) // the "entry": long enough for >3 samples
    val (med, cpu) = probe.finish()
    assert(med > 0, s"expected >=3 samples in 1.5s, got median $med")
    assert(med < 1.0) // one small kernel iteration is well under a second
    assert(cpu > 0 && cpu < 5.0) // the probe's own CPU is metered
    // a too-short window yields no median (-1) — upstream treats that
    // as "no trustworthy witness", never as quiet
    val short = new Bench.ConcProbe().start()
    val (medShort, _) = short.finish()
    assert(medShort == -1.0 || medShort > 0)
  }

  test("remeasureVerdict replaying BENCH_r16: the false rc=1 cannot recur") {
    import Bench.remeasureVerdict
    // r16's recorded numbers: q27_minhash_neardup measured 4.16 vs
    // gate 1.23 on a box at loadavg 4.29→17.9 (cpus=32, threshold 8).
    // The judge's quiet re-run measured 1.38 — under the trip line
    // (1.23*1.5+0.3 = 2.145). With the quiet re-measure that wall
    // RECOVERS the entry instead of shipping rc=1:
    assert(remeasureVerdict(wall = 1.38, gate = 1.23, postLoad = 1.0,
      loadThreshold = 8.0, concNow = 0.025, concGate = 0.025) == "recovered")
    // same for q217: judge 2.23 vs gate 2.16 (trip line 3.54)
    assert(remeasureVerdict(2.23, 2.16, 1.0, 8.0, 0.025, 0.025) == "recovered")
    // had the re-measure itself run on a still-loaded box (r16's
    // actual situation all round), the verdict is UNCONFIRMED —
    // parked contended, named, never rc=1
    assert(remeasureVerdict(4.16, 1.23, 12.0, 8.0, 0.025, 0.025) == "unconfirmed")
    // no clean during-run witness (probe inflated vs reference, or
    // no reference at all) → unconfirmed even at low loadavg
    assert(remeasureVerdict(4.16, 1.23, 1.0, 8.0, 0.040, 0.025) == "unconfirmed")
    assert(remeasureVerdict(4.16, 1.23, 1.0, 8.0, 0.025, -1.0) == "unconfirmed")
    // a GENUINE regression still trips: quiet window, wall past the line
    assert(remeasureVerdict(4.16, 1.23, 1.0, 8.0, 0.025, 0.025) == "confirmed")
    // a runner that dies on the re-run is not exculpatory
    assert(remeasureVerdict(-1.0, 1.23, 1.0, 8.0, 0.025, 0.025) == "regressed")
  }

  test("remeasureVerdict replaying BENCH_r17: residual drain cannot confirm") {
    import Bench.remeasureVerdict
    // r17's false confirm: q49_dup_components re-measured 4.353 s vs
    // gate 1.74 while the box was still draining — its ConcProbe read
    // 0.029 vs gate 0.024 (1.21×), inside the old 1.25×+5 ms bound
    // (the absolute slack dominates at ~25 ms medians). The
    // re-measure's tightened 1.15×+1 ms bar parks it unconfirmed:
    assert(remeasureVerdict(wall = 4.353, gate = 1.74, postLoad = 1.56,
      loadThreshold = 8.0, concNow = 0.029, concGate = 0.024) == "unconfirmed")
    // q68_curation_v2, same round, same shape (2.334 vs gate 1.303)
    assert(remeasureVerdict(2.334, 1.303, 1.56, 8.0, 0.029, 0.024)
      == "unconfirmed")
    // the judge's genuinely quiet twin walls RECOVER (q49 2.39 under
    // trip line 2.91; q68 1.81 under 2.25) with a clean witness
    assert(remeasureVerdict(2.39, 1.74, 1.0, 8.0, 0.024, 0.024) == "recovered")
    assert(remeasureVerdict(1.81, 1.303, 1.0, 8.0, 0.024, 0.024) == "recovered")
    // the after-sample bound is now margin + the entry's own burst
    // EMA: a wide 2×4.35 s re-run may leave ~4.3 of its own load
    // (32·(1−e^(−8.7/60))) — external load beyond that parks it
    val bound = 2.0 + Bench.ownBurstLoad(32.0, 32.0, 8.7)
    assert(bound > 6.0 && bound < 6.6, bound.toString)
    assert(remeasureVerdict(4.353, 1.74, bound + 0.5, bound, 0.020, 0.024)
      == "unconfirmed")
    // ownBurstLoad stays TIGHT for short/narrow entries
    assert(Bench.ownBurstLoad(2.0, 32.0, 1.0) < 0.04)
    assert(Bench.ownBurstLoad(-1.0, 32.0, 0.5) < 0.27) // no baseline: full width
  }

  test("remeasureVerdict replaying BENCH_r18: external load in the " +
      "pre-window cannot confirm") {
    import Bench.remeasureVerdict
    // r18's false confirm (the SIXTH loaded-box round): q289 min-of-2
    // re-measured 2.472 s vs gate 1.253 (trip 2.179) with the
    // pre-window at loadavg ~1.7 — pure EXTERNAL load (the entry's
    // own burst hadn't run yet), which passed the old busy margin
    // (cpus/16 = 2.0). The quiet truth was 1.41 s = 1.13× gate. The
    // confirming verdict now demands preLoad ≤ ~0.5 runnable threads:
    assert(remeasureVerdict(wall = 2.472, gate = 1.253, postLoad = 1.83,
      loadThreshold = 4.5, concNow = 0.024, concGate = 0.024,
      preLoad = 1.7) == "unconfirmed")
    // even with a quiet pre-window, two DISAGREEING attempts (>15%)
    // park the entry — drain inflation is unstable run-to-run, a
    // real regression reproduces tightly
    assert(remeasureVerdict(2.472, 1.253, 1.0, 4.5, 0.024, 0.024,
      preLoad = 0.3, attemptsAgree = false) == "unconfirmed")
    // the judge's quiet wall RECOVERS the entry (1.41 < trip 2.179)
    assert(remeasureVerdict(1.41, 1.253, 1.0, 4.5, 0.024, 0.024,
      preLoad = 0.3) == "recovered")
    // a genuine regression — quiet pre-window, agreeing attempts,
    // clean witness, wall past the line — still confirms
    assert(remeasureVerdict(2.9, 1.253, 1.0, 4.5, 0.024, 0.024,
      preLoad = 0.3) == "confirmed")
    // recovery does NOT require the tight pre-window: a wall under
    // the trip line despite residual load is still exculpatory
    assert(remeasureVerdict(1.41, 1.253, 1.0, 4.5, 0.024, 0.024,
      preLoad = 1.7) == "recovered")
  }

  test("gateCarry: a loaded pre-window never raises a gate, never births one") {
    // r17 item 5b: non-suspect entries measured under load ratcheted
    // gates upward (q27_x10 8.25→11.29 while the quiet truth was
    // 4.78). A loaded window now carries min(v, prevGate)…
    assert(Bench.gateCarry(11.29, 8.25, suspect = false, loadedWindow = true)
      == 8.25)
    // …still lets a FASTER loaded measurement improve the gate…
    assert(Bench.gateCarry(7.0, 8.25, suspect = false, loadedWindow = true)
      == 7.0)
    // …and a first-time entry under load gets NO gate (q344's
    // first-ever gate was 134.7 s of fixture generation + load; the
    // quiet truth was ~10.7 — gates are only born in quiet windows)
    assert(Bench.gateCarry(134.698, -1.0, suspect = false,
      loadedWindow = true) == -1.0)
    // quiet windows keep the round-12 behavior exactly
    assert(Bench.gateCarry(9.0, 7.11, suspect = false) == 9.0)
    assert(Bench.gateCarry(5.0, 7.11, suspect = false) == 5.0)
  }
}
