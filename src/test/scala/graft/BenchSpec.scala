package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench pass accounting (`Bench.classifyPass`) — the pure decision of
  * whether a measured pass is RECORDED (enters best + passesDone) and
  * whether the query is done after it. The invariant under test: a
  * fixture-contaminated pass with a clean pass still available is
  * discarded — it measured one-time construction, not the query — and
  * must therefore not count toward the summary's `passes` (a budget trip
  * that leaves only the contaminated number must read as truncation).
  */
class BenchSpec extends AnyFunSuite {
  private val fastS = 0.4
  private val heavyS = 2.0
  private def c(pass: Int, sec: Double, builtFixture: Boolean, runs: Int = 2) =
    Bench.classifyPass(pass, runs, sec, builtFixture, fastS, heavyS)

  test("contaminated first pass of a mid-band row is DISCARDED, clean second pass records") {
    val first = c(pass = 1, sec = 1.0, builtFixture = true)
    assert(!first.record, "fixture-contaminated pass must not be recorded")
    assert(!first.onePass, "a discarded pass cannot finish the query")
    val second = c(pass = 2, sec = 0.8, builtFixture = false)
    assert(second.record && !second.onePass)
  }

  test("fast path: first pass under fastS records ONCE even when it built the fixture") {
    val o = c(pass = 1, sec = 0.1, builtFixture = true)
    assert(o.record && o.onePass && o.fastPath,
      "construction under fastS is within the threshold's own error bound")
  }

  test("heavy path: one pass only when the first pass is CLEAN") {
    val clean = c(pass = 1, sec = 5.0, builtFixture = false)
    assert(clean.record && clean.onePass && !clean.fastPath)
    // a fixture-backed heavy row keeps its second (clean) pass
    val dirty = c(pass = 1, sec = 5.0, builtFixture = true)
    assert(!dirty.record && !dirty.onePass)
    val dirtySecond = c(pass = 2, sec = 4.0, builtFixture = false)
    assert(dirtySecond.record && !dirtySecond.onePass)
  }

  test("mid-band clean passes record and run to the configured count") {
    (1 to 3).foreach { p =>
      val o = c(pass = p, sec = 1.0, builtFixture = false, runs = 3)
      assert(o.record && !o.onePass, s"pass $p")
    }
  }

  test("rotation round index comes from round NUMBERS, gap-tolerant") {
    // the committed ledger's real shape: r07 missing. Count-keyed logic
    // would say 16 files → idx 16; number-keyed says max(r17 ledger)=16 →
    // next round is 17. A gapped list must not offset parity.
    val gapped = (1 to 16).filter(_ != 7).map(n => f"BENCH_r$n%02d.json")
    assert(Bench.rotationRoundIdx(gapped) == 17)
    // a round that failed to commit its bench file changes NOTHING the
    // next time: idx still derives from the max that did land
    assert(Bench.rotationRoundIdx(gapped.filterNot(_.contains("16"))) == 16)
    assert(Bench.rotationRoundIdx(Seq.empty) == 1, "fresh repo measures round 1")
    // unpadded + unrelated names
    assert(Bench.rotationRoundIdx(Seq("BENCH_r9.json", "CORRECTNESS_r12.json",
      "notes.txt")) == 10)
  }

  test("final pass records even if contaminated — no clean pass will exist") {
    // builtFixture on the LAST configured pass: discarding would lose the
    // query entirely, so it records (pass == max(runs,1) disables discard)
    val o = c(pass = 2, sec = 1.0, builtFixture = true, runs = 2)
    assert(o.record)
    val single = c(pass = 1, sec = 1.0, builtFixture = true, runs = 1)
    assert(single.record, "runs=1 has no clean pass to wait for")
  }
}
