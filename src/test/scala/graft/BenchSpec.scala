package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the slope-flag adjudication rule (the r12 k13 false positive: a
  * 35.2 s transient median published slope 45.8 while the same artifact's
  * steady-state stanza had restamped the key to 1.67 s). The sf0.01→sf0.1
  * slope section must flag from the BEST steady evidence — min of the raw
  * median, the steady restamp, and the confirmation re-run — never from a
  * transient alone.
  */
class BenchSpec extends AnyFunSuite {

  test("adjudicatedBig takes the min of median, steady restamp, confirm") {
    assert(Bench.adjudicatedBig(35.2, Some(1.67), None) === 1.67)
    assert(Bench.adjudicatedBig(35.2, None, Some(2.1)) === 2.1)
    assert(Bench.adjudicatedBig(1.2, Some(1.67), Some(2.1)) === 1.2)
    assert(Bench.adjudicatedBig(35.2, Some(1.67), Some(2.1)) === 1.67)
    // absent / failed (-1) evidence never drags the value down
    assert(Bench.adjudicatedBig(3.0, None, None) === 3.0)
    assert(Bench.adjudicatedBig(3.0, Some(-1.0), Some(-1.0)) === 3.0)
  }

  test("the r12 k13 scenario no longer flags once adjudicated") {
    val ratio = 10.0 // sf0.01 -> sf0.1
    val small = 0.77 // k13's sf0.01 time that round
    // raw transient median WOULD flag...
    assert(Bench.slopeFlagged(35.2, small, ratio))
    // ...but the steady restamp (1.67 s, slope 2.2) must not
    val eff = Bench.adjudicatedBig(35.2, Some(1.67), None)
    assert(!Bench.slopeFlagged(eff, small, ratio))
  }

  test("slopeFlagged keeps the noise floor and the 2x-ratio bar") {
    // below the 0.25 s floor: never flagged however steep
    assert(!Bench.slopeFlagged(0.2, 0.001, 10.0))
    // genuine superlinear key: still flagged after adjudication
    assert(Bench.slopeFlagged(Bench.adjudicatedBig(30.0, Some(28.0), None),
      1.0, 10.0))
    // exactly at 2x ratio: not flagged (strict >)
    assert(!Bench.slopeFlagged(20.0, 1.0, 10.0))
    // missing small-SF time (-1): never flagged
    assert(!Bench.slopeFlagged(30.0, -1.0, 10.0))
  }
}
