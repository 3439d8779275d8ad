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

  test("the r13 j25 sf1.0 scenario: steady profile overrides twin transients") {
    // r13 fresh run: j25 timed 29.6 s at sf1.0 (sf0.1 median 1.43 s,
    // slope 20.76 > 20) and the single keep-min confirm ALSO read ~29 s
    // — two consecutive transients; the committed run on identical code
    // measured 2.24 s. The two-stage rule must escalate to the 3x steady
    // profile, adopt its median, and clear the flag — with both readings
    // surfaced for the artifact.
    val sf01 = 1.43
    var confirms = 0; var steadies = 0
    val (t, c, st) = Bench.adjudicateSf1(29.6, sf01,
      { confirms += 1; Some(29.3) },
      { steadies += 1; Seq(2.3, 2.2, 2.4) })
    assert(confirms === 1 && steadies === 1)
    assert(c === Some(29.3) && st === Some(2.3))
    assert(t === 2.3 && !Bench.sf1Flagged(t, sf01))
  }

  test("adjudicateSf1 pays extra runs only when cheaper evidence fails") {
    // clean key: neither thunk evaluated
    var touched = false
    val (t0, c0, s0) = Bench.adjudicateSf1(3.0, 1.0,
      { touched = true; Some(1.0) }, { touched = true; Seq(1.0) })
    assert(t0 === 3.0 && c0.isEmpty && s0.isEmpty && !touched)
    // confirm clears the flag: steady never runs
    var steadyRan = false
    val (t1, c1, s1) = Bench.adjudicateSf1(40.0, 1.0,
      Some(5.0), { steadyRan = true; Seq(1.0) })
    assert(t1 === 5.0 && c1 === Some(5.0) && s1.isEmpty && !steadyRan)
    // genuinely superlinear: survives all three stages, still flagged
    val (t2, _, s2) = Bench.adjudicateSf1(40.0, 1.0, Some(38.0),
      Seq(39.0, 37.0, 40.0))
    assert(t2 === 38.0 && s2 === Some(39.0) && Bench.sf1Flagged(t2, 1.0))
    // failed runs (-1) never drag the value down
    val (t3, c3, s3) = Bench.adjudicateSf1(40.0, 1.0, Some(-1.0),
      Seq(-1.0, -1.0))
    assert(t3 === 40.0 && c3.isEmpty && s3.isEmpty)
  }

  test("sf1Flagged keeps the 2.5 s floor and the 20x bar") {
    assert(!Bench.sf1Flagged(2.4, 0.01)) // under floor, however steep
    assert(!Bench.sf1Flagged(19.9, 1.0)) // under 20x
    assert(!Bench.sf1Flagged(20.0, 1.0)) // exactly 20x: strict >
    assert(Bench.sf1Flagged(20.1, 1.0))
    assert(!Bench.sf1Flagged(30.0, -1.0)) // missing sf0.1 time
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
