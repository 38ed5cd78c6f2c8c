package graft

import org.scalatest.funsuite.AnyFunSuite

/** Synthetic-burst pins for [[Bench.burstAdopts]] — the per-key
  * adoption rule that closes the hole the median regime stamp
  * leaves (BENCH_r15: a mid-sweep burst ran the graph family 8-13x
  * inflated at byte-identical shuffles while the stamp read 0.993).
  */
class BenchAdoptionSpec extends AnyFunSuite {
  test("the r15 burst signature adopts: >2x collapse at identical bytes") {
    // g02's measured figures from BENCH_r15's own recheck block
    assert(Bench.burstAdopts(44.95, 5.14, 123456789L, 123456789L))
    assert(Bench.burstAdopts(36.2, 3.8, 42L, 42L))
  }

  test("mild inflation does NOT adopt: the 2x bar separates regime " +
    "from same-day variance") {
    assert(!Bench.burstAdopts(6.0, 5.0, 42L, 42L))
    assert(!Bench.burstAdopts(10.0, 5.0, 42L, 42L), "exactly 2x stays")
  }

  test("byte drift does NOT adopt even at huge inflation — a plan " +
    "change must stand in the map") {
    assert(!Bench.burstAdopts(44.95, 5.14, 123456789L, 99999999L))
    assert(!Bench.burstAdopts(100.0, 1.0, 1L, 2L))
  }
}
