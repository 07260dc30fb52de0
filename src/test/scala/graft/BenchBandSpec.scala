package graft

import org.scalatest.funsuite.AnyFunSuite

/** The band guard's contract (r13 verdict #1), tested without a Spark
  * session: a reading beyond BandFactor× its committed band buys one
  * confirming re-run, both readings land in `out_of_band`, and the final
  * reading is the min over all runs. The bands file itself is pinned
  * loadable and median-robust against the r13 outliers.
  */
class BenchBandSpec extends AnyFunSuite {

  test("bands resource loads and the r13 outlier keys carry sane medians") {
    val b = Bench.bands
    assert(b.size > 300, s"bands too small: ${b.size}")
    // the two keys BENCH_r13.json shipped as unattributable outliers —
    // the committed band must be the cross-round median, not the outlier
    assert(b("q_substring_trim_exact") < 20.0,
      s"trim_exact band poisoned: ${b("q_substring_trim_exact")}")
    assert(b("d22_incr_near_dup_10x") < 25.0,
      s"d22 band poisoned: ${b("d22_incr_near_dup_10x")}")
    // both scale sides present for a d-series key
    assert(b.contains("d1_dedup_corpus_1x") && b.contains("d1_dedup_corpus_10x"))
  }

  test("in-band readings pass through untouched, no re-run") {
    Bench.outOfBand.clear()
    var reran = false
    val band = Bench.bands("q_wordcount")
    val r = Bench.bandGuarded("q_wordcount", Seq(band * 1.5, band * 1.8),
      () => { reran = true; Some(0.0) })
    assert(r == band * 1.5 && !reran && Bench.outOfBand.isEmpty)
  }

  test("out-of-band reading re-runs once; both readings recorded; min wins") {
    Bench.outOfBand.clear()
    val band = Bench.bands("q_wordcount")
    // drift-window shape: first reading 5x band, confirming run in band
    val r = Bench.bandGuarded("q_wordcount", Seq(band * 5.0),
      () => Some(band * 0.9))
    assert(r == band * 0.9)
    assert(Bench.outOfBand("q_wordcount") == Seq(band * 5.0, band * 0.9))
    // regression shape: the confirming run agrees — both recorded, the
    // (still out-of-band) min stands
    Bench.outOfBand.clear()
    val r2 = Bench.bandGuarded("q_wordcount", Seq(band * 5.0),
      () => Some(band * 4.8))
    assert(r2 == band * 4.8)
    assert(Bench.outOfBand("q_wordcount") == Seq(band * 5.0, band * 4.8))
  }

  test("failed re-run keeps the original reading, still flagged") {
    Bench.outOfBand.clear()
    val band = Bench.bands("q_wordcount")
    val r = Bench.bandGuarded("q_wordcount", Seq(band * 5.0), () => None)
    assert(r == band * 5.0)
    assert(Bench.outOfBand("q_wordcount") == Seq(band * 5.0))
  }

  test("unknown key (new query this round) skips the guard") {
    Bench.outOfBand.clear()
    var reran = false
    val r = Bench.bandGuarded("q_definitely_new", Seq(1e9),
      () => { reran = true; Some(0.0) })
    assert(r == 1e9 && !reran && Bench.outOfBand.isEmpty)
  }
}
