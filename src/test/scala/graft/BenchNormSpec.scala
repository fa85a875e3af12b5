package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the ambient-normalization math ([[BenchNorm]]) — the derivation
  * behind every `rps_norm` / `normalized_rps` / `stream_rps_norm`
  * number in the bench artifacts. The r16 change under test: the
  * denominator is the RUN-RELATIVE idle-probe baseline (median of the
  * run's own probes, capped at the absolute pin), not the absolute
  * 0.30 s pin — on a fast host the pin clamped every correction to a
  * no-op exactly when contention was visibly recorded (r15: idle
  * probes ~0.09 s, contention chunks 0.14–0.27 s, all under the pin;
  * 4 of 5 byte-identical runs read under the serving floor). */
class BenchNormSpec extends AnyFunSuite with Matchers {

  test("baseline is the true median of positive probes, capped at the pin") {
    // odd count: middle element
    BenchNorm.runBaseline(Seq(0.09, 0.08, 0.10)) shouldBe 0.09 +- 1e-12
    // even count: TRUE median (average of the two middle elements),
    // not the upper-middle — a bimodal probe pair must not bias high
    BenchNorm.runBaseline(Seq(0.08, 0.12)) shouldBe 0.10 +- 1e-12
    // failed probes (<= 0) are excluded, not treated as fast readings
    BenchNorm.runBaseline(Seq(-1.0, 0.0, 0.09)) shouldBe 0.09 +- 1e-12
    // capped at the absolute pin: a run contended END TO END still
    // normalizes against the reference idle level, not its own
    // contended median
    BenchNorm.runBaseline(Seq(0.40, 0.45, 0.42)) shouldBe
      BenchNorm.ReferenceCalibSec +- 1e-12
    // no usable probe at all: fall back to the pin
    BenchNorm.runBaseline(Nil) shouldBe BenchNorm.ReferenceCalibSec
    BenchNorm.runBaseline(Seq(-1.0)) shouldBe BenchNorm.ReferenceCalibSec
  }

  test("a minority contention phase does not drag the baseline up") {
    // 6 idle probes at ~0.09, 2 contention probes — the median stays
    // at the idle level, so the contended chunks correct against it
    val probes = Seq(0.09, 0.088, 0.091, 0.09, 0.089, 0.092, 0.27, 0.21)
    BenchNorm.runBaseline(probes) shouldBe 0.0905 +- 1e-9
  }

  test("ratio clamps at 1 (never deflate) and corrects up under load") {
    // probe faster than baseline = host burst speed, NOT a correction
    BenchNorm.ratio(0.05, 0.09) shouldBe 1.0
    // probe at baseline: no contention, no correction
    BenchNorm.ratio(0.09, 0.09) shouldBe 1.0 +- 1e-12
    // probe 3x the baseline: the section starved ~3x, correct up 3x
    BenchNorm.ratio(0.27, 0.09) shouldBe 3.0 +- 1e-12
    // failed probe: unmeasured point keeps its raw wall
    BenchNorm.ratio(-1.0, 0.09) shouldBe 1.0
    BenchNorm.ratio(0.0, 0.09) shouldBe 1.0
  }

  test("the r15 scenario: visible contention under the absolute pin now corrects") {
    // r15's committed run: idle chunks probed ~0.09 s, contention
    // chunks 0.14-0.27 s — ALL under the 0.30 pin, so the old
    // absolute-pin derivation clamped every ratio to 1 and the
    // normalized number equaled the raw one.
    val chunkSec = Seq(1.0, 1.0, 3.0) // the third chunk ran 3x slow
    val chunkRows = Seq(1000L, 1000L, 1000L)
    val chunkCalib = Seq(0.09, 0.09, 0.27) // ...and its probe read 3x
    val oldStyle = BenchNorm.perChunkRpsNorm(
      chunkSec, chunkRows, chunkCalib, BenchNorm.ReferenceCalibSec).get
    oldStyle shouldBe 3000.0 / 5.0 +- 1e-9 // clamped: no correction
    // run-relative: baseline = 0.09, the slow chunk's wall deflates by
    // its own 3x ratio -> 1 + 1 + 1 normalized seconds
    val base = BenchNorm.runBaseline(chunkCalib)
    base shouldBe 0.09 +- 1e-12
    val norm = BenchNorm.perChunkRpsNorm(
      chunkSec, chunkRows, chunkCalib, base).get
    norm shouldBe 1000.0 +- 1e-9
  }

  test("a slow chunk under a quiet probe stays slow (code, not environment)") {
    val norm = BenchNorm.perChunkRpsNorm(
      Seq(1.0, 1.0, 3.0), Seq(1000L, 1000L, 1000L),
      Seq(0.09, 0.09, 0.09), 0.09).get
    norm shouldBe 3000.0 / 5.0 +- 1e-9
  }

  test("per-chunk record absent or inconsistent falls back to the pre-section probe") {
    BenchNorm.perChunkRpsNorm(Seq(1.0), Seq(10L), Nil, 0.09) shouldBe None
    BenchNorm.perChunkRpsNorm(Seq(1.0, 2.0), Seq(10L), Seq(0.1, 0.1), 0.09) shouldBe None
    // fallback path: section rps x the one pre-section probe's ratio
    BenchNorm.sectionRpsNorm(500.0, 0.18, Nil, Nil, Nil, 0.09) shouldBe
      1000.0 +- 1e-9
    // no probe at all: 0 marks "no normalized reading", never a guess
    BenchNorm.sectionRpsNorm(500.0, -1.0, Nil, Nil, Nil, 0.09) shouldBe 0.0
  }

  test("chunks whose probe failed keep their raw wall inside the sum") {
    val norm = BenchNorm.perChunkRpsNorm(
      Seq(1.0, 2.0), Seq(1000L, 1000L), Seq(0.18, -1.0), 0.09).get
    // first chunk deflates 2x (0.5s), second keeps its raw 2s
    norm shouldBe 2000.0 / 2.5 +- 1e-9
  }
}
