package graft

/** The bench's ambient-normalization math, factored out of [[Bench]] so
  * the derivation is spec-pinned (BenchNormSpec) and reproducible from
  * the artifact alone.
  *
  * Model: the constant-work calibration probe ([[Bench.calibrate]])
  * measures CPU availability at a sample point. Under host contention
  * the probe and a measured section starve by roughly the same factor,
  * so `measured_rps × (probe / idle_baseline)` is the contention-
  * corrected throughput. Two standing rules:
  *
  *   - **Never deflate** (r13): a probe FASTER than the baseline
  *     measures host burst-speed, which a stream section's fixed
  *     per-batch costs don't inherit — every ratio is clamped at 1, so
  *     normalized = measured, or corrected UP under measured load.
  *   - **Run-relative baseline** (r16, replacing the absolute 0.30 s
  *     pin as the denominator): the pin was anchored to the round-8
  *     host class, and on faster hosts it clamps the correction to a
  *     no-op exactly when it's needed — r15's committed run recorded
  *     idle probes ~0.09 s and contention-phase chunk probes
  *     0.14–0.27 s, ALL under the pin, so visible contention was never
  *     corrected and the SCALE.md floors generated host-phase fire
  *     drills (search under-floor in 4 of 5 byte-identical runs). The
  *     baseline is now the run's OWN idle-probe level: the median of
  *     every probe the run recorded, capped at the absolute pin.
  *     Median, because the probe is bimodal with JIT/heap state
  *     (0.06–0.45 s observed for the same work in one process) and a
  *     minority contention phase must not drag the estimate up; capped
  *     at the pin so a run contended END TO END (all probes high, the
  *     median with them) still corrects against the reference idle
  *     level instead of concluding the host was "idle at 0.4 s/probe".
  *
  * Raw numbers always ride alongside the normalized ones in the
  * artifacts — normalization adds a column, never replaces one.
  */
object BenchNorm {

  /** Absolute idle-probe pin of the reference host class (round-8
    * artifact floor) — since r16 an UPPER BOUND on the run-relative
    * baseline, not the denominator itself: cross-host comparability
    * for fully-contended runs, while faster hosts normalize against
    * their own measured idle level. */
  val ReferenceCalibSec = 0.30

  /** The run's idle-phase probe baseline: median of all positive
    * probes observed this run (batch-pass + per-section + per-chunk),
    * capped at [[ReferenceCalibSec]]. Falls back to the pin when the
    * run recorded no usable probe. */
  def runBaseline(probes: Seq[Double]): Double = {
    val ok = probes.filter(_ > 0).sorted
    if (ok.isEmpty) ReferenceCalibSec
    else math.min(median(ok), ReferenceCalibSec)
  }

  /** TRUE median of a pre-sorted sample (even sizes average the two
    * middle elements — sorted(n/2) alone is the upper-middle, i.e. the
    * MAX of a bimodal probe pair, biasing the estimate high). */
  def median(sorted: Seq[Double]): Double =
    if (sorted.isEmpty) 0.0
    else if (sorted.size % 2 == 1) sorted(sorted.size / 2)
    else (sorted(sorted.size / 2 - 1) + sorted(sorted.size / 2)) / 2.0

  /** The clamped contention ratio for one probe reading: ≥ 1 always
    * (correct up under measured load, never deflate on a fast host);
    * 1 when the probe failed (≤ 0) — an unmeasured point keeps its
    * raw wall. */
  def ratio(probeSec: Double, baseline: Double): Double =
    if (probeSec > 0 && baseline > 0) math.max(1.0, probeSec / baseline)
    else 1.0

  /** Per-chunk ambient-normalized throughput: rows / Σ(chunk_wall /
    * ratio(chunk_probe, baseline)). Each chunk's wall deflates by its
    * OWN clamped ratio, so only the chunks that measured slow probes
    * normalize — a slow chunk under a quiet probe stays slow in the
    * normalized number (it's code, not environment). None when the
    * per-chunk record is absent or inconsistent (caller falls back to
    * the one pre-section probe). */
  def perChunkRpsNorm(chunkSec: Seq[Double], chunkRows: Seq[Long],
      chunkCalib: Seq[Double], baseline: Double): Option[Double] =
    if (chunkCalib.isEmpty || chunkCalib.size != chunkSec.size ||
        chunkRows.size != chunkSec.size) None
    else {
      val normSec = chunkSec.lazyZip(chunkCalib)
        .map((w, c) => w / ratio(c, baseline)).sum
      if (normSec > 0) Some(chunkRows.sum / normSec) else None
    }

  /** A stream section's normalized throughput: per-chunk when the
    * section recorded per-chunk probes, else the one pre-section
    * probe's ratio applied to the section rps; 0 when no probe at
    * all. */
  def sectionRpsNorm(rps: Double, calibSec: Double,
      chunkSec: Seq[Double], chunkRows: Seq[Long],
      chunkCalib: Seq[Double], baseline: Double): Double =
    perChunkRpsNorm(chunkSec, chunkRows, chunkCalib, baseline)
      .getOrElse(if (calibSec > 0) rps * ratio(calibSec, baseline) else 0.0)
}
