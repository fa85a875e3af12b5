package graft

/** The z-order layout's reason to exist: bucket bounding boxes must be
  * small in BOTH dimensions simultaneously, so min/max pruning can skip
  * buckets for filters on either column. A one-column sort would make
  * the other dimension's per-bucket range span the whole domain. */
class ZOrderSpec extends SparkSpec {

  test("z-buckets are tight in both dimensions (data-skipping holds)") {
    val rows = SparkEntry.queries("op_zorder_layout")(
      spark, "/root/testdata/sf0.001").collect()
    rows.length should be > 1

    val globalX =
      rows.map(_.getLong(3)).max - rows.map(_.getLong(2)).min max 1L
    val globalY =
      rows.map(_.getLong(5)).max - rows.map(_.getLong(4)).min max 1L
    // mean fraction of the global area covered by a bucket's box
    val meanAreaFrac = rows.map { r =>
      val ax = (r.getLong(3) - r.getLong(2)) max 1L
      val ay = (r.getLong(5) - r.getLong(4)) max 1L
      ax.toDouble * ay.toDouble / (globalX.toDouble * globalY.toDouble)
    }.sum / rows.length
    // random assignment would put every box near area fraction 1.0;
    // the curve should keep the average box well under a quarter
    meanAreaFrac should be < 0.25
  }
}
