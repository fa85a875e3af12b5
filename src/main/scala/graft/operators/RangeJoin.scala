package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join — pair each point row with every interval row
  * whose `[start, end)` contains the point's timestamp.
  *
  * Spark plans a raw non-equi join condition as a broadcast nested-loop
  * join: O(points × intervals), which dies long before 100 TB. The
  * scalable form is *binning*: explode each interval into the fixed-width
  * time bins it overlaps, bin each point once, then do a plain **equi**
  * join on the bin (hash shuffle, broadcast-able, AQE-skew-splittable)
  * and re-check the exact range predicate. Cost is
  * O(points + intervals × bins-per-interval) — linear as long as
  * `binWidth` is chosen near the typical interval length.
  */
object RangeJoin {

  /** @param points    DataFrame with a timestamp column `pointTs`
    * @param intervals DataFrame with `startTs`/`endTs` timestamp columns
    * @param binWidthSeconds bin size; intervals explode into
    *                        `len/binWidth + 1` bins each
    * @return the inner join of points × containing intervals
    *         (half-open: start <= ts < end)
    */
  def binned(
      points: DataFrame, pointTs: String,
      intervals: DataFrame, startTs: String, endTs: String,
      binWidthSeconds: Long): DataFrame = {
    val collision = points.columns.intersect(intervals.columns)
    require(collision.isEmpty, s"column collision: ${collision.mkString(",")}")
    val w = lit(binWidthSeconds)

    val binOf = (ts: org.apache.spark.sql.Column) =>
      floor(unix_timestamp(ts) / w).cast("long")

    val p = points.withColumn("__bin", binOf(col(pointTs)))
    val i = intervals.withColumn("__bin",
      explode(sequence(binOf(col(startTs)), binOf(col(endTs)))))

    // No dedup needed: each (point, interval) pair meets on exactly one
    // bin — the point's own — however many bins the interval spans.
    p.join(i, Seq("__bin"))
      .filter(col(pointTs) >= col(startTs) && col(pointTs) < col(endTs))
      .drop("__bin")
  }
}
