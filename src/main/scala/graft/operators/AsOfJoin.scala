package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, attach the latest
  * right row of the same key with `rightTs <= leftTs` (backward as-of,
  * left-outer semantics).
  *
  * Spark has no native as-of join. The usual naive forms — a theta join
  * (`l.key = r.key && r.ts <= l.ts`) followed by a max_by, or a
  * `mapPartitions` merge — either blow up on the intermediate product or
  * abandon Catalyst. This implementation is the scalable composition:
  *
  *   1. union both sides into one keyed stream (right rows sort *before*
  *      left rows at equal timestamps, giving `<=` semantics),
  *   2. one hash shuffle on the key + one sort on (ts, side),
  *   3. a running `last(right_struct, ignoreNulls)` window carries the
  *      most recent right row forward to every left row.
  *
  * Cost is exactly one shuffle + one sort — the same as a sort-merge
  * join — with no pairwise intermediate, so it holds at 100 TB where the
  * theta-join product is quadratic. Rows with no preceding right row get
  * nulls (left-outer).
  *
  * Right rows must be unique per (key, ts) for a deterministic result —
  * pre-aggregate with `max_by` if not.
  */
object AsOfJoin {

  def backward(
      left: DataFrame, leftKey: String, leftTs: String,
      right: DataFrame, rightKey: String, rightTs: String): DataFrame = {
    val lCols = left.columns.toSeq
    val rCols = right.columns.toSeq
    require(!lCols.exists(rCols.contains),
      s"column collision between sides: ${lCols.intersect(rCols).mkString(",")}")

    val rStruct = struct(rCols.map(col): _*)
    val rType = right.select(rStruct.as("r")).schema("r").dataType

    // keys keep their native type (casting e.g. a string key to a numeric
    // would silently null it); unionByName enforces both sides agree
    val l2 = left.select(
      col(leftKey).as("__k"), col(leftTs).as("__ts"),
      lit(1).as("__side"), struct(lCols.map(col): _*).as("__l"),
      lit(null).cast(rType).as("__r"))
    val r2 = right.select(
      col(rightKey).as("__k"), col(rightTs).as("__ts"),
      lit(0).as("__side"), lit(null).cast(left.select(struct(lCols.map(col): _*).as("l")).schema("l").dataType).as("__l"),
      rStruct.as("__r"))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l2.unionByName(r2)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(lCols.map(n => col(s"__l.$n").as(n)) ++
              rCols.map(n => col(s"__match.$n").as(n)): _*)
  }

  /** Backward as-of with a tolerance horizon: a match older than
    * `toleranceSeconds` before the left timestamp is discarded (nulls,
    * left-outer). Correct by construction: the carried row is the
    * *latest* preceding right row, so if it is out of horizon, every
    * other candidate is older still. */
  def backwardWithin(
      left: DataFrame, leftKey: String, leftTs: String,
      right: DataFrame, rightKey: String, rightTs: String,
      toleranceSeconds: Long): DataFrame = {
    val joined = backward(left, leftKey, leftTs, right, rightKey, rightTs)
      .withColumn("__ok", col(rightTs).isNotNull &&
        col(rightTs) >= (col(leftTs) - expr(s"INTERVAL $toleranceSeconds SECONDS")))
    right.columns.foldLeft(joined) { (df, n) =>
      df.withColumn(n, when(col("__ok"), col(n)))
    }.drop("__ok")
  }
}
