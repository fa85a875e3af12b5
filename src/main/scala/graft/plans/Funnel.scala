package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, GenericInternalRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.TimestampType
import org.apache.spark.unsafe.types.UTF8String

/** Ordered-funnel matching as a first-class operator: logical node →
  * planner strategy → physical sorted sweep.
  *
  * The composed form (`op_funnel`) chains one aggregation + join per
  * step — N shuffles of the fact table for an N-step funnel. This
  * operator declares its requirements to Catalyst instead: hash
  * distribution on the user key and (key, ts) ordering. EnsureRequirements
  * then plans exactly ONE exchange + one sort, and the exec matches all
  * steps in a single forward sweep per key group — the shape that holds
  * at 100 TB regardless of step count.
  *
  * Semantics (identical to the SQL chain): step 0 matches at the key's
  * earliest step-0 row; step i at the earliest row strictly later than
  * the step-(i−1) match. Output: one row per key that entered the
  * funnel, with the per-step match timestamps (null from the first
  * unreached step on).
  *
  * Child contract: `[key, ts, step0 … stepN booleans]` — preparing the
  * inputs with an ordinary projection keeps this node fully resolved
  * from construction (expressions never cross the custom boundary).
  */
case class FunnelMatch(nSteps: Int, stepAttrs: Seq[Attribute],
    child: LogicalPlan) extends UnaryNode {
  require(child.output.length == 2 + nSteps,
    s"FunnelMatch child must be [key, ts, $nSteps step flags]")

  override def output: Seq[Attribute] = child.output.head +: stepAttrs

  // the exec reads every child column positionally — without this the
  // node exposes no expression references and ColumnPruning would
  // project the child down to nothing
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(child.output)

  // step attrs originate here, not from the child
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(stepAttrs)

  override def maxRows: Option[Long] = child.maxRows

  override protected def withNewChildInternal(newChild: LogicalPlan): FunnelMatch =
    copy(child = newChild)
}

object FunnelStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case f: FunnelMatch =>
      FunnelExec(f.nSteps, f.output, planLater(f.child)) :: Nil
    case _ => Nil
  }
}

case class FunnelExec(nSteps: Int, output: Seq[Attribute], child: SparkPlan)
    extends UnaryExecNode {

  private def keyAttr = child.output.head
  private def tsAttr = child.output(1)

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output.drop(1))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(keyAttr)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(keyAttr, Ascending), SortOrder(tsAttr, Ascending)))

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val keyType = keyAttr.dataType
    val schema = output.map(_.dataType).toArray
    child.execute().mapPartitions({ iter =>
      // downstream operators require UnsafeRow; the projection's buffer
      // is reused per row, which every consumer of a SparkPlan tolerates
      val toUnsafe =
        org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(schema)
      new Iterator[InternalRow] {
        private var pendingKey: Any = _
        private var pendingSteps: Array[Any] = _
        private var nextRow: InternalRow = _

        // rows are reused UnsafeRows — copy non-primitive keys we hold
        private def copyOf(v: Any): Any = v match {
          case u: UTF8String => u.copy()
          case other => other
        }

        /** Sweep one key group; leaves state in pendingKey/pendingSteps
          * when the group entered the funnel. */
        private def advance(): Unit = {
          pendingKey = null; pendingSteps = null
          while (pendingSteps == null && (nextRow != null || iter.hasNext)) {
            val first = if (nextRow != null) nextRow else iter.next()
            nextRow = null
            val key = copyOf(first.get(0, keyType))
            val steps = new Array[Any](nSteps)
            var matched = 0
            var lastTs = Long.MinValue
            var row = first
            var groupDone = false
            while (!groupDone) {
              if (matched < nSteps && !row.isNullAt(1) &&
                  !row.isNullAt(2 + matched) && row.getBoolean(2 + matched)) {
                val ts = row.getLong(1)
                if (matched == 0 || ts > lastTs) {
                  steps(matched) = ts
                  lastTs = ts
                  matched += 1
                }
              }
              if (iter.hasNext) {
                row = iter.next()
                if (row.get(0, keyType) != key) {
                  nextRow = row // first row of the NEXT group
                  groupDone = true
                }
              } else groupDone = true
            }
            if (steps(0) != null) { pendingKey = key; pendingSteps = steps }
          }
        }

        override def hasNext: Boolean = {
          if (pendingSteps == null) advance()
          pendingSteps != null
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          val out = new GenericInternalRow(1 + nSteps)
          out.update(0, pendingKey)
          var i = 0
          while (i < nSteps) { out.update(1 + i, pendingSteps(i)); i += 1 }
          pendingSteps = null
          toUnsafe(out)
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): FunnelExec =
    copy(child = newChild)
}

object Funnel {

  /** Match an ordered funnel over `df`: one row per `key` that hit step
    * 0, with each step's match timestamp. Installs [[FunnelStrategy]]
    * on the session if absent (also injectable at session build via
    * `GraftExtensions`). */
  def funnel(df: DataFrame, key: String, ts: String,
      steps: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(FunnelStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ FunnelStrategy
    val prepared = df.select(
      col(key) +: col(ts) +:
        steps.zipWithIndex.map { case (c, i) => c.as(s"__s$i") }: _*)
    // output attrs minted HERE, once — as constructor state they survive
    // plan copies with their exprIds intact (a `val` in the node body
    // would re-mint on every copy and orphan parent references)
    val stepAttrs: Seq[Attribute] = steps.indices.map(i =>
      AttributeReference(s"step${i}_ts", TimestampType, nullable = true)())
    CatalystBridge.ofRows(spark,
      FunnelMatch(steps.length, stepAttrs, prepared.queryExecution.analyzed))
  }
}
