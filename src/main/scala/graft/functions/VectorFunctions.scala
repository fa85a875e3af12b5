package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** Native Catalyst expressions for the vector hot path.
  *
  * The composable form of a dot product — `aggregate(zip_with(a, b,
  * _*_), 0.0, _+_)` — materializes an intermediate array and pays a
  * lambda-closure dispatch per element. Inside a kNN join that
  * expression runs |Q|·|C| times, so it deserves the custom-Expression
  * treatment: [[DotProduct]] is a `BinaryExpression` with `doGenCode`
  * emitting a tight primitive loop directly over the two `ArrayData`
  * (no intermediate allocation, whole-stage-codegen-fusable).
  *
  * Semantics are IDENTICAL to the composable form on `array<double>`
  * inputs: left-to-right IEEE double accumulation of products, null when
  * either side is null or lengths differ — pinned bit-exactly by
  * VectorFunctionsSpec, so the DuckDB oracles are unaffected.
  */
object VectorFunctions {

  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "vec_dot"

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"vec_dot requires two array<double> arguments, " +
            s"got ${left.dataType.sql} and ${right.dataType.sql}")
      }

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements()) null
      else {
        var s = 0.0
        var i = 0
        while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
        s
      }
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        s"""
           |final int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $s = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $s += $a.getDouble($i) * $b.getDouble($i);
           |  }
           |  ${ev.value} = $s;
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotProduct =
      copy(left = newLeft, right = newRight)
  }

  /** First-minimum squared-L2 argmin of a vector against an entry
    * array — the per-row kernel of streaming ANN index maintenance
    * ([[graft.streaming.StreamingIndex]]): each arriving vector picks
    * its nearest trained centroid / codeword from a plan-folded
    * literal array. The composable form (an `aggregate` fold keeping
    * `struct(best d2, best id)`) interprets the whole three-dot
    * distance tree per entry per row; this computes the same values —
    * left-to-right per-dot accumulation, `d2 = a·a − 2·a·b + b·b`,
    * strict `<` so ties fall to the EARLIEST entry (callers pre-sort
    * by id, matching `min(struct(d2, id))`) — in one compiled loop.
    * `a·a` hoists out of the entry loop: on the integer-valued
    * quantized inputs every sum is exact, so hoisting cannot change
    * the value. An EMPTY entry array yields the
    * (Double.MaxValue, Long.MaxValue) sentinel — identical to the
    * fold's init element — so callers must reject empty metadata
    * up front (StreamingIndex's `require`, the fail-loud doctrine). */
  def argminD2(vec: ArrayData, entries: ArrayData): InternalRow = {
    val n = vec.numElements()
    var aa = 0.0
    var j = 0
    while (j < n) { val x = vec.getDouble(j); aa += x * x; j += 1 }
    var bestD2 = Double.MaxValue
    var bestId = Long.MaxValue
    val m = entries.numElements()
    var i = 0
    while (i < m) {
      val e = entries.getStruct(i, 2)
      val v = e.getArray(1)
      // fail loud, not garbage: the SQL-registered form accepts any
      // entry vectors, and a shorter-than-query one would silently
      // read out of bounds on UnsafeArrayData (undefined doubles)
      if (v.numElements() != n)
        throw new IllegalArgumentException(
          s"vec_argmin_d2 entry ${e.getLong(0)} has ${v.numElements()} " +
            s"dims, query has $n")
      var ab = 0.0
      var bb = 0.0
      j = 0
      while (j < n) {
        val x = vec.getDouble(j); val y = v.getDouble(j)
        ab += x * y; bb += y * y
        j += 1
      }
      val dd = aa - 2.0 * ab + bb
      if (dd < bestD2) { bestD2 = dd; bestId = e.getLong(0) }
      i += 1
    }
    new GenericInternalRow(Array[Any](bestD2, bestId))
  }

  /** [[argminD2]] as a native binary expression: left = the vector
    * (array<double>), right = the entry array
    * (array<struct<id: long, v: array<double>>>, typically a literal
    * folded from trained index metadata). Returns
    * struct(d2: double, id: long). */
  case class ArgminD2(left: Expression, right: Expression)
      extends BinaryExpression {
    override def prettyName: String = "vec_argmin_d2"
    override val dataType: DataType = StructType(Seq(
      StructField("d2", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false)))
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(DoubleType, _),
            ArrayType(StructType(Array(
              StructField(_, LongType, _, _),
              StructField(_, ArrayType(DoubleType, _), _, _))), _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<double>, " +
            s"array<struct<long, array<double>>>), got (${l.sql}, ${r.sql})")
      }
    override protected def nullSafeEval(v: Any, e: Any): Any =
      argminD2(v.asInstanceOf[ArrayData], e.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (v, e) =>
        s"graft.functions.VectorFunctions.argminD2($v, $e)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): ArgminD2 =
      copy(left = newLeft, right = newRight)
  }

  /** Column-level API (no registry needed). Inputs are cast to
    * `array<double>` — products and sums always run in double, matching
    * the composable reference form on double arrays. */
  def vecDot(a: Column, b: Column): Column =
    CatalystBridge.column(DotProduct(
      CatalystBridge.expression(a.cast("array<double>")),
      CatalystBridge.expression(b.cast("array<double>"))))

  /** Column-level [[ArgminD2]]: `entries` must be sorted by id for the
    * min-struct tie order. */
  def vecArgminD2(vec: Column, entries: Column): Column =
    CatalystBridge.column(ArgminD2(
      CatalystBridge.expression(vec), CatalystBridge.expression(entries)))

  private val dotInfo = new ExpressionInfo(
    classOf[DotProduct].getCanonicalName, null, "vec_dot")

  /** Make `vec_dot` callable from SQL in an existing session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("vec_dot"), dotInfo,
      (children: Seq[Expression]) => DotProduct(children(0), children(1)))
}

/** `SparkSessionExtensions` entry point — enable with
  * `spark.sql.extensions=graft.functions.GraftExtensions`. Injects the
  * full custom-expression family so a SQL-only user of the engine can
  * call it without touching the Scala API:
  *
  *   vec_dot(a, b)                  exact double dot product
  *   sorted_intersect_count(a, b)   merge-scan |A∩B| on sorted longs
  *   shingle_strings(tokens, n)     distinct word n-grams
  *   hashed_shingles60(tokens, n)   sorted 60-bit hashed shingle set
  *   minhash_sig(hashed, k)         k-slot MinHash signature
  *   simhash16(tokens)              16-bit SimHash fingerprint
  *   lm_score_bits(tokens, grid)    hashed-bigram LM score (quarter-bit)
  *   cms_cells(tokens, rows, width) per-doc sparse count-min cell counts
  *   cms_sketch_agg(tokens, rows, width)  count-min sketch AGGREGATE
  *                                  (dense rows×width cell array)
  *   hll_sketch_agg(tokens, m)      HyperLogLog register AGGREGATE
  *                                  (dense m-register array, max-merge)
  *   kmv_sketch_agg(tokens, k)      k-minimum-values AGGREGATE (the k
  *                                  smallest distinct hash60 values,
  *                                  ascending; union-merge)
  *   vec_argmin_d2(vec, entries)    nearest entry by exact squared L2
  *
  * Integer parameters (n, k) must be literals — they parameterize the
  * generated code, exactly like the Scala API's Int arguments.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import graft.functions.{TextHashFunctions => T}

  private def intLit(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal integer parameter, got $other")
  }

  private def longLit(e: Expression, fn: String): Long = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal integer parameter, got $other")
  }

  private def fn(name: String, clazz: Class[_])(
      builder: Seq[Expression] => Expression) = (
    FunctionIdentifier(name),
    new ExpressionInfo(clazz.getCanonicalName, null, name),
    builder)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("vec_dot", classOf[VectorFunctions.DotProduct]) {
      c => VectorFunctions.DotProduct(c(0), c(1)) })
    ext.injectFunction(fn("sorted_intersect_count",
        classOf[SetFunctions.SortedIntersectCount]) {
      c => SetFunctions.SortedIntersectCount(c(0), c(1)) })
    ext.injectFunction(fn("shingle_strings", classOf[T.ShingleStrings]) {
      c => T.ShingleStrings(c(0), intLit(c(1), "shingle_strings")) })
    ext.injectFunction(fn("hashed_shingles60", classOf[T.HashedShingles60]) {
      c => T.HashedShingles60(c(0), intLit(c(1), "hashed_shingles60")) })
    ext.injectFunction(fn("minhash_sig", classOf[T.MinHashSig]) {
      c => T.MinHashSig(c(0), intLit(c(1), "minhash_sig")) })
    ext.injectFunction(fn("simhash16", classOf[T.SimHash16]) {
      c => T.SimHash16(c(0)) })
    ext.injectFunction(fn("lm_score_bits", classOf[T.LmScoreBits]) {
      c => T.LmScoreBits(c(0), c(1)) })
    ext.injectFunction(fn("nb_argmax_bits", classOf[T.NbArgmaxBits]) {
      c => T.NbArgmaxBits(c(0), c(1), longLit(c(2), "nb_argmax_bits")) })
    ext.injectFunction(fn("lm_nb_fused_bits", classOf[T.LmNbFusedBits]) {
      c => T.LmNbFusedBits(c(0), c(1), c(2), longLit(c(3), "lm_nb_fused_bits")) })
    ext.injectFunction(fn("lm_multi_score_bits", classOf[T.LmMultiScoreBits]) {
      c => T.LmMultiScoreBits(c(0), c(1)) })
    ext.injectFunction(fn("cms_cells", classOf[T.CmsCells]) {
      c => T.CmsCells(c(0), intLit(c(1), "cms_cells"),
        intLit(c(2), "cms_cells")) })
    // aggregate functions register as their AggregateFunction — the
    // registry wraps them in AggregateExpression at resolution
    ext.injectFunction(fn("cms_sketch_agg",
        classOf[graft.functions.SketchAggregates.CmsSketchAgg]) {
      c => graft.functions.SketchAggregates.CmsSketchAgg(c(0),
        intLit(c(1), "cms_sketch_agg"), intLit(c(2), "cms_sketch_agg")) })
    ext.injectFunction(fn("hll_sketch_agg",
        classOf[graft.functions.SketchAggregates.HllSketchAgg]) {
      c => graft.functions.SketchAggregates.HllSketchAgg(c(0),
        intLit(c(1), "hll_sketch_agg")) })
    ext.injectFunction(fn("kmv_sketch_agg",
        classOf[graft.functions.SketchAggregates.KmvSketchAgg]) {
      c => graft.functions.SketchAggregates.KmvSketchAgg(c(0),
        intLit(c(1), "kmv_sketch_agg")) })
    ext.injectFunction(fn("vec_argmin_d2", classOf[VectorFunctions.ArgminD2]) {
      c => VectorFunctions.ArgminD2(c(0), c(1)) })
    ext.injectFunction(fn("morton_interleave16",
        classOf[MortonFunctions.MortonInterleave16]) {
      c => MortonFunctions.MortonInterleave16(c(0), c(1)) })
    // bound-prune levenshtein(a,b) <= k behind an O(1) length guard
    ext.injectOptimizerRule(_ => graft.plans.EditDistancePruning)
    // plan FunnelMatch logical nodes as the sorted-sweep FunnelExec
    ext.injectPlannerStrategy(_ => graft.plans.FunnelStrategy)
  }
}
