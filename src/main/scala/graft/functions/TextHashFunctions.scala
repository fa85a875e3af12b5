package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for the text-hashing hot paths.
  *
  * The composable forms — `transform(arr, s => hash60(s))`,
  * k × `array_min(transform(...affine...))`, per-bit `aggregate` votes —
  * are correct but slow: Spark's higher-order functions are
  * CodegenFallback, so every element pays interpreted lambda dispatch,
  * and `hash60`'s `conv(substring(md5(s),1,15),16,10)` allocates a hex
  * string + substring per element. These expressions compute the SAME
  * values (pinned bit-identical by TextHashFunctionsSpec and by every
  * DuckDB-oracled query downstream) in one compiled pass per row:
  * MD5 straight to a 60-bit long (no hex round-trip), all k MinHash
  * mins in a single scan, all 16 SimHash votes in a single scan.
  */
object TextHashFunctions {

  /** First 15 hex digits of MD5 as a non-negative 60-bit long — exactly
    * `CONV(SUBSTRING(MD5(s),1,15),16,10)` without the hex round-trip:
    * bytes 0..6 followed by the high nibble of byte 7. */
  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def hash60(s: UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  /** `Dedup.shingles` body: distinct word n-grams of a token array in
    * first-occurrence order (matching `array_distinct`); short docs fall
    * back to the whole text. */
  def shingleStrings(tokens: ArrayData, n: Int): java.util.ArrayList[UTF8String] = {
    val nTok = tokens.numElements()
    val seen = new java.util.HashSet[UTF8String]()
    val out = new java.util.ArrayList[UTF8String]()
    if (nTok >= n) {
      var i = 0
      while (i <= nTok - n) {
        var s = tokens.getUTF8String(i)
        var j = 1
        while (j < n) {
          s = UTF8String.concat(s, Space, tokens.getUTF8String(i + j))
          j += 1
        }
        if (seen.add(s)) out.add(s)
        i += 1
      }
    } else {
      var s = if (nTok == 0) UTF8String.EMPTY_UTF8 else tokens.getUTF8String(0)
      var j = 1
      while (j < nTok) {
        s = UTF8String.concat(s, Space, tokens.getUTF8String(j))
        j += 1
      }
      out.add(s)
    }
    out
  }

  /** [[shingleStrings]] as ArrayData (for the string-shingle expression). */
  def shingleArray(tokens: ArrayData, n: Int): ArrayData = {
    val out = shingleStrings(tokens, n)
    val arr = new Array[AnyRef](out.size())
    var i = 0
    while (i < arr.length) { arr(i) = out.get(i); i += 1 }
    new GenericArrayData(arr)
  }

  /** `Dedup.hashedShingles` body: [[shingleStrings]], each hashed to 60
    * bits, sorted ascending. Distinctness is by shingle TEXT (matching
    * `array_distinct` before hashing), not by hash value. */
  def hashedShingles(tokens: ArrayData, n: Int): ArrayData = {
    val out = shingleStrings(tokens, n)
    val hs = new Array[Long](out.size())
    var i = 0
    while (i < hs.length) { hs(i) = hash60(out.get(i)); i += 1 }
    java.util.Arrays.sort(hs)
    new GenericArrayData(hs)
  }

  private val Space = UTF8String.fromString(" ")

  /** All k MinHash signature values of a pre-hashed shingle array in one
    * scan: sig(i) = min over h of (h mod P * a_i + b_i) mod P. */
  def minhashSig(hashed: ArrayData, k: Int): ArrayData = {
    val a = affineA(k); val b = affineB(k)
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = hashed.numElements()
    var i = 0
    while (i < n) {
      val hm = hashed.getLong(i) % PortableHash.P
      var t = 0
      while (t < k) {
        val v = (hm * a(t) + b(t)) % PortableHash.P
        if (v < sig(t)) sig(t) = v
        t += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** 16-bit SimHash over a token array (with multiplicity): hash each
    * token, vote ±1 per bit, set bits with positive votes. */
  def simhash16(tokens: ArrayData, dummy: Int): Long = {
    val votes = new Array[Int](16)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val h = hash60(tokens.getUTF8String(i))
      var b = 0
      while (b < 16) {
        votes(b) += (((h >>> b) & 1L).toInt << 1) - 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 16) { if (votes(b) > 0) out |= 1L << b; b += 1 }
    out
  }

  // cached per-k affine constant arrays (identical to PortableHash.affine)
  private val aCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
  private val bCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
  def affineA(k: Int): Array[Long] =
    aCache.computeIfAbsent(k, k => Array.tabulate(k)(PortableHash.constantA))
  def affineB(k: Int): Array[Long] =
    bCache.computeIfAbsent(k, k => Array.tabulate(k)(PortableHash.constantB))

  /** Shared shape: array-in, value-out native expression whose codegen
    * is one static helper call — compiled, no per-element lambda
    * dispatch, and it keeps the enclosing whole-stage-codegen span
    * intact (unlike CodegenFallback higher-order functions). */
  abstract class ArrayHelperExpression extends UnaryExpression {
    /** Static helper invocation: `helper` is called as
      * `TextHashFunctions.helper(childValue, intArg)`. */
    def helperName: String
    def intArg: Int
    def elementType: DataType

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(t, _) if t == elementType => TypeCheckResult.TypeCheckSuccess
        case t => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<${elementType.sql}>, got ${t.sql}")
      }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.TextHashFunctions.$helperName($c, $intArg)")
  }

  case class HashedShingles60(child: Expression, n: Int)
      extends ArrayHelperExpression {
    override def prettyName: String = "hashed_shingles60"
    override def helperName: String = "hashedShingles"
    override def intArg: Int = n
    override def elementType: DataType = StringType
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(a: Any): Any =
      hashedShingles(a.asInstanceOf[ArrayData], n)
    override protected def withNewChildInternal(c: Expression): HashedShingles60 =
      copy(child = c)
  }

  case class ShingleStrings(child: Expression, n: Int)
      extends ArrayHelperExpression {
    override def prettyName: String = "shingle_strings"
    override def helperName: String = "shingleArray"
    override def intArg: Int = n
    override def elementType: DataType = StringType
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override protected def nullSafeEval(a: Any): Any =
      shingleArray(a.asInstanceOf[ArrayData], n)
    override protected def withNewChildInternal(c: Expression): ShingleStrings =
      copy(child = c)
  }

  case class MinHashSig(child: Expression, k: Int)
      extends ArrayHelperExpression {
    override def prettyName: String = "minhash_sig"
    override def helperName: String = "minhashSig"
    override def intArg: Int = k
    override def elementType: DataType = LongType
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    // An empty shingle array has no minimum: yield null, exactly like the
    // composable array_min(transform(...)) form this expression mirrors.
    override def nullable: Boolean = true
    override protected def nullSafeEval(a: Any): Any = {
      val arr = a.asInstanceOf[ArrayData]
      if (arr.numElements() == 0) null else minhashSig(arr, k)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"""if ($c.numElements() == 0) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${ev.value} = graft.functions.TextHashFunctions.minhashSig($c, $k);
           |}""".stripMargin)
    override protected def withNewChildInternal(c: Expression): MinHashSig =
      copy(child = c)
  }

  case class SimHash16(child: Expression) extends ArrayHelperExpression {
    override def prettyName: String = "simhash16"
    override def helperName: String = "simhash16"
    override def intArg: Int = 0
    override def elementType: DataType = StringType
    override def dataType: DataType = LongType
    override protected def nullSafeEval(a: Any): Any =
      simhash16(a.asInstanceOf[ArrayData], 0)
    override protected def withNewChildInternal(c: Expression): SimHash16 =
      copy(child = c)
  }

  /** Hashed-bigram LM score of a token array against a 65,536-entry
    * weight grid, in ONE compiled scan: per token one direct MD5→60-bit
    * hash (no hex round-trip) mod 256, per consecutive pair one grid
    * lookup at b1·256+b2. The composable form — `transform` buckets,
    * two `slice`s, `zip_with`, `aggregate` with `element_at` — walks
    * the token array five times through interpreted lambda dispatch
    * and allocates three intermediate arrays per row; this is the same
    * value (pinned bit-identical by TextHashFunctionsSpec) at the cost
    * of the tokenize pass alone. Empty-bigram docs (≤1 token) score 0,
    * exactly like the fold over an empty array. */
  def lmScoreBits(tokens: ArrayData, grid: ArrayData): Long = {
    // fail loud, not garbage: the SQL-registered form accepts any
    // array<bigint> grid, and a short one would silently read out of
    // bounds on UnsafeArrayData (undefined longs, not an error)
    if (grid.numElements() != 65536)
      throw new IllegalArgumentException(
        s"lm_score_bits grid must have 65,536 entries (256×256 bigram " +
          s"codes), got ${grid.numElements()}")
    val n = tokens.numElements()
    if (n < 2) return 0L
    var prev = (hash60(tokens.getUTF8String(0)) % 256L).toInt
    var sum = 0L
    var i = 1
    while (i < n) {
      val b = (hash60(tokens.getUTF8String(i)) % 256L).toInt
      sum += grid.getLong(prev * 256 + b)
      prev = b
      i += 1
    }
    sum
  }

  /** DSIR-style weighted bucket sum over a PRE-HASHED feature array in
    * one compiled scan: Σ weights[h mod |weights|]. The composable form
    * (`aggregate` with `element_at` and `pmod`) pays interpreted lambda
    * dispatch per feature; same value (hash60 features are non-negative,
    * so `%` ≡ `pmod`), pinned bit-identical by TextHashFunctionsSpec. */
  def weightedBucketSum(hashed: ArrayData, weights: ArrayData): Long = {
    val m = weights.numElements()
    if (m == 0)
      throw new IllegalArgumentException(
        "weighted_bucket_sum weight table must be non-empty")
    val n = hashed.numElements()
    var sum = 0L
    var i = 0
    while (i < n) {
      val h = hashed.getLong(i)
      // the SQL-registered form accepts arbitrary longs; a negative
      // "hash" would index out of bounds (Java % keeps the sign) and
      // read garbage — reject it instead of returning a wrong sum
      if (h < 0)
        throw new IllegalArgumentException(
          s"weighted_bucket_sum features must be non-negative hashes, got $h")
      sum += weights.getLong((h % m).toInt)
      i += 1
    }
    sum
  }

  /** [[weightedBucketSum]] as a native binary expression: left = the
    * hashed feature array (array<long>, e.g. [[HashedShingles60]]'s
    * output), right = the trained bucket-weight array (a literal or a
    * broadcast 1-row frame's column). */
  case class WeightedBucketSum(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def prettyName: String = "weighted_bucket_sum"
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<bigint>, array<bigint>), " +
            s"got (${l.sql}, ${r.sql})")
      }
    override protected def nullSafeEval(h: Any, w: Any): Any =
      weightedBucketSum(h.asInstanceOf[ArrayData], w.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (h, w) =>
        s"graft.functions.TextHashFunctions.weightedBucketSum($h, $w)")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): WeightedBucketSum = copy(left = l, right = r)
  }

  /** [[lmScoreBits]] as a native binary expression: left = the token
    * array, right = the weight grid (a literal or a broadcast 1-row
    * frame's column — either way it ships in the plan, so executors
    * need no side-channel state). Codegen is one static call, keeping
    * the enclosing whole-stage span intact. */
  case class LmScoreBits(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def prettyName: String = "lm_score_bits"
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(StringType, _), ArrayType(LongType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<string>, array<bigint>), " +
            s"got (${l.sql}, ${r.sql})")
      }
    override protected def nullSafeEval(t: Any, g: Any): Any =
      lmScoreBits(t.asInstanceOf[ArrayData], g.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (t, g) =>
        s"graft.functions.TextHashFunctions.lmScoreBits($t, $g)")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): LmScoreBits = copy(left = l, right = r)
  }

  /** Multi-class NB argmax in ONE compiled pass: bucket each token
    * ONCE (one MD5 per occurrence — the composable |classes|-fold form
    * pays |classes| full hash passes over the same token array), then
    * fold every class grid over the shared bucket sequence and keep
    * the best centered score inline. `meta` is the whole trained
    * classifier as one literal — array<struct<cls, e4, grid[65536]>>,
    * sorted however the caller likes (ordering cannot matter: the
    * tie-break below is order-free). Score_c = scale·Σ grid_c[b1·256+b2]
    * − n_bigrams·e4_c, exactly the composable
    * `greatest(struct(score, cls))` over per-class [[lmScoreBits]]
    * folds — including the empty/one-token document (fold sum 0,
    * n_bigrams = |tokens|−1 UNclamped) and the tie rule (equal scores
    * fall to the binary-greatest class string, which is how Spark
    * orders struct(s, cls)). Pinned bit-identical by
    * TextHashFunctionsSpec. */
  /** The classifier metadata decoded to primitive arrays. The meta
    * argument is REQUIRED foldable (enforced by `checkInputDataTypes`),
    * so its `ArrayData` is the SAME object for every row a thread
    * scores — decode it once per thread (identity-keyed, one-slot)
    * instead of paying a boxed `GenericArrayData.getLong` per grid cell
    * per bigram per class (measured: the boxed folds cost as much as
    * the hash pass they follow). Foldability is what makes the
    * identity-keyed cache SOUND, not just fast: a non-literal meta
    * could hand the expression the same ArrayData object over mutated
    * backing bytes (engines reuse row buffers), which the identity key
    * cannot distinguish from the cached classifier — so the literal
    * contract is enforced at analysis time rather than relied on. */
  /** k 65,536-entry weight grids INTERLEAVED by bigram code —
    * slot(g·k + c) = grid c's weight for code g — so one bigram's k
    * lookups land in one or two cache lines instead of k random lines
    * across k separate 512 KB tables. BYTE-packed when every weight
    * fits [0, 127], which every grid the engine trains does (weights
    * are the quarter-bit staircase `length(bin(x⁴))` ≤ 64): the 5-class
    * working set drops 2.6 MB → 320 KB — inside L2, where the
    * long-interleaved layout still missed once per bigram (the measured
    * residue between `nb_score` and the one-grid `lm_score`). Arbitrary
    * SQL-supplied grids outside the byte range keep the widened long
    * table — same values, just the original footprint. */
  private final class InterleavedGrids(val k: Int) {
    private val tmp = new Array[Long](k * 65536)
    private var fitsByte = true
    /** Stage grid `c`'s weight for bigram code `code`. */
    def put(code: Int, c: Int, v: Long): Unit = {
      tmp(code * k + c) = v
      if (v < 0L || v > 127L) fitsByte = false
    }
    var bytes: Array[Byte] = null
    var longs: Array[Long] = null
    def seal(): Unit =
      if (fitsByte) {
        bytes = new Array[Byte](tmp.length)
        var i = 0
        while (i < tmp.length) { bytes(i) = tmp(i).toByte; i += 1 }
      } else longs = tmp
  }

  /** One hash pass over the token array accumulating ALL k grid fold
    * sums into `sums` (zeroed here): each token occurrence is MD5'd
    * once, each bigram probes one interleaved slot group. Returns the
    * bigram count (|tokens| − 1, unclamped — the callers' centering
    * arithmetic needs the raw value). */
  private def foldGrids(tokens: ArrayData, grids: InterleavedGrids,
      sums: Array[Long]): Long = {
    val k = grids.k
    java.util.Arrays.fill(sums, 0L)
    val n = tokens.numElements()
    var prev = if (n > 0)
      (hash60(tokens.getUTF8String(0)) % 256L).toInt else 0
    var i = 1
    val bts = grids.bytes
    if (bts != null) {
      while (i < n) {
        val b = (hash60(tokens.getUTF8String(i)) % 256L).toInt
        val base = (prev * 256 + b) * k
        var c = 0
        while (c < k) { sums(c) += bts(base + c); c += 1 }
        prev = b
        i += 1
      }
    } else {
      val lgs = grids.longs
      while (i < n) {
        val b = (hash60(tokens.getUTF8String(i)) % 256L).toInt
        val base = (prev * 256 + b) * k
        var c = 0
        while (c < k) { sums(c) += lgs(base + c); c += 1 }
        prev = b
        i += 1
      }
    }
    n - 1L
  }

  private final class NbMeta(val source: ArrayData) {
    val k: Int = source.numElements()
    // fail loud, not garbage: the SQL-registered form accepts any
    // array; a one-class "classifier" is a constant, not a prediction
    if (k < 2)
      throw new IllegalArgumentException(
        s"nb_argmax_bits needs at least two classes, got $k")
    val cls = new Array[UTF8String](k)
    val e4 = new Array[Long](k)
    val grids = new InterleavedGrids(k)
    // per-row fold scratch — safe to reuse: NbMeta lives in a
    // ThreadLocal, so exactly one row's fold is in flight per instance
    val sums = new Array[Long](k)
    locally {
      var c = 0
      while (c < k) {
        val m = source.getStruct(c, 3)
        // copy: the struct's strings must outlive any reused row buffer
        cls(c) = m.getUTF8String(0).clone()
        e4(c) = m.getLong(1)
        val g = m.getArray(2)
        if (g.numElements() != 65536)
          throw new IllegalArgumentException(
            s"nb_argmax_bits grid for class ${cls(c)} must have 65,536 " +
              s"entries (256×256 bigram codes), got ${g.numElements()}")
        var j = 0
        while (j < 65536) { grids.put(j, c, g.getLong(j)); j += 1 }
        c += 1
      }
      grids.seal()
    }
  }

  private val nbMetaCache = new ThreadLocal[NbMeta]

  def nbArgmaxBits(tokens: ArrayData, meta: ArrayData,
      scale: Long): org.apache.spark.sql.catalyst.InternalRow = {
    var mm = nbMetaCache.get()
    if (mm == null || (mm.source ne meta)) {
      mm = new NbMeta(meta)
      nbMetaCache.set(mm)
    }
    val k = mm.k
    val sums = mm.sums
    val nbg = foldGrids(tokens, mm.grids, sums)
    var bestS = 0L
    var bestC = -1
    var c = 0
    while (c < k) {
      val s = scale * sums(c) - nbg * mm.e4(c)
      if (bestC < 0 || s > bestS ||
          (s == bestS && mm.cls(c).compareTo(mm.cls(bestC)) > 0)) {
        bestS = s
        bestC = c
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestS, mm.cls(bestC)))
  }

  /** [[nbArgmaxBits]] as a native binary expression: left = the token
    * array, right = the per-class metadata array (a literal — the
    * trained classifier ships in the plan, the [[LmScoreBits]]
    * doctrine). `scale` is a plan-time constant like [[CmsCells]]'s
    * geometry. Returns struct(s: bigint, cls: string) — drop-in for
    * the composable `greatest(struct(score, cls))`. */
  case class NbArgmaxBits(left: Expression, right: Expression, scale: Long)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def prettyName: String = "nb_argmax_bits"
    override val dataType: DataType = StructType(Seq(
      StructField("s", LongType, nullable = false),
      StructField("cls", StringType, nullable = false)))
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(StringType, _),
            ArrayType(StructType(Array(
              StructField(_, StringType, _, _),
              StructField(_, LongType, _, _),
              StructField(_, ArrayType(LongType, _), _, _))), _)) =>
          // the per-thread NbMeta cache is keyed on the meta ArrayData's
          // OBJECT IDENTITY — sound only if the object's contents never
          // change, i.e. the classifier is a plan constant. Every real
          // caller passes a literal; enforce it so an engine path that
          // reuses one array object over mutated backing bytes can't
          // silently score rows with a stale classifier.
          if (right.foldable) TypeCheckResult.TypeCheckSuccess
          else TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires the class metadata to be foldable " +
              "(a literal/constant classifier — the per-thread decode " +
              "cache is keyed on its object identity)")
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<string>, " +
            s"array<struct<string, bigint, array<bigint>>>), " +
            s"got (${l.sql}, ${r.sql})")
      }
    override protected def nullSafeEval(t: Any, m: Any): Any =
      nbArgmaxBits(t.asInstanceOf[ArrayData], m.asInstanceOf[ArrayData], scale)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (t, m) =>
        s"graft.functions.TextHashFunctions.nbArgmaxBits($t, $m, ${scale}L)")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): NbArgmaxBits =
      copy(left = l, right = r)
  }

  /** The CO-RESIDENT scorers' fused metadata: the two LM ratio grids
    * (target, background) and the k NB class grids decoded into ONE
    * (2+k)-wide interleaved table — a document that must pass BOTH the
    * CCNet ratio gate and the NB classifier gate (the `_cls` capstone's
    * admission stack) pays ONE tokenize+hash pass instead of two, and
    * one bigram probe touches all 2+k weights in a cache line. Cache
    * keyed on BOTH sources' object identity (each required foldable by
    * the expression, the [[NbMeta]] soundness argument). */
  private final class FusedMeta(val gridsSrc: ArrayData, val metaSrc: ArrayData) {
    val k: Int = metaSrc.numElements()
    if (k < 2)
      throw new IllegalArgumentException(
        s"lm_nb_fused_bits needs at least two NB classes, got $k")
    if (gridsSrc.numElements() != 2)
      throw new IllegalArgumentException(
        "lm_nb_fused_bits needs exactly two LM grids (target, " +
          s"background), got ${gridsSrc.numElements()}")
    val cls = new Array[UTF8String](k)
    val e4 = new Array[Long](k)
    val grids = new InterleavedGrids(2 + k)
    val sums = new Array[Long](2 + k) // per-thread fold scratch
    locally {
      var t = 0
      while (t < 2) {
        val g = gridsSrc.getArray(t)
        if (g.numElements() != 65536)
          throw new IllegalArgumentException(
            s"lm_nb_fused_bits LM grid $t must have 65,536 entries, " +
              s"got ${g.numElements()}")
        var j = 0
        while (j < 65536) { grids.put(j, t, g.getLong(j)); j += 1 }
        t += 1
      }
      var c = 0
      while (c < k) {
        val m = metaSrc.getStruct(c, 3)
        cls(c) = m.getUTF8String(0).clone()
        e4(c) = m.getLong(1)
        val g = m.getArray(2)
        if (g.numElements() != 65536)
          throw new IllegalArgumentException(
            s"lm_nb_fused_bits NB grid for class ${cls(c)} must have " +
              s"65,536 entries, got ${g.numElements()}")
        var j = 0
        while (j < 65536) { grids.put(j, 2 + c, g.getLong(j)); j += 1 }
        c += 1
      }
      grids.seal()
    }
  }

  private val fusedMetaCache = new ThreadLocal[FusedMeta]

  /** One token pass → (lp_t, lp_bg, nb best score, nb best class):
    * bit-identical to two separate [[lmScoreBits]] folds plus one
    * [[nbArgmaxBits]] over the same array (spec-pinned), at the hash
    * cost of ONE of them. */
  def lmNbFusedBits(tokens: ArrayData, grids: ArrayData, meta: ArrayData,
      scale: Long): org.apache.spark.sql.catalyst.InternalRow = {
    var mm = fusedMetaCache.get()
    if (mm == null || (mm.gridsSrc ne grids) || (mm.metaSrc ne meta)) {
      mm = new FusedMeta(grids, meta)
      fusedMetaCache.set(mm)
    }
    val k = mm.k
    val sums = mm.sums
    val nbg = foldGrids(tokens, mm.grids, sums)
    var bestS = 0L
    var bestC = -1
    var c = 0
    while (c < k) {
      val s = scale * sums(2 + c) - nbg * mm.e4(c)
      if (bestC < 0 || s > bestS ||
          (s == bestS && mm.cls(c).compareTo(mm.cls(bestC)) > 0)) {
        bestS = s
        bestC = c
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](sums(0), sums(1), bestS, mm.cls(bestC)))
  }

  /** N-grid metadata for [[LmMultiScoreBits]]: the grids array decoded
    * into one interleaved table (identity-keyed per-thread cache — the
    * [[NbMeta]] soundness contract, enforced by the expression's
    * foldable requirement). */
  private final class MultiMeta(val source: ArrayData) {
    val k: Int = source.numElements()
    if (k < 1)
      throw new IllegalArgumentException(
        "lm_multi_score_bits needs at least one grid")
    val grids = new InterleavedGrids(k)
    val sums = new Array[Long](k) // per-thread fold scratch
    locally {
      var c = 0
      while (c < k) {
        val g = source.getArray(c)
        if (g.numElements() != 65536)
          throw new IllegalArgumentException(
            s"lm_multi_score_bits grid $c must have 65,536 entries " +
              s"(256×256 bigram codes), got ${g.numElements()}")
        var j = 0
        while (j < 65536) { grids.put(j, c, g.getLong(j)); j += 1 }
        c += 1
      }
      grids.seal()
    }
  }

  private val multiMetaCache = new ThreadLocal[MultiMeta]

  /** ALL N grid fold sums of a token array from ONE tokenize+hash pass
    * — sums(c) ≡ [[lmScoreBits]](tokens, grids(c)) bit-for-bit
    * (spec-pinned). The CCNet RATIO gate is the N = 2 case: target and
    * background previously paid two full MD5 passes over the same
    * tokens. */
  def lmMultiScoreBits(tokens: ArrayData, grids: ArrayData): ArrayData = {
    var mm = multiMetaCache.get()
    if (mm == null || (mm.source ne grids)) {
      mm = new MultiMeta(grids)
      multiMetaCache.set(mm)
    }
    foldGrids(tokens, mm.grids, mm.sums)
    new GenericArrayData(java.util.Arrays.copyOf(mm.sums, mm.k))
  }

  /** [[lmMultiScoreBits]] as a native binary expression: left = the
    * token array, right = the grids as one array<array<bigint>> literal
    * (required foldable — the identity-keyed decode cache's soundness
    * contract). Returns array<bigint> of the N fold sums. */
  case class LmMultiScoreBits(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def prettyName: String = "lm_multi_score_bits"
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(StringType, _), ArrayType(ArrayType(LongType, _), _)) =>
          if (right.foldable) TypeCheckResult.TypeCheckSuccess
          else TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires the grids to be foldable (literal " +
              "trained models — the per-thread decode cache is keyed " +
              "on their object identity)")
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<string>, array<array<bigint>>), " +
            s"got (${l.sql}, ${r.sql})")
      }
    override protected def nullSafeEval(t: Any, g: Any): Any =
      lmMultiScoreBits(t.asInstanceOf[ArrayData], g.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (t, g) =>
        s"graft.functions.TextHashFunctions.lmMultiScoreBits($t, $g)")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): LmMultiScoreBits =
      copy(left = l, right = r)
  }

  /** [[lmNbFusedBits]] as a native ternary expression: (token array,
    * the two LM grids as one array<array<bigint>> literal, the NB class
    * metadata literal). Both metadata children are required foldable
    * (the identity-keyed decode cache's soundness contract, as in
    * [[NbArgmaxBits]]). Returns struct(lp_t, lp_bg, s, cls) — drop-in
    * for the pair of LmScoreBits columns plus the NbArgmaxBits struct. */
  case class LmNbFusedBits(first: Expression, second: Expression,
      third: Expression, scale: Long)
      extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
    override def prettyName: String = "lm_nb_fused_bits"
    override val dataType: DataType = StructType(Seq(
      StructField("lp_t", LongType, nullable = false),
      StructField("lp_bg", LongType, nullable = false),
      StructField("s", LongType, nullable = false),
      StructField("cls", StringType, nullable = false)))
    override def checkInputDataTypes(): TypeCheckResult =
      (first.dataType, second.dataType, third.dataType) match {
        case (ArrayType(StringType, _),
            ArrayType(ArrayType(LongType, _), _),
            ArrayType(StructType(Array(
              StructField(_, StringType, _, _),
              StructField(_, LongType, _, _),
              StructField(_, ArrayType(LongType, _), _, _))), _)) =>
          if (second.foldable && third.foldable)
            TypeCheckResult.TypeCheckSuccess
          else TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires the LM grids and NB metadata to be " +
              "foldable (literal trained models — the per-thread decode " +
              "cache is keyed on their object identity)")
        case (a, b, c) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<string>, array<array<bigint>>, " +
            s"array<struct<string, bigint, array<bigint>>>), " +
            s"got (${a.sql}, ${b.sql}, ${c.sql})")
      }
    override protected def nullSafeEval(t: Any, g: Any, m: Any): Any =
      lmNbFusedBits(t.asInstanceOf[ArrayData], g.asInstanceOf[ArrayData],
        m.asInstanceOf[ArrayData], scale)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (t, g, m) =>
        s"graft.functions.TextHashFunctions.lmNbFusedBits($t, $g, $m, ${scale}L)")
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): LmNbFusedBits =
      copy(first = f, second = s, third = t)
  }

  /** Precomputed affine-family constants (the same "minhash-a/b-$i"
    * seeds [[PortableHash.constantA]]/[[PortableHash.constantB]]
    * derive) — computed once, not one MD5 per row per family member. */
  private val AffA = Array.tabulate(16)(PortableHash.constantA)
  private val AffB = Array.tabulate(16)(PortableHash.constantB)

  /** Per-document sparse count-min partial: ONE compiled pass over the
    * token array — hash60 each occurrence once, bump all `rows` affine
    * cells in a dense local table, emit the nonzero cells as
    * (r, b, c) structs in row-major order. Replaces the per-token
    * `explode(array(rows structs))` + interpreted affine hashes (rows×
    * tokens rows through the pipeline per document) with ≤ rows×width
    * rows per DOCUMENT; bit-equivalent to the composable
    * [[graft.operators.Sketch.cmsEntries]] form (spec-pinned). */
  /** The CMS inner loop, shared by the per-document expression and the
    * [[SketchAggregates.CmsSketchAgg]] buffer update: hash60 each
    * occurrence once, bump all `rows` affine cells of the dense table. */
  def cmsAccumulate(counts: Array[Long], tokens: ArrayData,
      rows: Int, width: Int): Unit = {
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      // pre-reduce once: (h % P) * a + b stays < 2^62, same as affine()
      val h = hash60(tokens.getUTF8String(i)) % PortableHash.P
      var r = 0
      while (r < rows) {
        val b = ((h * AffA(r) + AffB(r)) % PortableHash.P % width).toInt
        counts(r * width + b) += 1L
        r += 1
      }
      i += 1
    }
  }

  def cmsCellCounts(tokens: ArrayData, rows: Int, width: Int): ArrayData = {
    require(rows >= 1 && rows <= 16, s"cms rows must be in [1,16], got $rows")
    require(width >= 1, s"cms width must be positive, got $width")
    val counts = new Array[Long](rows * width)
    cmsAccumulate(counts, tokens, rows, width)
    var nz = 0
    var j = 0
    while (j < counts.length) { if (counts(j) != 0L) nz += 1; j += 1 }
    val out = new Array[AnyRef](nz)
    var k = 0
    j = 0
    while (j < counts.length) {
      if (counts(j) != 0L) {
        out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any]((j / width).toLong, (j % width).toLong, counts(j)))
        k += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** [[cmsCellCounts]] as a native unary expression over the token
    * array; `rows`/`width` are plan-time constants (the sketch
    * geometry), so codegen is one static call. */
  case class CmsCells(child: Expression, rows: Int, width: Int)
      extends UnaryExpression {
    override def prettyName: String = "cms_cells"
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("r", LongType, nullable = false),
      StructField("b", LongType, nullable = false),
      StructField("c", LongType, nullable = false))), containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string> tokens, got ${t.sql}")
    }
    override protected def nullSafeEval(t: Any): Any =
      cmsCellCounts(t.asInstanceOf[ArrayData], rows, width)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, t =>
        s"graft.functions.TextHashFunctions.cmsCellCounts($t, $rows, $width)")
    override protected def withNewChildInternal(c: Expression): CmsCells =
      copy(child = c)
  }

  def shingleStrings(tokens: Column, n: Int): Column =
    CatalystBridge.column(ShingleStrings(CatalystBridge.expression(tokens), n))
  def hashedShingles60(tokens: Column, n: Int): Column =
    CatalystBridge.column(HashedShingles60(CatalystBridge.expression(tokens), n))
  def minhashSig(hashed: Column, k: Int): Column =
    CatalystBridge.column(MinHashSig(CatalystBridge.expression(hashed), k))
  def simhash16(tokens: Column): Column =
    CatalystBridge.column(SimHash16(CatalystBridge.expression(tokens)))
  def cmsCells(tokens: Column, rows: Int, width: Int): Column =
    CatalystBridge.column(CmsCells(CatalystBridge.expression(tokens), rows, width))
  def lmScoreBits(tokens: Column, grid: Column): Column =
    CatalystBridge.column(LmScoreBits(
      CatalystBridge.expression(tokens), CatalystBridge.expression(grid)))
  def weightedBucketSum(hashed: Column, weights: Column): Column =
    CatalystBridge.column(WeightedBucketSum(
      CatalystBridge.expression(hashed), CatalystBridge.expression(weights)))
  def nbArgmaxBits(tokens: Column, meta: Column, scale: Long): Column =
    CatalystBridge.column(NbArgmaxBits(
      CatalystBridge.expression(tokens), CatalystBridge.expression(meta), scale))
  def lmNbFusedBits(tokens: Column, grids: Column, meta: Column,
      scale: Long): Column =
    CatalystBridge.column(LmNbFusedBits(
      CatalystBridge.expression(tokens), CatalystBridge.expression(grids),
      CatalystBridge.expression(meta), scale))
  def lmMultiScoreBits(tokens: Column, grids: Column): Column =
    CatalystBridge.column(LmMultiScoreBits(
      CatalystBridge.expression(tokens), CatalystBridge.expression(grids)))
}
