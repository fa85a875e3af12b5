package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.functions.{MortonFunctions, PortableHash, TopKAggregator}

/** Property-based invariants for the pure (driver-evaluable) kernels the
  * distributed operators are built on. Example-based specs pin known
  * values; these pin the ALGEBRA — the properties that make the
  * operators partition-safe (associativity, range closure, bijectivity)
  * — over generated inputs. No SparkSession: everything here is the
  * scalar layer underneath the column expressions. */
class PropertySpec extends AnyFunSuite with Matchers {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    withClue(r.status.toString) { r.passed shouldBe true }
  }

  test("portable hash: 60-bit non-negative for arbitrary strings") {
    check(Prop.forAll(Gen.asciiPrintableStr) { s =>
      val h = PortableHash.seedLong(s)
      h >= 0L && h < (1L << 60)
    })
  }

  test("portable hash: affine family constants stay in their documented ranges") {
    check(Prop.forAll(Gen.choose(0, 4096)) { i =>
      val a = PortableHash.constantA(i)
      val b = PortableHash.constantB(i)
      a >= 1L && a <= PortableHash.P - 1 && b >= 0L && b < PortableHash.P &&
        // the overflow-safety claim in the Scaladoc: (h mod P) * a < 2^62
        (PortableHash.P - 1) <= Long.MaxValue / a
    })
  }

  test("top-K buffer: any split point merges to the global sorted take") {
    val entry = for {
      m <- Gen.stringOfN(3, Gen.alphaChar)
      s <- Gen.chooseNum(-100.0, 100.0)
    } yield (m, s)
    val gen = for {
      xs <- Gen.listOf(entry)
      k <- Gen.choose(1, 8)
      cut <- Gen.choose(0, xs.length)
    } yield (xs, k, cut)
    check(Prop.forAll(gen) { case (xs, k, cut) =>
      val agg = new TopKAggregator(k)
      def fold(ys: Seq[(String, Double)]) = ys.foldLeft(agg.zero)(agg.reduce)
      val (l, r) = xs.splitAt(cut)
      val merged = agg.merge(fold(l), fold(r))
      val expected = xs.sortBy { case (m, s) => (-s, m) }.take(k)
      merged == expected
    })
  }

  test("top-K buffer: merge is commutative") {
    val entry = Gen.zip(Gen.stringOfN(2, Gen.alphaChar),
      Gen.chooseNum(-10.0, 10.0))
    check(Prop.forAll(Gen.listOf(entry), Gen.listOf(entry)) { (xs, ys) =>
      val agg = new TopKAggregator(5)
      def fold(zs: Seq[(String, Double)]) = zs.foldLeft(agg.zero)(agg.reduce)
      agg.merge(fold(xs), fold(ys)) == agg.merge(fold(ys), fold(xs))
    })
  }

  test("two-level prefix sum: bucketed local cumsums + offsets equal the flat scan") {
    // the decomposition curate_token_budget / curate_pack_chunks /
    // op_pps_sample all rely on: rows hash into buckets, each bucket
    // cumsums independently, prior-bucket totals are added back as
    // offsets — and the result must equal one sequential scan in
    // (bucket, ord) order, for ANY weights and ANY bucket count
    val gen = for {
      ws <- Gen.nonEmptyListOf(Gen.choose(1L, 50L))
      nb <- Gen.choose(1, 8)
    } yield (ws, nb)
    check(Prop.forAll(gen) { case (ws, nb) =>
      val rows = ws.zipWithIndex.map { case (w, i) =>
        val h = PortableHash.seedLong(s"$i|prop")
        (h % nb, h, i, w) // (bucket, ord, tiebreak, weight)
      }
      val sorted = rows.sortBy { case (b, o, i, _) => (b, o, i) }
      val flat = sorted.scanLeft(0L)(_ + _._4).tail
      val bucketTotal = sorted.groupBy(_._1).view.mapValues(_.map(_._4).sum)
      val buckets = bucketTotal.keys.toSeq.sorted
      val offset = buckets.zip(
        buckets.scanLeft(0L)((acc, b) => acc + bucketTotal(b)).init).toMap
      val twoLevel = sorted.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
        case (b, rs) => rs.scanLeft(0L)(_ + _._4).tail.map(_ + offset(b))
      }
      twoLevel == flat
    })
  }

  test("PPS rule: step-multiple crossings select exactly total div step rows") {
    // the fixed-sample-size guarantee op_pps_sample is built on: each
    // multiple of the step lands in exactly one (cum-w, cum] interval.
    // Exact equality requires every w <= step (w > step means one row
    // swallows several multiples — certainty units in PPS terms, and
    // op_pps_sample's step 4096 is far above the max weight 50); with
    // arbitrary weights the count can only shrink, never grow
    val gen = Gen.zip(
      Gen.nonEmptyListOf(Gen.choose(1L, 50L)), Gen.choose(50L, 200L))
    check(Prop.forAll(gen) { case (ws, step) =>
      val cums = ws.scanLeft(0L)(_ + _).tail
      val selected = ws.zip(cums).count { case (w, c) =>
        c / step > (c - w) / step }
      selected == cums.last / step
    })
    val genAny = Gen.zip(
      Gen.nonEmptyListOf(Gen.choose(1L, 50L)), Gen.choose(1L, 200L))
    check(Prop.forAll(genAny) { case (ws, step) =>
      val cums = ws.scanLeft(0L)(_ + _).tail
      val selected = ws.zip(cums).count { case (w, c) =>
        c / step > (c - w) / step }
      selected <= cums.last / step
    })
  }

  test("chunk packing: spans tile the token stream, chunk ids advance by at most one") {
    val gen = Gen.zip(
      Gen.nonEmptyListOf(Gen.choose(1L, 600L)), Gen.choose(1L, 512L))
    check(Prop.forAll(gen) { case (ws, ctx) =>
      val cums = ws.scanLeft(0L)(_ + _).tail
      val spans = ws.zip(cums).map { case (n, cum) =>
        (((cum - n) / ctx), ((cum - 1) / ctx)) }
      val ordered = spans.forall { case (f, l) => f <= l }
      val contiguous = spans.zip(spans.drop(1)).zip(cums).forall {
        case (((_, l), (f2, _)), cum) =>
          f2 == (if (cum % ctx == 0) l + 1 else l) }
      ordered && contiguous && cums.last == ws.sum
    })
  }

  test("cms accumulate: conservation, naive-reference equality, and the merge law") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.TextHashFunctions
    val rows = 4; val width = 256
    def arr(tokens: List[String]) =
      new GenericArrayData(tokens.map(UTF8String.fromString).toArray[Any])
    def cms(tokens: List[String]): Array[Long] = {
      val c = new Array[Long](rows * width)
      TextHashFunctions.cmsAccumulate(c, arr(tokens), rows, width)
      c
    }
    val gen = for {
      xs <- Gen.listOf(Gen.asciiPrintableStr)
      cut <- Gen.choose(0, xs.length)
    } yield (xs, cut)
    check(Prop.forAll(gen) { case (tokens, cut) =>
      val cells = cms(tokens)
      // conservation: every hash row receives exactly one bump per
      // occurrence — Σ cells per row = |tokens| (the spec-pinned law
      // behind Σcells = N in the oracle)
      val perRow = (0 until rows).map(r =>
        (0 until width).map(b => cells(r * width + b)).sum)
      val conserved = perRow.forall(_ == tokens.length.toLong)
      // naive reference: one affine evaluation per (token, row) via the
      // public PortableHash constants — the aggregate's inner loop must
      // agree cell for cell
      val naive = new Array[Long](rows * width)
      tokens.foreach { t =>
        val h = TextHashFunctions.hash60(UTF8String.fromString(t)) %
          PortableHash.P
        (0 until rows).foreach { r =>
          val b = ((h * PortableHash.constantA(r) + PortableHash.constantB(r))
            % PortableHash.P % width).toInt
          naive(r * width + b) += 1L
        }
      }
      // merge law: accumulating a split's halves separately and adding
      // cell-wise equals one pass — the property that makes the sketch
      // a partition-safe aggregation buffer
      val (l, r) = tokens.splitAt(cut)
      val merged = cms(l).zip(cms(r)).map { case (a, b) => a + b }
      conserved && cells.sameElements(naive) && cells.sameElements(merged)
    })
  }

  test("hll update: naive-reference equality, idempotence, and the max-merge law") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.{SketchAggregates, TextHashFunctions}
    val m = 64
    val agg = SketchAggregates.HllSketchAgg(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType), nullable = true), m)
    def regs(tokens: List[String]): Array[Long] = {
      // drive the buffer through the public update path via an input row
      val buf = agg.createAggregationBuffer()
      val arr = new GenericArrayData(
        tokens.map(UTF8String.fromString).toArray[Any])
      val row = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](arr))
      agg.update(buf, row)
      buf
    }
    val gen = for {
      xs <- Gen.listOf(Gen.asciiPrintableStr)
      cut <- Gen.choose(0, xs.length)
    } yield (xs, cut)
    check(Prop.forAll(gen) { case (tokens, cut) =>
      val r = regs(tokens)
      // naive reference: bucket = low 6 bits of hash60, rank = 55 -
      // bitlen of the remaining 54 bits (all-zero word → 55), register
      // keeps the max
      val naive = new Array[Long](m)
      tokens.foreach { t =>
        val h = TextHashFunctions.hash60(UTF8String.fromString(t))
        val b = (h & (m - 1)).toInt
        val w = h >>> 6
        val rho = 55L - (64 - java.lang.Long.numberOfLeadingZeros(w))
        if (rho > naive(b)) naive(b) = rho
      }
      // idempotence: feeding the list twice changes nothing (the
      // property that makes duplicates free and replays safe)
      val twice = regs(tokens ++ tokens)
      // max-merge law: splitting at any point and merging register-wise
      // equals the single pass — the partition-safety property
      val merged = agg.merge(regs(tokens.take(cut)), regs(tokens.drop(cut)))
      r.sameElements(naive) && twice.sameElements(r) &&
        merged.sameElements(r) &&
        r.forall(v => v >= 0L && v <= 55L)
    })
  }

  test("kmv update: naive-reference equality, idempotence, and the union-merge law") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.{SketchAggregates, TextHashFunctions}
    val k = 8
    val agg = SketchAggregates.KmvSketchAgg(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType), nullable = true), k)
    def mins(tokens: List[String]): java.util.TreeSet[java.lang.Long] = {
      val buf = agg.createAggregationBuffer()
      val arr = new GenericArrayData(
        tokens.map(UTF8String.fromString).toArray[Any])
      val row = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](arr))
      agg.update(buf, row)
      buf
    }
    def toSeq(b: java.util.TreeSet[java.lang.Long]): Seq[Long] = {
      val sb = Seq.newBuilder[Long]
      val it = b.iterator()
      while (it.hasNext) sb += it.next()
      sb.result()
    }
    val gen = for {
      xs <- Gen.listOf(Gen.asciiPrintableStr)
      cut <- Gen.choose(0, xs.length)
    } yield (xs, cut)
    check(Prop.forAll(gen) { case (tokens, cut) =>
      val r = toSeq(mins(tokens))
      // naive reference: the k smallest DISTINCT hash60 values, ascending
      val naive = tokens
        .map(t => TextHashFunctions.hash60(UTF8String.fromString(t)))
        .distinct.sorted.take(k)
      // idempotence: duplicates are free by set semantics (the property
      // that makes at-least-once replays safe)
      val twice = toSeq(mins(tokens ++ tokens))
      // union-merge law: splitting at any point and merging equals the
      // single pass — the partition-safety property
      val merged = toSeq(agg.merge(mins(tokens.take(cut)),
        mins(tokens.drop(cut))))
      r == naive && twice == r && merged == r &&
        r.sliding(2).forall(p => p.length < 2 || p(0) < p(1))
    })
  }

  test("morton: interleave16 is a bijection on 16-bit pairs") {
    def despread(z: Long): Long = {
      var v = z & 0x5555555555555555L
      v = (v | (v >>> 1)) & 0x3333333333333333L
      v = (v | (v >>> 2)) & 0x0f0f0f0f0f0f0f0fL
      v = (v | (v >>> 4)) & 0x00ff00ff00ff00ffL
      v = (v | (v >>> 8)) & 0x0000ffff0000ffffL
      (v | (v >>> 16)) & 0x00000000ffffffffL
    }
    val coord = Gen.choose(0L, 0xffffL)
    check(Prop.forAll(coord, coord) { (x, y) =>
      val z = MortonFunctions.interleave16(x, y)
      despread(z) == x && despread(z >>> 1) == y
    })
  }

  test("morton: spread16 keeps relative order of 16-bit values") {
    val coord = Gen.choose(0L, 0xffffL)
    check(Prop.forAll(coord, coord) { (x, y) =>
      (x < y) == (MortonFunctions.spread16(x) < MortonFunctions.spread16(y))
    })
  }
}
