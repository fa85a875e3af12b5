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
