package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.unsafe.types.UTF8String

/** Property-based invariants (scalacheck generators, fixed seeds) for the
  * hand-written kernels — the parts where a single wrong byte silently
  * corrupts results at scale. */
class PropertySpec extends AnyFunSuite {

  /** Deterministic mini-forAll: 100 seeded samples per property. */
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    (0 until 100).foreach { i =>
      f(ga.pureApply(Gen.Parameters.default, Seed(42L + i)),
        gb.pureApply(Gen.Parameters.default, Seed(1042L + i)))
    }

  private def forAll[A](ga: Gen[A])(f: A => Unit): Unit =
    (0 until 100).foreach { i =>
      f(ga.pureApply(Gen.Parameters.default, Seed(7042L + i)))
    }

  test("fnv hash of string bytes is injective-ish and stable") {
    forAll(Gen.alphaNumStr, Gen.alphaNumStr) { (a: String, b: String) =>
      val ha = FnvHash64.hashUtf8(UTF8String.fromString(a))
      val hb = FnvHash64.hashUtf8(UTF8String.fromString(b))
      assert((a == b) == (ha == hb) || a != b) // equal inputs always collide; unequal may
      if (a == b) assert(ha === hb)
    }
  }

  test("hashLongBits over n LE bytes equals hashBytes of the explicit array") {
    forAll(Gen.choose(Long.MinValue, Long.MaxValue), Gen.choose(1, 8)) { (v: Long, n: Int) =>
      val bytes = (0 until n).map(i => ((v >>> (8 * i)) & 0xff).toByte).toArray
      assert(FnvHash64.hashLongBits(v, n) === FnvHash64.hashBytes(bytes, n))
    }
  }

  test("GroupConcat serialize/deserialize roundtrips any buffer") {
    val agg = new GroupConcat(org.apache.spark.sql.catalyst.expressions.Literal("x"))
    forAll(Gen.listOf(Gen.asciiPrintableStr)) { (xs: List[String]) =>
      val buf = scala.collection.mutable.ArrayBuffer(xs.map(UTF8String.fromString): _*)
      val back = agg.deserialize(agg.serialize(buf))
      assert(back.map(_.toString).toList === xs)
    }
  }

  test("SampleAgg merge is order- and partitioning-insensitive (bottom-k lattice)") {
    val agg = new SampleAgg(org.apache.spark.sql.catalyst.expressions.Literal("x"))
    def bufOf(vals: List[String]) = {
      // build a buffer through the same serde-visible path merge uses
      val s = agg.createAggregationBuffer()
      vals.foreach { v =>
        val u = UTF8String.fromString(v)
        agg.merge(s, scala.collection.mutable.TreeMap(FnvHash64.hashUtf8(u) -> u))
      }
      s
    }
    forAll(Gen.listOf(Gen.alphaNumStr), Gen.listOf(Gen.alphaNumStr)) { (xs: List[String], ys: List[String]) =>
      val ab = agg.merge(bufOf(xs), bufOf(ys)).values.map(_.toString).toList
      val ba = agg.merge(bufOf(ys), bufOf(xs)).values.map(_.toString).toList
      val whole = bufOf(xs ++ ys).values.map(_.toString).toList
      assert(ab === ba)      // commutative
      assert(ab === whole)   // partitioning-insensitive: merge of parts == whole
      assert(ab.size <= SampleAgg.K)
    }
  }
}
