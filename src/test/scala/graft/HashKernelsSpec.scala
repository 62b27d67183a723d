package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HashKernels._

class HashKernelsSpec extends AnyFunSuite {

  private def arr(ss: Seq[String]) =
    new GenericArrayData(ss.map(s => UTF8String.fromString(s)).toArray[Any])

  test("mulMod61 matches BigInt modular multiplication") {
    val rnd = new scala.util.Random(42)
    (0 until 2000).foreach { _ =>
      val x = rnd.nextLong().abs % MersennePrime
      val y = rnd.nextLong().abs % MersennePrime
      assert(mulMod61(x, y) ==
        ((BigInt(x) * BigInt(y)) mod BigInt(MersennePrime)).toLong)
    }
  }

  test("mod61 reduces any long into [0, p)") {
    val rnd = new scala.util.Random(7)
    val samples = Seq(0L, -1L, Long.MaxValue, Long.MinValue, MersennePrime,
      MersennePrime - 1, MersennePrime + 1) ++ (0 until 2000).map(_ => rnd.nextLong())
    samples.foreach { x =>
      val r = mod61(x)
      assert(r >= 0 && r < MersennePrime, s"x=$x r=$r")
    }
  }

  test("minhash signature estimates Jaccard similarity") {
    val k = 128
    val a = (0 until 100).map(i => s"gram-$i")
    val b = (20 until 120).map(i => s"gram-$i") // |∩|=80, |∪|=120 → J=2/3
    val sa = minhashSig(arr(a), k).toLongArray()
    val sb = minhashSig(arr(b), k).toLongArray()
    val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / k
    assert(math.abs(est - 2.0 / 3.0) < 0.15, s"est=$est")
  }

  test("minhash of identical sets is identical; disjoint sets differ") {
    val a = (0 until 50).map(i => s"g$i")
    assert(minhashSig(arr(a), 64).toLongArray().toSeq ==
      minhashSig(arr(a), 64).toLongArray().toSeq)
    val b = (100 until 150).map(i => s"g$i")
    val same = minhashSig(arr(a), 64).toLongArray()
      .zip(minhashSig(arr(b), 64).toLongArray()).count { case (x, y) => x == y }
    assert(same <= 4)
  }

  test("simhash: near-identical token lists have small hamming distance") {
    val a = (0 until 200).map(i => s"tok${i % 40}")
    val b = a.updated(5, "CHANGED").updated(77, "OTHER")
    val ha = simhash64(arr(a))
    val hb = simhash64(arr(b))
    val dist = java.lang.Long.bitCount(ha ^ hb)
    assert(dist <= 12, s"hamming=$dist")
    val c = (0 until 200).map(i => s"different${i % 37}")
    val far = java.lang.Long.bitCount(ha ^ simhash64(arr(c)))
    assert(far > 12, s"unrelated hamming=$far")
  }

  test("rolling fingerprint is deterministic and edit-sensitive") {
    val t1 = UTF8String.fromString("the quick brown fox jumps over the lazy dog")
    assert(rollingFingerprint(t1, 16) == rollingFingerprint(t1, 16))
    // appending text can only lower or keep the min-window hash when the
    // original windows are preserved as a subset
    val t2 = UTF8String.fromString("the quick brown fox jumps over the lazy dog and more")
    assert(rollingFingerprint(t2, 16) <= rollingFingerprint(t1, 16))
  }

  test("cosineF matches a straightforward double computation") {
    val a = new GenericArrayData(Array[Any](1.0f, 2.0f, 3.0f))
    val b = new GenericArrayData(Array[Any](-1.0f, 0.5f, 2.0f))
    val dot = 1.0 * -1.0 + 2.0 * 0.5 + 3.0 * 2.0
    val expect = dot / (math.sqrt(1.0 + 4.0 + 9.0) * math.sqrt(1.0 + 0.25 + 4.0))
    assert(cosineF(a, b) == expect)
  }

  test("hyperplane signature is deterministic and within bit width") {
    val v = new GenericArrayData(Array[Any](0.3f, -0.2f, 0.9f, 0.1f))
    val s1 = hyperplaneSig(v, 0, 8)
    assert(s1 == hyperplaneSig(v, 0, 8))
    assert(s1 >= 0 && s1 < 256)
    // different tables give (generally) different bucketings
    assert((0 until 8).map(t => hyperplaneSig(v, t, 8)).distinct.size > 1)
  }
}
