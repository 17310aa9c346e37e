package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Direct kernel tests — the query-level oracles exercise these through
  * full plans; these pin the kernel contracts in isolation. */
class DedupKernelsSpec extends AnyFunSuite {

  private def strs(xs: String*) =
    new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])
  private def longs(xs: Long*) = new GenericArrayData(xs.toArray)

  test("sortedIntersectCount: sorted string arrays, duplicates absent") {
    assert(DedupKernels.sortedIntersectCount(
      strs("a", "b", "d"), strs("b", "c", "d")) == 2)
    assert(DedupKernels.sortedIntersectCount(strs(), strs("a")) == 0)
    assert(DedupKernels.sortedIntersectCount(
      strs("a", "b"), strs("a", "b")) == 2)
  }

  test("sortedIntersectCountLong: primitive merge") {
    assert(DedupKernels.sortedIntersectCountLong(
      longs(1L, 5L, 9L), longs(2L, 5L, 9L, 11L)) == 2)
    assert(DedupKernels.sortedIntersectCountLong(longs(), longs()) == 0)
    // negative values sort below positive — still a valid merge
    assert(DedupKernels.sortedIntersectCountLong(
      longs(-3L, 0L, 7L), longs(-3L, 7L)) == 2)
  }

  test("hash120Array: pair-sorted interleaving, first long = posting hash") {
    val gs = strs("gamma", "alpha", "beta")
    val wide = DedupKernels.hash120Array(gs, 0, 1)
    assert(wide.numElements() == 6)
    val pairs = (0 until 3).map(i => (wide.getLong(2 * i), wide.getLong(2 * i + 1)))
    // sorted lexicographically by (h0, h1)
    assert(pairs.sliding(2).forall { case Seq(a, b) =>
      a._1 < b._1 || (a._1 == b._1 && a._2 <= b._2) })
    // each pair's first long is the seed-0 60-bit hash, second is seed-1
    val h0 = Seq("gamma", "alpha", "beta")
      .map(s => DedupKernels.hash60(UTF8String.fromString(s), 0)).sorted
    assert(pairs.map(_._1) == h0)
    pairs.foreach { case (a, b) => assert(a != b) }
  }

  test("sortedIntersectCountLong2: a forced 60-bit collision does not count") {
    // Craft arrays where the FIRST longs collide (h0=5) but the second
    // longs differ — i.e. two different grams that would be conflated by
    // the 60-bit kernel. The pair merge must NOT count them; the single-
    // long merge over the same first-long projection (wrongly) does —
    // which is exactly the >10^8-gram failure mode the wide hash closes.
    val a = longs(1L, 10L, 5L, 100L, 9L, 30L) // pairs (1,10) (5,100) (9,30)
    val b = longs(2L, 20L, 5L, 200L, 9L, 30L) // pairs (2,20) (5,200) (9,30)
    assert(DedupKernels.sortedIntersectCountLong2(a, b) == 1) // only (9,30)
    assert(DedupKernels.sortedIntersectCountLong(
      longs(1L, 5L, 9L), longs(2L, 5L, 9L)) == 2) // 60-bit merge conflates 5
    // true matches still count in pair mode
    val c = longs(5L, 100L, 9L, 30L)
    assert(DedupKernels.sortedIntersectCountLong2(a, c) == 2)
  }

  test("rollingHash: code-point fold matches the closed form") {
    // "ab" → (0*31+97)*31+98 = 3105
    assert(DedupKernels.rollingHash(UTF8String.fromString("ab"),
      2147483647L) == 3105L)
    assert(DedupKernels.rollingHash(UTF8String.fromString(""),
      2147483647L) == 0L)
    // multi-byte code point folds as ONE value (ord semantics):
    // 'é' = U+00E9 = 233
    assert(DedupKernels.rollingHash(UTF8String.fromString("é"),
      2147483647L) == 233L)
  }

  test("unorderedPairs: full expansion below cap, star pattern above") {
    import org.apache.spark.sql.types.LongType
    val full = DedupKernels.unorderedPairs(longs(1L, 2L, 3L), LongType, 10)
    assert(full.numElements() == 3) // (1,2) (1,3) (2,3)
    val star = DedupKernels.unorderedPairs(longs(1L, 2L, 3L, 4L), LongType, 3)
    assert(star.numElements() == 3) // (1,2) (1,3) (1,4)
    val uncapped = DedupKernels.unorderedPairs(longs(1L, 2L, 3L, 4L), LongType, 0)
    assert(uncapped.numElements() == 6)
  }

  test("hash60 equals the md5-prefix definition") {
    // reference computation straight from MessageDigest
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("0|abc".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    val expected = java.lang.Long.parseLong(hex, 16)
    assert(DedupKernels.hash60(UTF8String.fromString("abc"), 0) == expected)
  }
}
