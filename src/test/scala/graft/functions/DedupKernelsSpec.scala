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
