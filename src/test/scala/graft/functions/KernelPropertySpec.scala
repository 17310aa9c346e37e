package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Seeded algebraic property tests for the dedup/vector kernels —
  * laws that must hold for ANY constants, so they pin kernel semantics
  * without re-deriving the hash family:
  *
  *   - MinHash is a per-component MINIMUM over set elements, so
  *     sig(A ∪ B) = componentwise min(sig(A), sig(B)) and the
  *     signature is permutation- and duplication-invariant;
  *   - SimHash signs are weight-ratio functions, so doubling every
  *     element (A ++ A) never flips a bit, and permutation never
  *     changes the result;
  *   - sortedIntersectCountLong equals the Set-model intersection;
  *   - rollingHash equals the BigInt closed form;
  *   - shingles equal the naive distinct sliding window;
  *   - band 0 of the banded LSH signature with the full plane count
  *     equals the single-bucket hyperplane signature (same md5 plane
  *     family, by construction);
  *   - int8 quantization: scale = max|x|/127, every reconstruction
  *     error ≤ scale/2 (+1 ulp), mean ≤ max.
  */
class KernelPropertySpec extends AnyFunSuite {

  private def gen[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(fail(s"gen failed for seed $seed"))

  private def longs(seed: Long, n: Int): Array[Long] =
    gen(Gen.listOfN(n, Gen.chooseNum(0L, (1L << 60) - 1)), seed)
      .toArray.distinct

  private def arr(xs: Array[Long]): ArrayData =
    new GenericArrayData(xs.map(x => x: Any))

  test("minhash: sig(A ++ B) is the componentwise min of the sigs " +
    "and is permutation/duplication invariant (100 seeds)") {
    for (seed <- 0L until 100L) {
      val a = longs(seed, 1 + (seed % 40).toInt)
      val b = longs(seed + 500, 1 + ((seed * 7) % 40).toInt)
      val sa = DedupKernels.minhashSig(arr(a)).toLongArray()
      val sb = DedupKernels.minhashSig(arr(b)).toLongArray()
      val su = DedupKernels.minhashSig(arr(a ++ b)).toLongArray()
      assert(su.sameElements(sa.zip(sb).map { case (x, y) => math.min(x, y) }),
        s"seed $seed: union law broken")
      val shuffled = new scala.util.Random(seed).shuffle(a.toSeq).toArray
      assert(DedupKernels.minhashSig(arr(shuffled)).toLongArray()
        .sameElements(sa), s"seed $seed: permutation changed the sig")
      assert(DedupKernels.minhashSig(arr(a ++ a)).toLongArray()
        .sameElements(sa), s"seed $seed: duplication changed the sig")
    }
  }

  test("simhash48: doubling weights and permutation never change the " +
    "signature (100 seeds)") {
    for (seed <- 0L until 100L) {
      val a = longs(seed, 1 + (seed % 40).toInt)
      val s1 = DedupKernels.simhash48(arr(a), 48)
      assert(DedupKernels.simhash48(arr(a ++ a), 48) == s1,
        s"seed $seed: doubling flipped a bit")
      val shuffled = new scala.util.Random(seed).shuffle(a.toSeq).toArray
      assert(DedupKernels.simhash48(arr(shuffled), 48) == s1,
        s"seed $seed: permutation changed the simhash")
    }
  }

  test("sortedIntersectCountLong equals the Set model (200 seeds)") {
    for (seed <- 0L until 200L) {
      val a = longs(seed, 1 + (seed % 60).toInt).sorted
      val b = longs(seed + 900, 1 + ((seed * 3) % 60).toInt).sorted
      val got = DedupKernels.sortedIntersectCountLong(arr(a), arr(b))
      assert(got == a.toSet.intersect(b.toSet).size, s"seed $seed")
    }
  }

  test("rollingHash equals the BigInt closed form (200 seeds)") {
    val mod = 2147483647L
    val chars = Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', 'é', '中', '!'))
    for (seed <- 0L until 200L) {
      val s = gen(Gen.listOfN(1 + (seed % 50).toInt, chars), seed).mkString
      val got = DedupKernels.rollingHash(UTF8String.fromString(s), mod)
      val want = s.codePoints().toArray.foldLeft(BigInt(0)) {
        (acc, cp) => (acc * 31 + cp) % mod
      }
      assert(BigInt(got) == want, s"seed $seed: '$s'")
    }
  }

  test("shingles equal the naive distinct sliding window (100 seeds)") {
    val word = Gen.listOfN(3, Gen.alphaLowerChar).map(_.mkString)
    for (seed <- 0L until 100L) {
      val words = gen(Gen.listOfN(2 + (seed % 20).toInt, word), seed)
      val text = words.mkString(" ")
      for (k <- Seq(2, 3, 5)) {
        val got = DedupKernels.shingles(UTF8String.fromString(text), k)
          .toObjectArray(org.apache.spark.sql.types.StringType)
          .map(_.toString)
        // kernel contract: a doc shorter than k words still yields ONE
        // (truncated) shingle, so every doc participates in dedup
        val want =
          if (words.length < k) Seq(words.mkString(" "))
          else words.sliding(k).map(_.mkString(" ")).toSeq.distinct
        assert(got.toSeq == want, s"seed $seed k=$k: '$text'")
      }
    }
  }

  test("banded signature band 0 with the full plane count equals the " +
    "hyperplane signature (100 seeds)") {
    import graft.similarity.Ann
    val n = Ann.NPlanes
    for (seed <- 0L until 100L) {
      val e = gen(Gen.listOfN(Ann.Dim,
        Gen.chooseNum(-4.0, 4.0).map(_.toFloat)), seed).toArray
      val ad = new GenericArrayData(e.map(x => x: Any))
      val banded = VectorKernels
        .bandedSig(ad, Ann.bandedPlaneMatrix(n), 1, n).toIntArray()
      assert(banded.length == 1)
      assert(banded(0) == VectorKernels.hyperplaneSig(ad, Ann.planeMatrix),
        s"seed $seed: plane family diverged between kernels")
    }
  }

  test("quantizeStats: exact scale, half-step error bound, mean <= max " +
    "(200 seeds)") {
    for (seed <- 0L until 200L) {
      val e = gen(Gen.listOfN(1 + (seed % 64).toInt,
        Gen.chooseNum(-8.0, 8.0).map(_.toFloat)), seed).toArray
      val ad = new GenericArrayData(e.map(x => x: Any))
      val Array(scale, maxErr, meanErr) =
        VectorKernels.quantizeStats(ad).toDoubleArray()
      val wantScale = e.map(x => math.abs(x.toDouble)).max / 127.0
      assert(scale == wantScale)
      assert(meanErr <= maxErr + 1e-12)
      if (scale > 0)
        assert(maxErr <= scale / 2 + math.ulp(scale) * 4,
          s"seed $seed: err $maxErr exceeds half-step ${scale / 2}")
      else assert(maxErr == 0.0 && meanErr == 0.0)
    }
  }
}
