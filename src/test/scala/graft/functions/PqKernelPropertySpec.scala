package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Seeded property tests for [[PqKernels]] — pure driver-side kernels,
  * SYNTHETIC codebooks (the production books are just a double[][][]
  * parameter), deterministic seeds so failures replay exactly.
  *
  * The load-bearing invariants:
  *   - encode is the naive per-subspace argmin with ties to the lower
  *     code (the oracle's ORDER BY dist, c);
  *   - adcMicros is the naive Σ_j round(L2²·1e6) of exact longs;
  *   - a vector's ADC against its OWN codes equals its distortion sum
  *     (the chosen centroid IS the nearest one) — the identity that
  *     ties x52's ranking metric to x53's quality monitor;
  *   - short (ragged) vectors never crash and still code in-range.
  */
class PqKernelPropertySpec extends AnyFunSuite {

  private val M = 4
  private val Sub = 4
  private val Ks = 8
  private val Dim = M * Sub

  private def genFloats(n: Int, seed: Long): Array[Float] =
    Gen.listOfN(n, Gen.chooseNum(-4.0, 4.0).map(_.toFloat))
      .apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(fail(s"gen failed for seed $seed")).toArray

  private def genBooks(seed: Long): Array[Array[Array[Double]]] = {
    val flat = Gen.listOfN(M * Ks * Sub, Gen.chooseNum(-4.0, 4.0))
      .apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(fail(s"gen failed for seed $seed")).toArray
    Array.tabulate(M)(j => Array.tabulate(Ks)(c =>
      Array.tabulate(Sub)(i => flat(j * Ks * Sub + c * Sub + i))))
  }

  private def arr(f: Array[Float]): GenericArrayData =
    new GenericArrayData(f.map(x => x: Any))

  // zero-pad past the end — the training-parity convention the
  // kernels implement
  private def naiveSubL2(e: Array[Float], cent: Array[Double],
                         off: Int): Double = {
    var acc = 0.0
    var i = 0
    while (i < cent.length) {
      val x = if (off + i < e.length) e(off + i).toDouble else 0.0
      val d = x - cent(i); acc += d * d; i += 1
    }
    acc
  }

  private def naiveEncode(e: Array[Float],
                          books: Array[Array[Array[Double]]]): Array[Int] =
    Array.tabulate(books.length) { j =>
      val ds = books(j).map(naiveSubL2(e, _, j * Sub))
      ds.indexOf(ds.min) // indexOf = first minimum = lower-code tie-break
    }

  test("encode matches the naive argmin with lower-code ties (200 seeds)") {
    for (seed <- 0L until 200L) {
      val books = genBooks(seed)
      val e = genFloats(Dim, seed + 1000)
      val got = PqKernels.encode(arr(e), books).toIntArray()
      assert(got.sameElements(naiveEncode(e, books)), s"seed $seed")
      assert(got.forall(c => c >= 0 && c < Ks))
    }
  }

  test("adcMicros is the exact naive micro-unit long sum (200 seeds)") {
    for (seed <- 0L until 200L) {
      val books = genBooks(seed)
      val q = genFloats(Dim, seed + 2000)
      val codes = naiveEncode(genFloats(Dim, seed + 3000), books)
      val got = PqKernels.adcMicros(
        new GenericArrayData(codes.map(x => x: Any)), arr(q), books)
      val want = codes.zipWithIndex.map { case (c, j) =>
        Math.round(naiveSubL2(q, books(j)(c), j * Sub) * 1e6)
      }.sum
      assert(got == want && got >= 0L, s"seed $seed: $got != $want")
    }
  }

  test("self-ADC equals the distortion sum (200 seeds)") {
    for (seed <- 0L until 200L) {
      val books = genBooks(seed)
      val e = genFloats(Dim, seed + 4000)
      val codes = PqKernels.encode(arr(e), books)
      val selfAdc = PqKernels.adcMicros(codes, arr(e), books)
      val distort = PqKernels.distortMicros(arr(e), books).toLongArray()
      assert(distort.length == M)
      assert(selfAdc == distort.sum,
        s"seed $seed: self-ADC $selfAdc != distortion ${distort.sum}")
    }
  }

  test("ragged vectors (shorter than Dim) follow the zero-pad training " +
    "parity: encode == naive over the padded vector (100 seeds)") {
    for (seed <- 0L until 100L) {
      val books = genBooks(seed)
      val n = (seed % Dim).toInt // 0..Dim-1 elements
      val e = genFloats(n, seed + 5000)
      val codes = PqKernels.encode(arr(e), books).toIntArray()
      assert(codes.length == M && codes.forall(c => c >= 0 && c < Ks))
      // the kernel must see exactly what the trainer saw: the vector
      // zero-padded to Dim — so encoding the padded vector explicitly
      // gives the identical codes
      val padded = e ++ Array.fill(Dim - n)(0.0f)
      assert(codes.sameElements(
        PqKernels.encode(arr(padded), books).toIntArray()),
        s"seed $seed: ragged and zero-padded encodings diverge")
      assert(codes.sameElements(naiveEncode(e, books)), s"seed $seed")
      val d = PqKernels.distortMicros(arr(e), books).toLongArray()
      assert(d.forall(_ >= 0L))
      assert(d.sameElements(
        PqKernels.distortMicros(arr(padded), books).toLongArray()))
    }
  }
}
