package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** The content transforms behind the scaled bench datasets: the whole
  * point of the permutations is that NO two copies share a transform
  * (a shared transform makes those copies exact twins and reinstates
  * the quadratic near-dup pair artifact the transforms exist to kill —
  * the first, periodic cut was measured at 115× LSH pairs for 10× data
  * at factor 100). These pin the injectivity and bijection properties
  * at the tool's maximum factor.
  */
class ScaleUpSpec extends AnyFunSuite {

  test("letter transform is a bijection of a–z for every copy") {
    for (i <- Seq(0, 1, 11, 12, 63, 64, 100, 999)) {
      val p = ScaleUp.permuted(i)
      assert(p.length == 26)
      assert(p.toSet == ('a' to 'z').toSet, s"copy $i not a bijection")
    }
  }

  test("copy 0 is the identity on both transforms") {
    assert(ScaleUp.permuted(0) == "abcdefghijklmnopqrstuvwxyz")
    assert(ScaleUp.dimPerm(0).toSeq == (0 until 64))
  }

  test("no two copies share a letter transform up to the factor cap") {
    val perms = (0 until 1000).map(ScaleUp.permuted)
    assert(perms.distinct.size == 1000)
    // the periodic-family failure mode, named: copies 12 apart differed
    // in the rotation cut only by i % 12, so 12 and 0 collided
    assert(perms(12) != perms(0) && perms(64) != perms(0))
  }

  test("no two copies share a dimension permutation up to the factor cap") {
    val perms = (0 until 1000).map(ScaleUp.dimPerm(_).toSeq)
    assert(perms.distinct.size == 1000)
    assert(perms.forall(p => p.sorted == (0 until 64)))
  }

  test("fisherYates is deterministic across calls") {
    assert(ScaleUp.fisherYates(64, 7).toSeq == ScaleUp.fisherYates(64, 7).toSeq)
    assert(ScaleUp.fisherYates(26, 3).toSeq != ScaleUp.fisherYates(26, 4).toSeq)
  }
}
