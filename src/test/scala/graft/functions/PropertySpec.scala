package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants for the native expressions (pure-JVM, no
  * Spark jobs — the expression evals are static methods shared with
  * codegen).
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  private def arr(xs: Seq[Long]) = new GenericArrayData(xs.toArray)
  private def strArr(xs: Seq[String]) =
    new GenericArrayData(xs.map(UTF8String.fromString).toArray)

  test("sorted_set_jaccard equals the set definition for arbitrary long sets") {
    check(Prop.forAll(
      Gen.listOf(Gen.chooseNum(-100L, 100L)),
      Gen.listOf(Gen.chooseNum(-100L, 100L))) { (a, b) =>
      val sa = a.distinct.sorted
      val sb = b.distinct.sorted
      val expected =
        if (sa.isEmpty && sb.isEmpty) 0.0
        else (sa.toSet & sb.toSet).size.toDouble / (sa.toSet | sb.toSet).size.toDouble
      SortedSetJaccard.jaccard(arr(sa), arr(sb)) == expected
    })
  }

  test("jaccard bounds and identity") {
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(-1000L, 1000L))) { a =>
      val s = a.distinct.sorted
      val j = SortedSetJaccard.jaccard(arr(s), arr(s.map(_ + 5000L)))
      SortedSetJaccard.jaccard(arr(s), arr(s)) == 1.0 && j >= 0.0 && j <= 1.0
    })
  }

  test("rolling hash: deterministic, sensitive to single-char changes") {
    check(Prop.forAll(Gen.alphaNumStr.suchThat(_.nonEmpty)) { s =>
      val h1 = RollingHash.hashBytes(s.getBytes("UTF-8"))
      val h2 = RollingHash.hashBytes(s.getBytes("UTF-8"))
      val mutated = (s.head match { case 'x' => 'y'; case _ => 'x' }) + s.tail
      h1 == h2 && RollingHash.hashBytes(mutated.getBytes("UTF-8")) != h1
    })
  }

  test("minhash signature agreement is within statistical range of jaccard") {
    val gen = Gen.chooseNum(50, 200)
    check(Prop.forAll(gen, gen) { (na, overlap0) =>
      val overlap = math.min(na, overlap0)
      val a = (0 until na).map(i => s"tok$i")
      val b = (na - overlap until na - overlap + na).map(i => s"tok$i")
      val trueJ = overlap.toDouble / (2 * na - overlap)
      val sa = MinHashSig.signature(strArr(a))
      val sb = MinHashSig.signature(strArr(b))
      val agree = (0 until MinHashSig.K)
        .count(i => sa.getLong(i) == sb.getLong(i)).toDouble / MinHashSig.K
      math.abs(agree - trueJ) <= 0.35 // k=32 binomial band
    })
  }

  test("ngram_hashes jaccard equals string-shingle jaccard") {
    val tokGen = Gen.listOf(Gen.oneOf("a", "b", "c", "dd", "ee", "f1"))
    check(Prop.forAll(tokGen, tokGen) { (ta, tb) =>
      def shingleSet(ts: List[String]): Set[String] =
        if (ts.length < 3) Set.empty
        else ts.sliding(3).map(_.mkString(" ")).toSet
      val sa = shingleSet(ta)
      val sb = shingleSet(tb)
      val expected =
        if (sa.isEmpty && sb.isEmpty) 0.0
        else (sa & sb).size.toDouble / (sa | sb).size.toDouble
      val ha = NGramHashes.hashes(strArr(ta))
      val hb = NGramHashes.hashes(strArr(tb))
      SortedSetJaccard.jaccard(ha, hb) == expected
    })
  }

  test("simhash: order-insensitive for multiset-equal inputs") {
    check(Prop.forAll(
      Gen.nonEmptyListOf(Gen.oneOf("a", "bb", "ccc", "dddd", "x1", "y2"))) { toks =>
      SimHash.simhash(strArr(toks)) ==
        SimHash.simhash(strArr(scala.util.Random.shuffle(toks)))
    })
  }
}
