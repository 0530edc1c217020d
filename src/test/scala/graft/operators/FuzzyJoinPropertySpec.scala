package graft.operators

import org.apache.spark.sql.functions.expr
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Deletion-neighborhood blocking must equal the brute-force all-pairs
  * join on ARBITRARY inputs — property-tested over a tiny alphabet
  * (maximizing collisions, repeats, empty-ish strings, and distance-2
  * traps like transpositions) rather than example-tested, because the
  * completeness argument has exactly these corners.
  */
class FuzzyJoinPropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private val word: Gen[String] =
    Gen.choose(1, 6).flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c')))

  test("blocked join equals brute force on random small-alphabet corpora") {
    val sp = spark
    import sp.implicits._
    val corpora = Gen.choose(10, 40).flatMap(n => Gen.listOfN(n, word))
    val p = Prop.forAll(corpora) { words =>
      val names = words.zipWithIndex
        .map { case (w, i) => (i.toLong, w) }.toDF("id", "name")
      val blocked = FuzzyJoin.selfPairs(names, "id", "name")
        .select("id_a", "id_b", "dist")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val brute = names.as("a").crossJoin(names.as("b"))
        .filter(expr("a.id < b.id AND levenshtein(a.name, b.name) <= 1"))
        .selectExpr("a.id", "b.id", "levenshtein(a.name, b.name)")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      blocked == brute
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), p)
    assert(res.passed, res.status.toString)
  }
}
