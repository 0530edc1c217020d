package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Deletion-neighborhood blocking is exact for threshold 1: the blocked
  * join must return precisely the pairs the quadratic all-pairs scan
  * returns — substitutions, inserts, deletes, equal strings, and NO
  * distance-2 survivors (the rescore kills transposition-style false
  * candidates the blocks admit).
  */
class FuzzyJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("blocked join equals brute force on an adversarial name set") {
    val sp = spark
    import sp.implicits._
    val names = Seq(
      (1L, "smith"), (2L, "smyth"),   // substitution, dist 1
      (3L, "smiths"),                 // insert vs 1, dist 1
      (4L, "mith"),                   // delete vs 1, dist 1
      (5L, "smith"),                  // exact duplicate of 1
      (6L, "ab"), (7L, "ba"),         // transposition: dist 2, blocks collide
      (8L, "aa"), (9L, "a"),          // repeated chars collapse variants
      (10L, "zzzz")                   // no neighbor
    ).toDF("id", "name")
    val blocked = FuzzyJoin.selfPairs(names, "id", "name")
      .select("id_a", "id_b", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    val brute = names.as("a").crossJoin(names.as("b"))
      .filter(org.apache.spark.sql.functions.expr(
        "a.id < b.id AND levenshtein(a.name, b.name) <= 1"))
      .selectExpr("a.id", "b.id", "levenshtein(a.name, b.name)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    assert(blocked == brute)
    assert(brute.contains((1L, 2L, 1)) && brute.contains((1L, 5L, 0)))
    assert(!blocked.exists { case (a, b, _) => Set(a, b) == Set(6L, 7L) },
      "transposition pair is distance 2 and must be rescored away")
  }
}
