package graft.functions

import org.apache.spark.sql.{GraftExtensionsTestBridge, SparkSessionExtensions}
import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Validates the `spark.sql.extensions=graft.functions.GraftExtensions`
  * deployment path: the injections registered by the extension class are
  * applied to a FunctionRegistry exactly as a fresh session build would
  * (production passes the config at launch; a shared-context test JVM
  * can't rebuild its context, so the spec applies the same public
  * `registerFunctions` step the session builder runs).
  */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injections resolve from SQL text") {
    val spark = SparkTestSession.spark
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    GraftExtensionsTestBridge.registerFunctions(
      ext, castToImpl(spark).sessionState.functionRegistry)

    val h = spark.sql("SELECT rolling_hash('abc') AS h").head().getLong(0)
    assert(h == RollingHash.hashBytes("abc".getBytes("UTF-8")))
    val j = spark.sql(
      "SELECT sorted_set_jaccard(array(1L,2L,3L), array(2L,3L,4L)) AS j")
      .head().getDouble(0)
    assert(j == 0.5)
    val sig = spark.sql("SELECT minhash_sig(array('a','b')) AS s")
      .head().getSeq[Long](0)
    assert(sig.length == MinHashSig.K)
    val sh = spark.sql("SELECT simhash64(array('a','b','a')) AS s").head().getLong(0)
    assert(sh != 0L)
  }
}
