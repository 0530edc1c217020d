package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.classic.ClassicConversions
import graft.plans.{TopKPerKey, TopKPerKeyStrategy, TopKRewriteRule}

/** Column-API surface for the engine's custom operators. Lives inside the
  * `org.apache.spark.sql` namespace because constructing a Dataset from a
  * custom LogicalPlan (`Dataset.ofRows`) and converting public `Column`s
  * to Catalyst expressions are `private[sql]` — the standard shim pattern
  * for Spark extension libraries.
  */
object GraftPlans {

  /** Ensure the planner knows the custom strategy (idempotent; the
    * sanctioned runtime hook for session-scoped strategies).
    */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies = cur :+ TopKPerKeyStrategy
  }

  /** Additionally enable the automatic `row_number() <= k` → TopKPerKey
    * rewrite (opt-in; see graft.plans.TopKRewriteRule).
    */
  def installOptimizations(spark: SparkSession): Unit = {
    install(spark)
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(TopKRewriteRule))
      spark.experimental.extraOptimizations = cur :+ TopKRewriteRule
  }

  /** Block until the SparkContext's async listener bus has delivered
    * every queued event (bounded by `timeoutMillis`). Measurement code
    * that reads SparkListener-accumulated metrics (e.g. ScaleSmoke's
    * shuffle-byte counters) needs this barrier — a fixed sleep
    * undercounts whenever stage-completed events arrive late under
    * load. `SparkContext.listenerBus` is `private[spark]`, hence this
    * lives in the shim package; it is the same barrier Spark's own
    * listener tests use.
    */
  def drainListenerBus(spark: SparkSession, timeoutMillis: Long = 30000L): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMillis)

  /** First k rows per key group under `order` (pass a total order for
    * deterministic results). Plans to the two-phase heap operator —
    * see graft.plans.TopKPerKey.
    *
    * Key/order Columns are resolved by borrowing the analyzer's own work:
    * the analyzed `sortWithinPartitions` / `repartition` plans yield
    * fully-resolved SortOrder / key expressions against the same child.
    */
  def topKPerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    require(keys.nonEmpty,
      "topKPerKey requires at least one key; for global top-k use orderBy(...).limit(k) " +
        "(TakeOrderedAndProject), which is already optimal")
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    install(spark)
    val sortPlan = ClassicConversions.castToImpl(df.sortWithinPartitions(order: _*))
      .queryExecution.analyzed.asInstanceOf[logical.Sort]
    val keyPlan = ClassicConversions.castToImpl(df.repartition(keys: _*))
      .queryExecution.analyzed.asInstanceOf[logical.RepartitionByExpression]
    val plan = TopKPerKey(keyPlan.partitionExpressions, sortPlan.order, k, sortPlan.child)
    org.apache.spark.sql.classic.Dataset.ofRows(
      ClassicConversions.castToImpl(spark), plan)
  }
}
