package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter-pruned semi-join — the 100 TB shuffle-reduction pattern.
  *
  * A plain `fact SEMI JOIN dim` shuffles the ENTIRE fact table on the join
  * key before a single probe happens. When the dim side is selective, the
  * right plan builds a compact bloom filter over the dim keys first, scans
  * the fact side once discarding every row the filter rejects (false
  * positives only — no false negatives), and only shuffles the survivors
  * into the exact join. Spark's own runtime join filtering
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) applies this
  * rewrite when statistics justify it; this operator is the explicit,
  * always-on form for pipelines that know their selectivity (e.g. "keep
  * only documents whose url-host appears in the allowlist" over a
  * petabyte crawl).
  *
  * Mechanics: the filter is Spark's `BloomFilterAggregate` (exposed as
  * `graft_bloom_agg` — merge-able buffers, codegen'd XxHash64 updates)
  * built in an uncorrelated scalar subquery, so it runs as one small
  * distributed agg whose binary result is injected into the fact-side
  * scan predicate — NO driver-side `collect`, and `graft_might_contain`
  * sits directly above the scan where Parquet pushdown leaves off. The
  * exact residual semi-join then removes the bloom's false positives;
  * the result is EXACTLY the plain semi-join, verified by the oracle.
  */
object BloomJoin {

  private val viewSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** `fact LEFT SEMI JOIN dim ON fact(factKey) = dim(dimKey)`, with the
    * fact side pre-pruned by a bloom filter of `estimatedItems` capacity
    * built over the dim keys. Both key columns must be integral (they are
    * hashed as longs).
    */
  def bloomSemiJoin(fact: DataFrame, dim: DataFrame,
                    factKey: String, dimKey: String,
                    estimatedItems: Long = 1000000L): DataFrame = {
    val spark = fact.sparkSession
    // __dk is this operator's reserved residual-join alias (same contract
    // as AsOfJoin's __t/__is_left): a fact table already carrying it would
    // make the join condition ambiguous — fail fast instead.
    require(!fact.columns.contains("__dk"),
      "fact must not contain the reserved column __dk")
    graft.expressions.GraftFunctions.register(spark)
    // BloomFilterMightContain requires its filter input to be a constant
    // or an uncorrelated scalar subquery (it is evaluated once, not per
    // row) — hence the SQL formulation over temp views rather than a
    // crossJoin of the aggregate row. View names are per-call unique
    // (concurrent callers must not clobber each other), and dropped
    // right after: spark.sql analyzes eagerly, so the returned plan no
    // longer needs them.
    val tag = viewSeq.incrementAndGet()
    val factView = s"graft_bloom_fact_$tag"
    val dimView = s"graft_bloom_dim_$tag"
    fact.createOrReplaceTempView(factView)
    dim.createOrReplaceTempView(dimView)
    try {
      val pruned = spark.sql(
        s"""SELECT f.* FROM $factView f
           |WHERE graft_might_contain(
           |  (SELECT graft_bloom_agg(CAST(`$dimKey` AS BIGINT), ${estimatedItems}L)
           |   FROM $dimView),
           |  CAST(f.`$factKey` AS BIGINT))""".stripMargin)
      // Exact residual: only bloom SURVIVORS shuffle into this join — at
      // scale that is the entire saving. No broadcast hint: when dim
      // fits, AQE broadcasts it on its own; when it doesn't, this is the
      // shuffle the bloom just shrank. No distinct on the build side —
      // left_semi already ignores duplicate keys.
      pruned.join(dim.select(col(dimKey).as("__dk")),
        pruned(factKey) === col("__dk"), "left_semi")
    } finally {
      spark.catalog.dropTempView(factView)
      spark.catalog.dropTempView(dimView)
    }
  }
}
