package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic salting for skewed keys.
  *
  * AQE's runtime skew-join splitting (on by default) is the first line of
  * defense for sort-merge joins; explicit salting remains the tool when
  *  (a) a single hot key overwhelms one reducer in an aggregation, or
  *  (b) a broadcast is impossible and the skewed side must be spread
  *      before the shuffle.
  * Salts are derived with xxhash64 over stable row content, never from
  * Math.random — plans stay deterministic and replayable (same input ⇒
  * same partitioning ⇒ same spill profile).
  */
object Skew {

  /** A salt in [0, buckets) from stable row content. Pass the columns that
    * distinguish rows within a hot key (e.g. the event id).
    */
  def salt(buckets: Int, distinguishers: Column*): Column =
    pmod(xxhash64(distinguishers: _*), lit(buckets.toLong))

  /** Two-phase salted count: groupBy (keys, salt) partial-counts spread a
    * hot key over `buckets` reducers, then the tiny (keys, salt) partials
    * collapse to the final per-key counts. Result == plain groupBy count.
    */
  def saltedCount(df: DataFrame, keyCols: Seq[String], buckets: Int,
                  distinguishers: Seq[String]): DataFrame = {
    val salted = df.withColumn("__salt",
      salt(buckets, distinguishers.map(col): _*))
    salted.groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__partial")).as("n"))
  }

  /** Skew-spread equi-join: the skewed (large) side gets a content salt,
    * the small side is replicated `buckets` times, and the join runs on
    * (key, salt) — a hot key's rows land on `buckets` reducers instead of
    * one. Result == plain inner equi-join on `key`. Use when the small
    * side is too big to broadcast but cheap to replicate.
    */
  def saltedJoin(skewed: DataFrame, small: DataFrame, key: String,
                 buckets: Int, distinguishers: Seq[String]): DataFrame = {
    val l = skewed.withColumn("__salt",
      salt(buckets, distinguishers.map(col): _*))
    val r = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets - 1L))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** Join-key skew report: the top-`k` hottest keys with their row share,
    * plus table totals — the diagnostic run BEFORE picking a salting /
    * AQE-skew strategy for a 100 TB join (a top-key share of 5% means one
    * reducer gets 5% of the shuffle).
    *
    * Scale shape: one hash shuffle with map-side combine for the key
    * frequencies (cardinality = distinct keys), a broadcast single-row
    * total, and `orderBy().limit(k)` planned as TakeOrderedAndProject
    * (per-partition heaps). The rank window runs UNPARTITIONED but above
    * `limit(k)` — ≤ k rows at any table size, the same documented bounded
    * exception as `vocabulary` (PlanGuardSpec allowlist).
    */
  def keyProfile(df: DataFrame, keyCol: String, k: Int = 10): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val freq = df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("cnt"))
    val tot = freq.agg(sum(col("cnt")).as("n_rows"),
      count(lit(1)).as("n_keys"))
    val top = freq.orderBy(col("cnt").desc, col("key").asc).limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("key").asc)
    top.withColumn("rank", row_number().over(w).cast("long"))
      .crossJoin(broadcast(tot))
      .select(col("rank"), col("key"), col("cnt"),
        graft.functions.Fns.q6(col("cnt").cast("double") / col("n_rows")).as("share"),
        col("n_rows"), col("n_keys"))
  }
}
