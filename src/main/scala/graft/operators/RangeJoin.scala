package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join — an operator Spark's planner lacks a
  * hash strategy for: the declarative form
  * `points.join(intervals, p >= s && p <= e)` plans as a
  * BroadcastNestedLoopJoin, O(|P|·|I|) pair evaluations, which is fatal
  * at corpus scale even when an equi-key narrows it.
  *
  * Scale path (the standard bucketized interval join): quantize the range
  * axis into `binWidth`-sized bins; each interval explodes to every bin
  * it overlaps, each point maps to its single bin, and the join runs as a
  * plain HASH join on (equiKeys…, bin) followed by the exact containment
  * filter. Cost O(|P| + Σ⌈len/binWidth⌉) rows through one keyed shuffle —
  * horizontal at any size. Pick binWidth near the typical interval length
  * so the per-interval fan-out stays O(1); a degenerate interval spanning
  * k bins emits k rows (cap upstream if the distribution is wild).
  *
  * Bin ids use integer `div` (not floor of a double ratio) so axes past
  * 2^53 — epoch nanos — still bin exactly.
  */
object RangeJoin {

  /** Inner join of `points` (with long column `pointCol`) to `intervals`
    * (long `startCol`/`endCol`, inclusive ends) on `equiKeys` plus
    * containment. Non-key column names must be distinct across the two
    * frames (standard Seq-join contract).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame, pointCol: String,
                      startCol: String, endCol: String, equiKeys: Seq[String],
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def bin(c: String) = call_function("div", col(c), lit(binWidth))
    val p = points.withColumn("__bin", bin(pointCol))
    val iv = intervals.withColumn("__bin",
      explode(sequence(bin(startCol), bin(endCol))))
    p.join(iv, equiKeys :+ "__bin")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }
}
