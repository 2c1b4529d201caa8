package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark lacks natively: for
  * each left row, attach the single latest right row whose time is ≤ the
  * left row's time, within the same key. Left-join semantics (no prior
  * right row ⇒ NULL value columns).
  *
  * Scalable formulation: tag and union both sides, then one keyed window
  * with `last(ignoreNulls)` over the time-ordered prefix — a single
  * shuffle on the key, no range cross-product, no per-row binary search.
  * Right rows sort before left rows at equal timestamps, giving the
  * standard `left.t >= right.t` (inclusive) semantics, same as DuckDB's
  * native ASOF JOIN which serves as the correctness oracle.
  *
  * `valueCols` must not collide with left column names; if several right
  * rows share (key, time), which one wins is tie-broken by nothing — feed
  * a deduplicated right side (e.g. `Transforms.dedupLatest`) when that
  * can occur.
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String,
           valueCols: Seq[String]): DataFrame =
    joined(left, right, key, leftTime, rightTime, valueCols, forward = false)

  /** Forward variant: attach the single EARLIEST right row whose time is
    * ≥ the left row's time ("what happened next") — same one-shuffle
    * union-window formulation, traversed in descending time so the
    * prefix `last(ignoreNulls)` sees the nearest following right row.
    * Matches DuckDB `ASOF JOIN … ON l.t <= r.t`.
    */
  def asOfForward(left: DataFrame, right: DataFrame, key: String,
                  leftTime: String, rightTime: String,
                  valueCols: Seq[String]): DataFrame =
    joined(left, right, key, leftTime, rightTime, valueCols, forward = true)

  private def joined(left: DataFrame, right: DataFrame, key: String,
                     leftTime: String, rightTime: String,
                     valueCols: Seq[String], forward: Boolean): DataFrame = {
    require(valueCols.forall(c => !left.columns.contains(c)),
      s"valueCols ${valueCols.mkString(",")} must not collide with left columns")
    require(!(left.columns ++ valueCols).exists(Set("__t", "__is_left")),
      "columns __t and __is_left are reserved by asOf")
    val l2 = left
      .withColumn("__t", col(leftTime))
      .withColumn("__is_left", lit(1))
    val r2 = right
      .select((col(key) +: col(rightTime).as("__t") +: valueCols.map(col)): _*)
      .withColumn("__is_left", lit(0))
    val u = l2.unionByName(r2, allowMissingColumns = true)
    // Right rows sort before left rows at equal timestamps in BOTH
    // directions, preserving inclusive (>= / <=) semantics.
    val timeOrd = if (forward) col("__t").desc else col("__t").asc
    val w = Window.partitionBy(col(key))
      .orderBy(timeOrd, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valueCols.foldLeft(u) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("__is_left") === 1).drop("__t", "__is_left")
  }
}
