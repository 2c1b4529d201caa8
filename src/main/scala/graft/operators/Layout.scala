package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multidimensional clustering for scan pruning.
  *
  * At 100 TB the dominant cost of any selective query is the scan, and the
  * scan is only prunable if the file/row-group min–max ranges are tight on
  * the filtered columns. A sort on one column gives perfect pruning on
  * that column and none on any other; a Z-order (Morton) sort interleaves
  * the bits of several columns so EVERY interleaved column gets
  * locality — the standard layout trick (Delta/Iceberg `ZORDER BY`,
  * re-expressed here as plain Spark: a computed key + one range
  * partitioning).
  *
  * The key is built from plain integer bit-ops (shift/and/or) — fully
  * whole-stage-codegen'd, no UDF, and exactly reproducible in ANSI SQL,
  * so the DuckDB oracle checks the interleave bit-for-bit.
  */
object Layout {

  /** Morton key interleaving the low `bits` bits of two non-negative
    * integer columns: bit i of `x` lands at position 2i, bit i of `y` at
    * 2i+1. 2·bits ≤ 62 keeps the key in a positive long. Values ≥ 2^bits
    * simply truncate (high bits beyond the interleave window don't
    * cluster) — callers pick `bits` to cover their key domain.
    */
  def zorderKey2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"need 1 <= bits <= 31, got $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce((a: Column, b: Column) => a.bitwiseOR(b))
  }

  /** The matching ANSI SQL fragment (DuckDB / any engine with `&`, `|`,
    * `>>`, `<<` on BIGINT) — kept next to the Column builder so the two
    * formulations can never drift apart.
    */
  def zorderKey2Sql(x: String, y: String, bits: Int = 16): String =
    ((0 until bits).map(i => s"(((CAST($x AS BIGINT) >> $i) & 1) << ${2 * i})") ++
      (0 until bits).map(i => s"(((CAST($y AS BIGINT) >> $i) & 1) << ${2 * i + 1})"))
      .mkString("(", " | ", ")")

  /** Morton key over N ≥ 2 non-negative integer columns: bit i of column
    * j lands at position N·i + j (column 0 owns the least-significant
    * lane), the straight generalization of [[zorderKey2]] — with which it
    * agrees exactly at N = 2. N·bits ≤ 62 keeps the key in a positive
    * long; real layout keys are typically 3–4 dimensions (e.g. tenant ×
    * day × shard), so the per-column resolution drops as columns are
    * added (3 cols → ≤ 20 bits each) — that is inherent to Z-ordering,
    * not a limitation of this builder: more interleaved dimensions =
    * coarser per-dimension locality.
    */
  def zorderKeyN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 2, s"need >= 2 columns to interleave, got $n")
    require(bits >= 1 && n * bits <= 62,
      s"need 1 <= bits and ${n}*bits <= 62, got bits=$bits")
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), n * i + j)
    terms.reduce((a: Column, b: Column) => a.bitwiseOR(b))
  }

  /** ANSI SQL mirror of [[zorderKeyN]], same contract as [[zorderKey2Sql]]. */
  def zorderKeyNSql(cols: Seq[String], bits: Int): String = {
    val n = cols.size
    (for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield s"(((CAST($c AS BIGINT) >> $i) & 1) << ${n * i + j})")
      .mkString("(", " | ", ")")
  }

  /** Re-cluster a table on the Z-key of two columns: one range
    * partitioning (sampled boundaries → balanced output files) plus a
    * partition-local sort. This is the write-side layout pass — run it
    * once per ingest batch, and every downstream filter on EITHER column
    * prunes files by min–max. No global single-partition sort anywhere.
    */
  def zorderLayout(df: DataFrame, xCol: String, yCol: String,
                   bits: Int = 16, numPartitions: Int = 0): DataFrame =
    zorderLayoutN(df, Seq(xCol, yCol), bits, numPartitions)

  /** [[zorderLayout]] for N ≥ 2 columns (keyed by [[zorderKeyN]]). */
  def zorderLayoutN(df: DataFrame, cols: Seq[String], bits: Int,
                    numPartitions: Int = 0): DataFrame = {
    val keyed = df.withColumn("__zkey", zorderKeyN(cols.map(col), bits))
    val ranged =
      if (numPartitions > 0) keyed.repartitionByRange(numPartitions, col("__zkey"))
      else keyed.repartitionByRange(col("__zkey"))
    ranged.sortWithinPartitions(col("__zkey")).drop("__zkey")
  }

  /** Zone-map skipping estimator: replay a candidate layout (a total
    * `orderCols` order cut into `rowsPerFile`-row files), build each
    * file's min–max zone map on `probeCol`, and report — per point
    * probe — how many files a `probeCol = p` scan must touch. The
    * number that justifies (or kills) a re-sort BEFORE paying for it:
    * a layout clustered on the probe column skips all but ~1 file, the
    * insertion order skips nothing.
    *
    * Scale shape: this is a PLANNING estimator — run it on the
    * representative sample you'd plan a `ZORDER BY` from, not the full
    * table (the file-id assignment is one global row_number; at full
    * scale the same zone maps come free from parquet footer stats).
    * Downstream of the window everything is file-granular: one
    * min/max aggregate (files = rows/rowsPerFile), a broadcast probe
    * join, one count per probe.
    */
  def skippingEstimate(df: DataFrame, orderCols: Seq[Column],
                       probeCol: String, probes: Seq[Long],
                       rowsPerFile: Long = 1000L,
                       layoutName: String = "layout"): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    require(probes.nonEmpty, "need at least one probe value")
    require(rowsPerFile >= 1, s"need rowsPerFile >= 1, got $rowsPerFile")
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(orderCols: _*)
    val fstats = df
      .withColumn("__rn", row_number().over(w).cast("long"))
      // Column./ is double division — floor it back to the file ordinal
      // (exact below 2^52 rows, far past any planning sample)
      .withColumn("__f", floor((col("__rn") - 1L) / rowsPerFile).cast("long"))
      .groupBy("__f")
      .agg(min(col(probeCol)).as("mn"), max(col(probeCol)).as("mx"))
    val nf = fstats.agg(count(lit(1)).as("n_files"))
    val probeDf = df.sparkSession.range(1)
      .select(explode(array(probes.map(lit(_)): _*)).as("probe"))
    val hits = fstats
      .join(broadcast(probeDf),
        col("probe") >= col("mn") && col("probe") <= col("mx"))
      .groupBy("probe").agg(count(lit(1)).as("h"))
    probeDf.join(hits, Seq("probe"), "left")
      .crossJoin(broadcast(nf))
      .select(lit(layoutName).as("layout"), col("probe"), col("n_files"),
        coalesce(col("h"), lit(0L)).as("files_hit"),
        graft.functions.Fns.q6((lit(1.0) - coalesce(col("h"), lit(0L)).cast("double") /
          col("n_files").cast("double")))
          .cast("double").as("skip_ratio"))
  }

  /** Partition-layout plan for a write: given the partition columns,
    * report each partition's row count, share of the table, and the
    * file count at `targetRows` rows/file — the pre-write skew audit
    * that catches both failure modes of `PARTITIONED BY` at 100 TB
    * (a giant partition serializing one writer, and a long tail of
    * kilobyte files strangling the namenode). One count aggregate plus
    * a broadcast total; `ceil` on exact BIGINTs.
    */
  def partitionPlan(df: DataFrame,
                    partCols: Seq[org.apache.spark.sql.Column],
                    targetRows: Long = 1000000L): DataFrame = {
    require(partCols.nonEmpty, "need at least one partition column")
    require(targetRows >= 1, s"need targetRows >= 1, got $targetRows")
    val counts = df.groupBy(partCols: _*).agg(count(lit(1)).as("n_rows"))
    val tot = counts.agg(sum(col("n_rows")).as("total"),
      count(lit(1)).as("n_partitions"))
    counts.crossJoin(broadcast(tot))
      // floor over the exact double quotient (counts << 2^53, no
      // truncation hazard); Column./ is double division, not integer
      .withColumn("n_files",
        floor((col("n_rows") + (targetRows - 1L)) / targetRows).cast("long"))
      .withColumn("frac_of_total",
        graft.functions.Fns.q6(col("n_rows").cast("double") / col("total").cast("double")))
      .withColumn("skew_vs_even",
        graft.functions.Fns.q6(col("n_rows").cast("double") * col("n_partitions").cast("double")
          / col("total").cast("double")))
      .drop("total", "n_partitions")
  }
}
