package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zorderKey2 interleaves bits: x at even positions, y at odd") {
    // x = 3 (011), y = 5 (101): z bits are y2 x2 y1 x1 y0 x0 = 100111 = 39
    val out = Seq((3L, 5L)).toDF("x", "y")
      .select(Layout.zorderKey2($"x", $"y", 3).as("z")).head.getLong(0)
    assert(out == 39L)
    // identity lattice checks
    def z(x: Long, y: Long): Long = Seq((x, y)).toDF("x", "y")
      .select(Layout.zorderKey2($"x", $"y", 16).as("z")).head.getLong(0)
    assert(z(0, 0) == 0L)
    assert(z(1, 0) == 1L)
    assert(z(0, 1) == 2L)
    assert(z(65535, 65535) == (1L << 32) - 1)
  }

  test("zorderKey2Sql mirrors the Column builder bit-for-bit") {
    val rng = new scala.util.Random(11)
    val pts = Seq.fill(200)((rng.nextInt(65536).toLong, rng.nextInt(65536).toLong))
    val df = pts.toDF("x", "y")
    val viaColumn = df.select($"x", $"y", Layout.zorderKey2($"x", $"y", 16).as("z"))
    val viaSql = df.selectExpr("x", "y", Layout.zorderKey2Sql("x", "y", 16) + " AS z")
    assert(viaColumn.exceptAll(viaSql).isEmpty && viaSql.exceptAll(viaColumn).isEmpty)
  }

  test("zorderLayout preserves rows and clusters both dimensions") {
    val rng = new scala.util.Random(5)
    val pts = Seq.fill(4096)((rng.nextInt(256).toLong, rng.nextInt(256).toLong))
    val df = pts.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
      .toDF("id", "x", "y")
    val laid = Layout.zorderLayout(df, "x", "y", bits = 8, numPartitions = 8)
    assert(laid.count() == 4096)
    assert(laid.columns.toSeq == Seq("id", "x", "y")) // key column dropped
    // Per-partition spread on EACH dimension must beat a 1-d sort's worst
    // axis: under Z-order both x and y ranges shrink per partition.
    val spreads = laid
      .withColumn("p", spark_partition_id())
      .groupBy("p")
      .agg((max($"x") - min($"x")).as("dx"), (max($"y") - min($"y")).as("dy"))
      .collect()
    val avgDx = spreads.map(_.getAs[Long]("dx")).sum.toDouble / spreads.length
    val avgDy = spreads.map(_.getAs[Long]("dy")).sum.toDouble / spreads.length
    // random placement would leave ~255 spread on both axes
    assert(avgDx < 200 && avgDy < 200,
      s"expected clustered partitions, got avg dx=$avgDx dy=$avgDy")
  }
}
