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

  test("zorderKeyN at N=2 equals zorderKey2; N=3 places bits at 3i+j") {
    val rng = new scala.util.Random(23)
    val pts = Seq.fill(200)((rng.nextInt(65536).toLong, rng.nextInt(65536).toLong))
    val df = pts.toDF("x", "y")
    val via2 = df.select(Layout.zorderKey2($"x", $"y", 16).as("z"))
    val viaN = df.select(Layout.zorderKeyN(Seq($"x", $"y"), 16).as("z"))
    assert(via2.exceptAll(viaN).isEmpty && viaN.exceptAll(via2).isEmpty)
    // x=1 → bit at 3·0+0, y=1 → bit at 3·0+1, w=1 → bit at 3·0+2;
    // second bit of each lands 3 positions higher
    def z3(x: Long, y: Long, w: Long): Long = Seq((x, y, w)).toDF("x", "y", "w")
      .select(Layout.zorderKeyN(Seq($"x", $"y", $"w"), 4).as("z")).head.getLong(0)
    assert(z3(1, 0, 0) == 1L && z3(0, 1, 0) == 2L && z3(0, 0, 1) == 4L)
    assert(z3(2, 0, 0) == 8L && z3(3, 3, 3) == 63L)
  }

  test("zorderKeyNSql mirrors zorderKeyN bit-for-bit at N=3") {
    val rng = new scala.util.Random(31)
    val pts = Seq.fill(200)((rng.nextInt(1 << 20).toLong,
      rng.nextInt(1 << 20).toLong, rng.nextInt(1 << 20).toLong))
    val df = pts.toDF("x", "y", "w")
    val viaColumn = df.select(Layout.zorderKeyN(Seq($"x", $"y", $"w"), 20).as("z"))
    val viaSql = df.selectExpr(
      Layout.zorderKeyNSql(Seq("x", "y", "w"), 20) + " AS z")
    assert(viaColumn.exceptAll(viaSql).isEmpty && viaSql.exceptAll(viaColumn).isEmpty)
  }

  test("zorderKeyN rejects <2 columns and keys wider than 62 bits") {
    intercept[IllegalArgumentException] {
      Layout.zorderKeyN(Seq($"x"), 16)
    }
    intercept[IllegalArgumentException] {
      Layout.zorderKeyN(Seq($"x", $"y", $"w"), 21) // 63 > 62
    }
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

  test("partitionPlan: hand counts, ceil files, skew vs even split") {
    val df = ((1 to 2500).map(i => ("a", i)) ++ (1 to 500).map(i => ("b", i)))
      .toDF("p", "x")
    val out = Layout.partitionPlan(df, Seq(col("p")), targetRows = 1000L)
      .orderBy("p").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out(0) == ("a", 2500L, 3L, 0.833333, 1.666667))
    assert(out(1) == ("b", 500L, 1L, 0.166667, 0.333333))
    // exact multiple of the target needs no extra file
    val even = (1 to 2000).map(i => ("c", i)).toDF("p", "x")
    val e = Layout.partitionPlan(even, Seq(col("p")), 1000L).collect().head
    assert(e.getLong(2) == 2L && e.getDouble(4) == 1.0)
  }

  test("skippingEstimate: clustered layout skips, scrambled layout can't") {
    // 10 rows; probe column p is 1..10 in row order. Clustered on p:
    // file0 = [1,5], file1 = [6,10] -> probe 5 touches 1 of 2 files.
    val df = (1 to 10).map(i => (i.toLong, i.toLong)).toDF("o", "p")
    val c = Layout.skippingEstimate(df, Seq(col("o")), "p",
        Seq(5L, 100L), rowsPerFile = 5L, layoutName = "clustered")
      .orderBy("probe").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(c.toSeq == Seq(("clustered", 5L, 2L, 1L, 0.5),
      ("clustered", 100L, 2L, 0L, 1.0)))
    // alternating p: both files span [1,10] -> probe 5 touches both
    val alt = (1 to 10).map(i =>
      (i.toLong, if (i % 2 == 0) 10L else 1L + (i % 5))).toDF("o", "p")
    val a = Layout.skippingEstimate(alt, Seq(col("o")), "p",
        Seq(5L), rowsPerFile = 5L, layoutName = "scrambled")
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(a.toSeq == Seq((2L, 2L, 0.0)))
  }
}
