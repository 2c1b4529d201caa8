package graft

import org.apache.spark.sql.functions._
import graft.operators.BloomJoin

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bloomSemiJoin ≡ plain left-semi join (false positives removed)") {
    val fact = (0L until 5000L).map(i => (i, i % 997L)).toDF("row_id", "fk")
    val dim = (0L until 997L by 13L).map(k => (k, s"d$k")).toDF("dk", "name")
    val out = BloomJoin.bloomSemiJoin(fact, dim, "fk", "dk", estimatedItems = 1000L)
      .select("row_id").collect().map(_.getLong(0)).sorted.toSeq
    val expected = fact.join(dim, $"fk" === $"dk", "left_semi")
      .select("row_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(out == expected)
    assert(out.nonEmpty)
    // fact schema passes through unchanged
    val cols = BloomJoin.bloomSemiJoin(fact, dim, "fk", "dk").columns.toSeq
    assert(cols == Seq("row_id", "fk"))
  }

  test("plan shape: might_contain filters the fact scan via a scalar subquery") {
    val fact = (0L until 100L).map(i => (i, i)).toDF("row_id", "fk")
    val dim = Seq((5L, "a")).toDF("dk", "name")
    val plan = BloomJoin.bloomSemiJoin(fact, dim, "fk", "dk")
      .queryExecution.executedPlan.toString
    // the bloom probe must sit in a Filter (pre-join), fed by a subquery
    assert(plan.contains("might_contain"))
    assert(plan.contains("Subquery") || plan.contains("subquery"))
    assert(plan.contains("LeftSemi")) // exact residual join present
  }

  test("bloom pre-filter admits every true match (no false negatives)") {
    // Tiny bloom (forced high fp rate) must still keep all real matches —
    // the exact residual join only ever REMOVES rows.
    val fact = (0L until 2000L).map(i => (i, i)).toDF("row_id", "fk")
    val dim = Seq((5L, "a"), (1999L, "b"), (0L, "c")).toDF("dk", "name")
    val out = BloomJoin.bloomSemiJoin(fact, dim, "fk", "dk", estimatedItems = 4L)
      .select("row_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(0L, 5L, 1999L))
  }

  test("reserved residual column __dk in the fact table fails fast") {
    val fact = Seq((1L, 1L)).toDF("__dk", "fk")
    val dim = Seq((1L, "a")).toDF("dk", "name")
    val e = intercept[IllegalArgumentException] {
      BloomJoin.bloomSemiJoin(fact, dim, "fk", "dk")
    }
    assert(e.getMessage.contains("__dk"))
  }
}
