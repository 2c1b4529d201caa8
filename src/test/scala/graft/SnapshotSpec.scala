package graft

import org.apache.spark.sql.functions._
import graft.operators.{DataQuality, Snapshot}

class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def oldSnap = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, null.asInstanceOf[String], 40.0)
  ).toDF("id", "name", "amount")

  test("diff classifies insert / delete / update and lists changed columns") {
    val newSnap = Seq(
      (1L, "a", 10.0),              // unchanged -> dropped
      (2L, "B", 25.0),              // update: name + amount
      (4L, "d", 40.0),              // update: NULL -> value counts as change
      (5L, "e", 50.0)               // insert
    ).toDF("id", "name", "amount")  // id 3 deleted
    val d = Snapshot.diff(oldSnap, newSnap, Seq("id"))
      .select($"id", $"change_type", array_join($"changed_cols", ",").as("ch"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(d === Seq(
      (2L, "update", "amount,name"),
      (3L, "delete", null),
      (4L, "update", "name"),
      (5L, "insert", null)))
  }

  test("diff of identical snapshots is empty") {
    assert(Snapshot.diff(oldSnap, oldSnap, Seq("id")).count() === 0)
  }

  test("compact shrinks the file count and preserves content exactly") {
    val base = java.nio.file.Files.createTempDirectory("graft-compact-spec").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.repartition(16).write.mode("overwrite").parquet(s"$base/in")
    assert(Snapshot.fileCount(spark, s"$base/in") === 16)
    val compacted = Snapshot.compact(spark, s"$base/in", s"$base/out")
    assert(Snapshot.fileCount(spark, s"$base/out") === 1,
      "16 tiny files of a 0.001-sf table fit one 128MB target file")
    def sum(df: org.apache.spark.sql.DataFrame) =
      DataQuality.tableChecksum(df, Seq(col("doc_id"),
        call_function("graft_strhash", col("text"))))
        .as[(Long, Long)].head()
    assert(sum(compacted) === sum(docs))
  }

  test("op_dpp plans a runtime (dynamic) partition filter on the fact scan") {
    val df = SparkEntry.queries("op_dpp")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a DynamicPruningExpression partition filter; plan:\n${plan.take(4000)}")
    // and it still returns the right rows (engagement types only)
    val types = df.collect().map(_.getString(0)).toSet
    assert(types.subsetOf(Set("click", "view")) && types.nonEmpty)
  }
}
