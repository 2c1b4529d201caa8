package graft

import graft.operators.DataQuality

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  test("audit counts nulls, duplicate keys, and orphaned references exactly") {
    val child = Seq(
      (1L, Option(10L)), (2L, Option(10L)), (2L, Option(20L)), // dup id 2
      (3L, None),                                              // null fk
      (4L, Option(99L)))                                       // orphan fk
      .toDF("id", "fk")
    val parent = Seq((10L, "a"), (20L, "b")).toDF("pk", "name")
    val out = DataQuality.audit(
      notNull = Seq(("nn_fk", child, "fk")),
      unique = Seq(("uq_id", child, Seq("id"))),
      refs = Seq(("fk_parent", child, "fk", parent, "pk")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map(
      "nn_fk" -> 1L,     // one null fk
      "uq_id" -> 1L,     // id 2 appears twice -> 1 row in excess
      "fk_parent" -> 1L)) // fk 99 has no parent (NULL fk doesn't count)
  }

  test("audit rejects zero checks and duplicate check names eagerly") {
    val t = Seq((1L, Option(10L))).toDF("id", "fk")
    val e1 = intercept[IllegalArgumentException] {
      DataQuality.audit(Seq.empty, Seq.empty, Seq.empty)
    }
    assert(e1.getMessage.contains("at least one check"))
    // duplicate names across kinds fail with the names, not a later
    // ambiguous-column AnalysisException
    val e2 = intercept[IllegalArgumentException] {
      DataQuality.audit(
        notNull = Seq(("chk", t, "fk"), ("chk", t, "id")),
        unique = Seq.empty, refs = Seq.empty)
    }
    assert(e2.getMessage.contains("chk"))
  }
}
