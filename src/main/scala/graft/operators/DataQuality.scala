package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality audit (the dbt-test / expectation-suite
  * shape): not-null, uniqueness and referential-integrity checks declared
  * as data, evaluated lazily as one composed DataFrame of
  * `(check, violations)` rows — no driver-side actions, so the whole
  * audit is one job whose pieces Spark schedules together.
  *
  * Cost shape at scale: every not-null check on the same table folds into
  * ONE conditional aggregation pass (no per-check scans); each
  * uniqueness check is a keyed aggregation counting rows in excess of
  * one per key; each referential check is a left-anti join (broadcast
  * when the parent's key side is small, shuffle otherwise — AQE's call).
  */
object DataQuality {

  /** `notNull`: (checkName, table, column). `unique`: (checkName, table,
    * key columns). `refs`: (checkName, child, childKey, parent,
    * parentKey). Tables are passed per check so one audit can span a
    * whole schema.
    */
  def audit(notNull: Seq[(String, DataFrame, String)],
            unique: Seq[(String, DataFrame, Seq[String])],
            refs: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    require(notNull.nonEmpty || unique.nonEmpty || refs.nonEmpty,
      "audit needs at least one check (the union over zero checks is undefined)")
    // Check names become column aliases inside the shared per-table
    // aggregation, so duplicates would surface later as an opaque
    // ambiguous-reference AnalysisException; fail fast with the names.
    val names = notNull.map(_._1) ++ unique.map(_._1) ++ refs.map(_._1)
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    require(dups.isEmpty, s"duplicate check names: ${dups.mkString(", ")}")
    val nn = notNull.groupBy(_._2).toSeq.flatMap { case (df, checks) =>
      // all of a table's null counts in a single aggregation pass
      val aggs = checks.map { case (name, _, c) =>
        // coalesce: sum over an EMPTY table is NULL, not 0 violations
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(name)
      }
      val one = df.agg(aggs.head, aggs.tail: _*)
      checks.map { case (name, _, _) =>
        one.select(lit(name).as("check"), col(name).as("violations"))
      }
    }
    val uq = unique.map { case (name, df, keys) =>
      df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__c"))
        .agg(coalesce(sum(col("__c") - 1L), lit(0L)).as("violations"))
        .select(lit(name).as("check"), col("violations"))
    }
    val rf = refs.map { case (name, child, childKey, parent, parentKey) =>
      // SQL FK semantics: a NULL child key is NOT an orphan (declare a
      // not-null check if nulls are also disallowed). Keys are renamed
      // per side so a same-named FK/PK pair (the common case) doesn't
      // hit an ambiguous-reference error in the join condition.
      child.select(col(childKey).as("__ck")).filter(col("__ck").isNotNull)
        .join(parent.select(col(parentKey).as("__pk")),
          col("__ck") === col("__pk"), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit(name).as("check"), col("violations"))
    }
    (nn ++ uq ++ rf).reduce(_ unionByName _)
  }
}
