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

  private val P31 = 2147483647L // 2^31 - 1

  /** Order-independent table fingerprint: one row of (n_rows, checksum)
    * where checksum = Σ rowMix mod 2³¹−1 and rowMix folds the given LONG
    * components per row ((acc·131 + part mod p) mod p). Because the
    * combine is a plain sum, the result is independent of partitioning
    * and row order — two engines (or two replicas of a 100 TB table) can
    * each compute it with one scan + one tiny agg and compare a single
    * number, the replication-consistency check a warehouse migration
    * needs. NULL components fold as the sentinel p−1 so a value→NULL
    * corruption (almost always) changes the sum — NOTE this is a hash
    * choice, not a reserved code: pmod ranges over [0, p−1], so a real
    * value ≡ −1 (mod p) folds identically to NULL. Cross-engine parity
    * requires the other engine to apply the SAME non-negative pmod and
    * NULL sentinel per component (the registered DuckDB oracles mirror
    * both).
    * The row sum routes through DECIMAL(38,0): exact, overflow-free at
    * any row count (a raw long sum would hit ANSI overflow past ~2⁶³/p
    * rows).
    */
  def tableChecksum(df: DataFrame, parts: Seq[org.apache.spark.sql.Column]): DataFrame = {
    require(parts.nonEmpty, "need at least one component column")
    def pmod(x: org.apache.spark.sql.Column, m: Long) = ((x % m) + m) % m
    val rowMix = parts.foldLeft(lit(0L)) { (acc, c) =>
      pmod(acc * 131 + coalesce(pmod(c.cast("long"), P31), lit(P31 - 1)), P31)
    }
    df.select(rowMix.cast("decimal(38,0)").as("__mix"))
      .agg(count(lit(1)).as("n_rows"),
        (sum(col("__mix")) % P31).cast("long").as("checksum"))
  }
}
