package graft.etl

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.model.Schemas

/** Catalog surface — reference ops 3, 4 and 5 (SURVEY.md §2):
  * `CREATE TABLE IF NOT EXISTS` ×7 with declared schemas
  * (sql_queries.py:19–97, create_tables.py:29–44), idempotent
  * `DROP TABLE IF EXISTS` ×7 (sql_queries.py:9–15, create_tables.py:12–26),
  * and append-mode INSERT…SELECT materialization (sql_queries.py:118–173).
  *
  * Spark-first: tables live in the session catalog (warehouse parquet);
  * constraints (PK/FK/NOT NULL) are schema metadata + test assertions,
  * exactly as Redshift treats PK/FK (informational, unenforced).
  */
object Catalog {

  /** The reference's seven tables, in its create order. */
  val tables: Seq[(String, StructType)] = Seq(
    "staging_events" -> Schemas.stagingEvents,
    "staging_songs" -> Schemas.songJson,
    "time" -> Schemas.time,
    "users" -> Schemas.users,
    "songs" -> Schemas.songs,
    "artists" -> Schemas.artists,
    "songplays" -> Schemas.songplays)

  /** DROP TABLE IF EXISTS ×7 — safe to run on a fresh catalog. */
  def dropTables(spark: SparkSession): Unit =
    tables.foreach { case (name, _) => spark.sql(s"DROP TABLE IF EXISTS $name") }

  /** CREATE TABLE IF NOT EXISTS ×7 with the declared schemas. */
  def createTables(spark: SparkSession): Unit =
    tables.foreach { case (name, schema) =>
      if (!spark.catalog.tableExists(name))
        spark.createDataFrame(java.util.Collections.emptyList[Row](), schema)
          .write.saveAsTable(name)
    }

  /** INSERT…SELECT append into a cataloged table (op 5). */
  def insertInto(df: DataFrame, name: String): Unit =
    df.write.mode(SaveMode.Append).insertInto(name)

  /** Bucketed materialization: co-locates future joins/aggregations on
    * `bucketCols` — two tables bucketed the same way join with ZERO
    * shuffle exchanges (verified by plan assertion in PipelineSpec).
    * This is the warehouse-side answer to repeated large-fact joins that
    * the reference's EVEN distribution forces to re-shuffle every query.
    */
  def materializeBucketed(df: DataFrame, name: String,
                          bucketCols: Seq[String], numBuckets: Int,
                          mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(name)

  /** Row counts for the five warehouse tables (etl sanity report). */
  def counts(spark: SparkSession): Map[String, Long] =
    Seq("time", "users", "songs", "artists", "songplays")
      .filter(spark.catalog.tableExists)
      .map(n => n -> spark.table(n).count()).toMap
}
