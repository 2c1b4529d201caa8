package graft.model

import org.apache.spark.sql.types._

/** Explicit schemas for the engine — the reference declares every schema as
  * DDL and never relies on inference (reference sql_queries.py:19–97,
  * dwh.cfg:13 JSONPaths; see SURVEY.md §1.1). We mirror that: every reader
  * gets a `StructType`, never `inferSchema`.
  *
  * Type mapping decisions (SURVEY.md §1.2): Redshift NUMERIC → DoubleType,
  * epoch-millis columns land as LongType at staging and are converted to
  * TimestampType by the ingest layer, IDENTITY → surrogate long.
  */
object Schemas {

  /** Activity-log event source (reference README.md:49–72; loaded via
    * JSONPaths in sql_queries.py:102–107). Field names are the raw JSON
    * camelCase names; `Ingest.readLogEvents` renames to snake_case in the
    * order the reference's JSONPaths file fixes.
    */
  val logEventJson: StructType = StructType(Seq(
    StructField("artist", StringType),
    StructField("auth", StringType),
    StructField("firstName", StringType),
    StructField("gender", StringType),
    StructField("itemInSession", IntegerType),
    StructField("lastName", StringType),
    StructField("length", DoubleType),
    StructField("level", StringType),
    StructField("location", StringType),
    StructField("method", StringType),
    StructField("page", StringType),
    StructField("registration", LongType),      // epoch millis
    StructField("sessionId", IntegerType),
    StructField("song", StringType),
    StructField("status", IntegerType),
    StructField("ts", LongType),                // epoch millis
    StructField("userAgent", StringType),
    StructField("userId", StringType)           // may be "" (reference keeps it)
  ))

  /** Song-metadata source (reference README.md:30–45; name-matched load
    * `JSON 'auto'`, sql_queries.py:109–111). Spark's by-name JSON mapping
    * is exactly the `'auto'` semantics.
    */
  val songJson: StructType = StructType(Seq(
    StructField("num_songs", IntegerType),
    StructField("artist_id", StringType),
    StructField("artist_latitude", DoubleType),
    StructField("artist_longitude", DoubleType),
    StructField("artist_location", StringType),
    StructField("artist_name", StringType),
    StructField("song_id", StringType),
    StructField("title", StringType),
    StructField("duration", DoubleType),
    StructField("year", IntegerType)            // 0 = unknown sentinel
  ))

  /** Staging schema after rename/convert (reference sql_queries.py:19–38). */
  val stagingEvents: StructType = StructType(Seq(
    StructField("artist", StringType),
    StructField("auth", StringType),
    StructField("first_name", StringType),
    StructField("gender", StringType),
    StructField("item_in_session", IntegerType),
    StructField("last_name", StringType),
    StructField("length", DoubleType),
    StructField("level", StringType),
    StructField("location", StringType),
    StructField("method", StringType),
    StructField("page", StringType),
    StructField("registration", TimestampType),
    StructField("session_id", IntegerType),
    StructField("song", StringType),
    StructField("status", IntegerType),
    StructField("ts", TimestampType),
    StructField("user_agent", StringType),
    StructField("user_id", StringType)
  ))

  // Warehouse star schema (reference sql_queries.py:53–97).
  val time: StructType = StructType(Seq(
    StructField("start_time", TimestampType, nullable = false),
    StructField("hour", IntegerType, nullable = false),
    StructField("day", IntegerType, nullable = false),
    StructField("week", IntegerType, nullable = false),
    StructField("month", IntegerType, nullable = false),
    StructField("year", IntegerType, nullable = false),
    StructField("weekday", IntegerType, nullable = false)  // 0=Sunday..6 (Redshift EXTRACT(dow))
  ))

  val users: StructType = StructType(Seq(
    StructField("user_id", StringType, nullable = false),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("gender", StringType),
    StructField("level", StringType)
  ))

  val songs: StructType = StructType(Seq(
    StructField("song_id", StringType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("artist_id", StringType, nullable = false),
    StructField("year", IntegerType),            // nullable: 0-sentinel → null
    StructField("duration", DoubleType)
  ))

  val artists: StructType = StructType(Seq(
    StructField("artist_id", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("location", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType)
  ))

  val songplays: StructType = StructType(Seq(
    StructField("songplay_id", LongType, nullable = false),
    StructField("start_time", TimestampType),
    StructField("user_id", StringType),
    StructField("level", StringType),
    StructField("song_id", StringType),
    StructField("artist_id", StringType),
    StructField("session_id", IntegerType),
    StructField("location", StringType),
    StructField("user_agent", StringType)
  ))
}
