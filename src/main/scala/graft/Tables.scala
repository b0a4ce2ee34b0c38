package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Loaders for the driver's testdata star schema (TESTDATA.md) and the
  * engine's own chunk/index schemas (FIXTURES.md §2/§4).
  */
object Tables {

  val Names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts arrives as whatever the generator last wrote — TIMESTAMP
    // (NANOS) in early rounds (read as epoch-nano longs via the legacy
    // conf), plain tz-naive TIMESTAMP(MICROS) since round 8. Every
    // downstream query does integer arithmetic in the epoch-nano domain
    // (`ts div 1000` → µs, `ts div 3.6e12` → hours), so normalize here:
    // whatever the physical type, `ts` leaves this loader as epoch-nano
    // LongType, and the whole suite is generator-schema-proof.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** Rewrite a timestamp-typed `ts` to epoch-nano longs. The NTZ branch is
    * deliberately TIMEZONE-FREE: an NTZ→TIMESTAMP cast would re-interpret
    * the wall-clock in the session zone (a silent ±hours shift anywhere
    * but UTC), while date/time-part extraction on NTZ is zone-independent
    * by definition — so epoch is assembled from unix_date + H/M/S parts,
    * exactly the value DuckDB's `epoch_us(ts)` computes on the same file.
    * date_part('SECOND') is DECIMAL(8,6) carrying the full micro fraction;
    * ×1e6 is exact integer decimal math.
    */
  private def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    df.schema("ts").dataType match {
      case LongType => df
      case TimestampNTZType =>
        val us = expr("unix_date(cast(ts as date))").cast("long") * lit(86400000000L) +
          expr("date_part('HOUR', ts)").cast("long") * lit(3600000000L) +
          expr("date_part('MINUTE', ts)").cast("long") * lit(60000000L) +
          expr("cast(date_part('SECOND', ts) * 1000000 as bigint)")
        df.withColumn("ts", us * lit(1000L))
      case TimestampType =>
        df.withColumn("ts", expr("unix_micros(ts)") * lit(1000L))
      case other =>
        throw new IllegalArgumentException(
          s"events.ts: unsupported physical type $other")
    }
  }

  /** Chunk table — the reference's central relation
    * (`pipeline1.py:657`, `699-700`, `872-874`).
    */
  val chunkSchema: StructType = StructType(Seq(
    StructField("Content", StringType, nullable = false),
    StructField("TokenCount", IntegerType, nullable = false),
    StructField("FormName", StringType, nullable = false),
    StructField("ChunkId", StringType, nullable = false),
    StructField("Embeddings", ArrayType(FloatType, containsNull = false), nullable = true)))

  /** Vector index records (`pipeline2.py:130-133`). */
  val vectorIndexSchema: StructType = StructType(Seq(
    StructField("vector_id", StringType, nullable = false),
    StructField("content_vector", ArrayType(FloatType, containsNull = false), nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("text", StringType, nullable = false)))

  /** Read a headered chunk CSV the way pipeline 2 consumes pipeline 1 output
    * (`pipeline2.py:119-131`): explicit schema, embeddings serialized as a
    * JSON-ish float list string.
    */
  def readChunkCsv(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read
      .option("header", true)
      .schema(StructType(Seq(
        StructField("Content", StringType),
        StructField("TokenCount", IntegerType),
        StructField("FormName", StringType),
        StructField("ChunkId", StringType),
        StructField("Embeddings", StringType))))
      .csv(path)
      .withColumn("Embeddings", from_json(col("Embeddings"), ArrayType(FloatType)))
  }
}
