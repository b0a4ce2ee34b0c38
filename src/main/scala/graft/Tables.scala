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
    // events.parquet carries TIMESTAMP(NANOS) which Spark has no native type
    // for; read as epoch-nano longs — ordering/window semantics unchanged.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
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
