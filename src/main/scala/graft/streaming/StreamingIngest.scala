package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.Tables
import graft.embed.{Embedder, EmbeddingJob}

/** Structured-Streaming surface (SURVEY.md §2.10): the reference is batch-
  * only, so these streams exist to chain pipeline 1 → pipeline 2 continuously
  * — (a) a file stream of chunk CSVs embedded and appended to the index via
  * foreachBatch, (b) watermarked event-time windowed aggregation (the q48
  * rollup as a stream), (c) an append-only chat-history stream. Custom
  * keyed state lives in [[StatefulOps]] (mapGroupsWithState).
  */
object StreamingIngest {

  /** Watch `inDir` for headered chunk CSVs (pipeline-1 output contract),
    * embed each micro-batch with `embedder`, append parquet to `indexDir`.
    */
  def chunkCsvToIndex(
      spark: SparkSession,
      inDir: String,
      indexDir: String,
      checkpointDir: String,
      embedder: Embedder): StreamingQuery = {
    val chunkCsvSchema = org.apache.spark.sql.types.StructType(
      Tables.chunkSchema.fields.map {
        case f if f.name == "Embeddings" => f.copy(dataType = org.apache.spark.sql.types.StringType)
        case f => f
      })
    val stream = spark.readStream
      .option("header", true)
      .schema(chunkCsvSchema)
      .csv(inDir)
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val embedded = EmbeddingJob.embedColumn(
          batch.drop("Embeddings"), "Content", embedder, "content_vector")
        embedded
          .withColumnRenamed("FormName", "title")
          .withColumnRenamed("Content", "text")
          .withColumnRenamed("ChunkId", "vector_id")
          .select("vector_id", "content_vector", "title", "text")
          .write.mode("append").parquet(indexDir)
        ()
      }
      .start()
  }

  /** Event-time tumbling windows with a watermark — the streaming twin of
    * the q48 batch rollup: per-hour event totals that FINALIZE (append-mode
    * emit) once the watermark passes the window end, so late events inside
    * `delay` still count and state is bounded. At scale this is a keyed
    * streaming aggregation: state partitions by window like any groupBy key.
    */
  def hourlyEventTotals(events: DataFrame, delay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("hour_start"), col("n"), col("total_value"))

  /** Append-only chat-history stream over a parquet directory, newest-first
    * per user in each micro-batch consumer (the W5 shape, streaming).
    */
  def chatHistoryStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("chat_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("user_question", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("system_answer", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("created_ts", org.apache.spark.sql.types.TimestampType))))
      .parquet(dir)
}
