package graft.embed

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Distributed embedding: mapPartitions with batched calls (C5 re-expressed;
  * the reference loops rows sequentially at 2.8 chunks/min —
  * `pipeline1.py:871-879`). Each partition embeds in `batchSize` groups, so
  * at 100 TB the embedding fan-out is bounded by partition count and the
  * embedder's own throttle, never by driver round-trips.
  */
object EmbeddingJob {

  /** The production embedding stack, composed the way a deployment wires it:
    * HTTP boundary → per-partition rate ceiling → retry/backoff with per-row
    * lenient blanking. Swap [[DeterministicEmbedder]] in for offline/oracle
    * runs; the failure policy wraps either the same way (see
    * `SparkEntry.q34_embed_pipeline`).
    */
  def httpStack(
      endpoint: String,
      model: String,
      apiKey: String,
      dim: Int,
      callsPerCycle: Int = 3,
      cycleSleepMillis: Long = 65000L,
      maxRetries: Int = 2,
      lenient: Boolean = true,
      backoffMillis: Long = 1000L,
      transport: String => String = null,
      sleeper: Long => Unit = Thread.sleep): Embedder =
    new ResilientEmbedder(
      new ThrottledEmbedder(
        new HttpEmbedder(endpoint, model, apiKey, dim, transport),
        callsPerCycle, cycleSleepMillis, sleeper),
      maxRetries = maxRetries, lenient = lenient,
      backoffMillis = backoffMillis, sleeper = sleeper)

  /** Adds `embeddingCol` (array<float>) by embedding `textCol`. */
  def embedColumn(
      df: DataFrame,
      textCol: String,
      embedder: Embedder,
      embeddingCol: String = "Embeddings",
      batchSize: Int = 300): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+
      StructField(embeddingCol, ArrayType(FloatType, containsNull = false), nullable = true))
    val textIdx = inSchema.fieldIndex(textCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val vecs = embedder.embed(batch.map(_.getString(textIdx)))
        batch.iterator.zip(vecs.iterator).map { case (row, v) =>
          Row.fromSeq(row.toSeq :+ v.toSeq)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
