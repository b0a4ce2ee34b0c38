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
