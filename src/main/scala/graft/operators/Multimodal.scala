package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed batch-wise in partitions (the Scala analog
  * of `mapInPandas` batches). The DECODE step is a deterministic STUB — this
  * container has no image/audio codecs — but the Spark-side plumbing
  * (schema, partitioning, batch shape, metadata struct) is real and tested;
  * swapping `StubDecoder` for a JNI/FFI codec changes nothing else.
  */
object Multimodal {

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("byte_length", LongType, nullable = false),
    StructField("content_md5", StringType, nullable = false),
    StructField("fake_width", IntegerType, nullable = false),
    StructField("fake_height", IntegerType, nullable = false)))

  /** STUB decode: deterministic pseudo-metadata from the bytes themselves
    * (md5-derived), standing in for real width/height/duration extraction.
    */
  object StubDecoder extends Serializable {
    def decode(bytes: Array[Byte]): (Long, String, Int, Int) = {
      val md5 = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      val hex = md5.map(b => f"$b%02x").mkString
      val h = java.lang.Long.parseLong(hex.take(15), 16)
      (bytes.length.toLong, hex, (h % 1920L).toInt, (h % 1080L).toInt)
    }
  }

  /** Attach a `media_meta` struct by decoding `binaryCol` partition-batch-
    * wise. Mirrors the Pandas-UDF batch shape: the decoder sees a batch of
    * byte arrays, never row-at-a-time driver calls.
    */
  def extractMeta(df: DataFrame, binaryCol: String, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+ StructField("media_meta", mediaMetaSchema, nullable = false))
    val binIdx = inSchema.fieldIndex(binaryCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val (len, hex, w, h) = StubDecoder.decode(row.getAs[Array[Byte]](binIdx))
          Row.fromSeq(row.toSeq :+ Row(len, hex, w, h))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Pure-expression twin for oracle checks (byte length + md5 + the same
    * md5-derived fake dimensions) — used when the "media" is demonstrably
    * text bytes. Stays in whole-stage codegen.
    */
  def metaColumns(binaryCol: String): Seq[(String, org.apache.spark.sql.Column)] = {
    val h = conv(substring(md5(col(binaryCol)), 1, 15), 16, 10).cast("long")
    Seq(
      "byte_length" -> length(col(binaryCol)).cast("long"),
      "content_md5" -> md5(col(binaryCol)),
      "fake_width" -> (h % 1920).cast("int"),
      "fake_height" -> (h % 1080).cast("int"))
  }

  private def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"$b%02x").mkString

  /** STUB resize: a real implementation decodes, scales, re-encodes; the
    * stub emits deterministic md5-derived bytes tagged with the target
    * dimensions so the pipeline shape (binary in → binary out, batch-wise,
    * schema preserved plus `resized`) is fully exercised and testable.
    */
  def resize(df: DataFrame, binaryCol: String, width: Int, height: Int,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+ StructField("resized", BinaryType, nullable = false))
    val binIdx = inSchema.fieldIndex(binaryCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val fake = md5Hex(row.getAs[Array[Byte]](binIdx)) + s":${width}x$height"
          Row.fromSeq(row.toSeq :+ fake.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame sampling for video-like media: each input row explodes into
    * `max(1, min(maxFrames, ceil(len / strideBytes)))` frame rows carrying
    * `(frame_idx, frame, frame_md5)`. The frame DECODE is the stub
    * (deterministic md5-derived bytes — no codec in this container), but
    * the 1→N batch-wise explode, schema, and partitioning are the real
    * plumbing a JNI/FFI frame extractor would drop into. `frame_md5` is
    * md5(content_md5 + ":" + idx) — oracle-reproducible.
    */
  def sampleFrames(df: DataFrame, binaryCol: String, strideBytes: Int,
      maxFrames: Int, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("frame_idx", LongType, nullable = false),
      StructField("frame", BinaryType, nullable = false),
      StructField("frame_md5", StringType, nullable = false)))
    val binIdx = inSchema.fieldIndex(binaryCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { row =>
          val bytes = row.getAs[Array[Byte]](binIdx)
          val contentMd5 = md5Hex(bytes)
          val n = math.max(1L, math.min(maxFrames.toLong,
            math.ceil(bytes.length.toDouble / strideBytes).toLong))
          (0L until n).map { i =>
            val fm = md5Hex(s"$contentMd5:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
            Row.fromSeq(row.toSeq ++ Seq(i, fm.getBytes(java.nio.charset.StandardCharsets.UTF_8), fm))
          }
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Feature extraction: media bytes → embedding vector through the
    * pluggable [[graft.embed.Embedder]] (stub embeds the content md5; a
    * real deployment swaps in a vision/audio encoder behind the same
    * trait), wiring multimodal columns into the engine's ANN/dedup
    * operators. Batch-wise like every media step.
    */
  def embedBinary(df: DataFrame, binaryCol: String,
      embedder: graft.embed.Embedder, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+
      StructField("media_embedding", ArrayType(FloatType, containsNull = false), nullable = false))
    val binIdx = inSchema.fieldIndex(binaryCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val keys = batch.map(row => md5Hex(row.getAs[Array[Byte]](binIdx)))
        val vecs = embedder.embed(keys)
        batch.iterator.zip(vecs.iterator).map { case (row, v) =>
          Row.fromSeq(row.toSeq :+ v.toSeq)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
