package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — correct answer, O(n·q). For one
  * query vector this is `TakeOrderedAndProject` over a single scan (the
  * reference's whole retrieval path); for a query SET it is a broadcast
  * nested-loop (queries broadcast, corpus scanned once) + per-query window
  * top-k.
  *
  * Scale path: sign-LSH bucketing — vectors land in 2^p buckets keyed by the
  * sign pattern of p fixed pseudo-random hyperplanes (deterministic seeded
  * unit vectors). Queries probe only their own bucket: the scan shrinks
  * ~2^p-fold, the join is an equi-join on bucket id (shuffle-hash, or
  * broadcast when the query set is small), recall traded via p and
  * multi-probe. An IVF variant would swap the hash for learned centroids;
  * the plumbing below is identical.
  */
object SimilaritySearch {

  /** Brute-force top-k neighbors for each query row.
    * `queries(qidCol, vecCol)` × `corpus(idCol, vecCol)` → per-query top-k
    * by cosine. Queries are broadcast (small side by contract).
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", qidCol: String = "query_id",
      vecCol: String = "embedding", excludeSelf: Boolean = true): DataFrame = {
    val q = broadcast(queries.select(col(qidCol), col(vecCol).as("query_vec")))
    val scored = corpus.select(col(idCol), col(vecCol))
      .join(q, if (excludeSelf) col(idCol) =!= col(qidCol) else lit(true))
      .withColumn("score", VectorFunctions.cosineSim(col(vecCol), col("query_vec")))
    val w = Window.partitionBy(col(qidCol)).orderBy(col("score").desc, col(idCol))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qidCol), col(idCol).as("neighbor_id"), col("score"), col("rank"))
  }

  /** Deterministic hyperplane component h(plane, i) in [-1, 1]. */
  private def planeComponent(plane: Int, i: Int): Double =
    ((graft.functions.HashFunctions.stableHash64(s"plane:$plane:$i") % 2001L) - 1000L) / 1000.0

  /** Sign-LSH bucket id (0 .. 2^planes − 1) for a vector column of
    * dimension `dim`: bit p = 1 iff dot(v, hyperplane_p) > 0. Pure
    * expression — computed at scan time, no shuffle, oracle-reproducible.
    */
  def signBucket(vecCol: Column, dim: Int, planes: Int): Column = {
    (0 until planes).map { p =>
      val planeVec = lit((0 until dim).map(i => planeComponent(p, i)).toArray)
      when(VectorFunctions.dotProduct(vecCol, planeVec) > 0.0, 1L << p).otherwise(0L)
    }.reduce(_ + _)
  }

  /** Multi-probe sign-LSH ANN: each query probes its own bucket AND every
    * Hamming-1 neighbor (one hyperplane sign flipped) — `planes + 1` probes.
    * Recall recovers most of what single-probe loses at bucket boundaries
    * for the cost of replicating only the QUERY side (exploded before the
    * broadcast); the corpus is still scanned once and joined by bucket
    * equi-join. The top-k window spans all probed buckets.
    */
  def lshTopKMultiProbe(
      corpus: DataFrame, queries: DataFrame, k: Int, dim: Int, planes: Int,
      idCol: String = "vec_id", qidCol: String = "query_id",
      vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol), col(vecCol))
      .withColumn("bucket", signBucket(col(vecCol), dim, planes))
    val probeSet = array((lit(0L) +: (0 until planes).map(p => lit(1L << p))): _*)
    val q = broadcast(queries.select(col(qidCol), col(vecCol).as("query_vec"))
      .withColumn("bucket0", signBucket(col("query_vec"), dim, planes))
      .withColumn("flip", explode(probeSet))
      .withColumn("bucket", col("bucket0").bitwiseXOR(col("flip")))
      .drop("bucket0", "flip"))
    val scored = c.join(q, Seq("bucket"))
      .filter(col(idCol) =!= col(qidCol))
      .withColumn("score", VectorFunctions.cosineSim(col(vecCol), col("query_vec")))
    val w = Window.partitionBy(col(qidCol)).orderBy(col("score").desc, col(idCol))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qidCol), col(idCol).as("neighbor_id"), col("score"), col("rank"))
  }

  /** Int8 scalar quantization of `vecCol`: per-vector scale
    * `127 / max|v_i|`, component `q_i = floor(v_i·scale + 0.5)` ∈
    * [-127, 127]. Adds `q_scale` (DOUBLE) and `qvec` (ARRAY<BIGINT> of
    * int8-range values). floor(x+0.5) is used instead of round() because
    * engines disagree on round-half-to-even vs half-away — floor is
    * bit-identical everywhere. This is the stored corpus representation of
    * a quantized ANN index: 1 byte per dimension instead of 4, quantized
    * once at ingest.
    */
  def quantizeInt8(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("q_scale",
        lit(127.0) / array_max(transform(col(vecCol), x => abs(x))).cast("double"))
      .withColumn("qvec", transform(col(vecCol),
        x => floor(x.cast("double") * col("q_scale") + lit(0.5)).cast("long")))

  /** Two-stage quantized ANN — the memory-bound scale path: stage 1 ranks
    * by the INTEGER dot product of int8-quantized vectors (exact integer
    * math, 4× less index to scan than float32; descaled by
    * `qdot / (scale_q·scale_c)` only to make scores comparable across
    * rows), stage 2 rescores the top `candidates` survivors with the exact
    * float cosine and emits top-k. Queries are broadcast; the corpus is
    * scanned once. `qdot` rides to the output as the integer evidence of
    * the quantized stage.
    */
  def quantizedTopK(
      corpus: DataFrame, queries: DataFrame, k: Int, candidates: Int,
      idCol: String = "vec_id", qidCol: String = "query_id",
      vecCol: String = "embedding"): DataFrame = {
    val c = quantizeInt8(corpus.select(col(idCol), col(vecCol)), vecCol)
      .withColumnRenamed("q_scale", "s_c").withColumnRenamed("qvec", "qv_c")
    val q = broadcast(
      quantizeInt8(queries.select(col(qidCol), col(vecCol).as("query_vec")), "query_vec")
        .withColumnRenamed("q_scale", "s_q").withColumnRenamed("qvec", "qv_q"))
    val scored = c.join(q, col(idCol) =!= col(qidCol))
      .withColumn("qdot", aggregate(
        zip_with(col("qv_c"), col("qv_q"), (x, y) => x * y), lit(0L), (acc, x) => acc + x))
      .withColumn("ascore", col("qdot").cast("double") / (col("s_q") * col("s_c")))
    val w1 = Window.partitionBy(col(qidCol)).orderBy(col("ascore").desc, col(idCol))
    val w2 = Window.partitionBy(col(qidCol)).orderBy(col("score").desc, col(idCol))
    scored
      .withColumn("r1", row_number().over(w1))
      .filter(col("r1") <= candidates)
      .withColumn("score", VectorFunctions.cosineSim(col(vecCol), col("query_vec")))
      .withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
      .select(col(qidCol), col(idCol).as("neighbor_id"), col("qdot"), col("score"), col("rank"))
  }

  /** LSH-bucketed ANN: equi-join on bucket id, then per-query top-k inside
    * the bucket. Probes only the query's own bucket (single-probe).
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, k: Int, dim: Int, planes: Int,
      idCol: String = "vec_id", qidCol: String = "query_id",
      vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol), col(vecCol))
      .withColumn("bucket", signBucket(col(vecCol), dim, planes))
    val q = broadcast(queries.select(col(qidCol), col(vecCol).as("query_vec"))
      .withColumn("bucket", signBucket(col("query_vec"), dim, planes)))
    val scored = c.join(q, Seq("bucket"))
      .filter(col(idCol) =!= col(qidCol))
      .withColumn("score", VectorFunctions.cosineSim(col(vecCol), col("query_vec")))
    val w = Window.partitionBy(col(qidCol)).orderBy(col("score").desc, col(idCol))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qidCol), col(idCol).as("neighbor_id"), col("score"), col("rank"), col("bucket"))
  }
}
