package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.IvfIndex

/** Persisted IVFADC index with a build-once / query-many split — the
  * compressed-index analog of pipeline 2's vector index lifecycle
  * (reference `pipeline2.py:117-150`: build the index once, serve queries
  * against the stored structure, never against the raw corpus).
  *
  * [[build]] pays the corpus scans ONCE and persists three relations:
  *
  *   - `centroids.parquet` — k coarse centroids (k-row broadcast side)
  *   - `codebook.parquet`  — m×kcode PQ sub-centroids (Lloyd-trained per
  *     subspace since round 12, q178's `PqCodebook.train`)
  *   - `codes.parquet`     — per-vector 8-byte PQ codes as (vec_id, s,
  *     code), PARTITIONED BY the coarse cell (`centroid_id`) — the IVF
  *     "inverted list" layout expressed as parquet partition directories
  *
  * [[query]] reads ONLY those three relations: the probed-cell id list is
  * a static `isin` predicate over the partition column, so the codes scan
  * is PARTITION-PRUNED to nprobe·|queries| directories and the raw
  * embedding corpus is never touched on the serve path (plan-pinned in
  * the spec; q210 pins it against the inline q184 arithmetic). At 100 TB
  * the serve-side cost is the probed cells' code lists — ~1/k of an
  * 8-byte-per-vector table per probe — plus broadcast-sized LUT joins.
  *
  * Arithmetic is bit-identical to q178/q184: encode by max-margin argmax
  * (dot − ‖c‖²/2), ADC sums BIGINT micro-units, ties broken on lowest
  * code/vec_id.
  */
object AnnIndex {

  /** Scan the corpus once; persist centroids + codebook + cell-partitioned
    * codes under `dir`. The PQ codebook is Lloyd-trained
    * ([[graft.operators.PqCodebook.train]], round 12 — exact-integer
    * micro-sum means, `trainIters = 2` is the measured recall knee;
    * `trainIters = 0` reproduces the pre-round-12 raw seed grid).
    */
  def build(emb: DataFrame, dir: String,
      m: Int = 8, sub: Int = 8, kcode: Int = 16, trainIters: Int = 2): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cents = IvfIndex.centroids(emb, k = 0, iters = 0)
    cents.write.mode("overwrite").parquet(s"$dir/centroids.parquet")
    val cells = IvfIndex.assign(emb, cents, "vec_id", "embedding")
      .select($"vec_id", $"centroid_id")
    val cb = graft.operators.PqCodebook.train(emb, m, sub, kcode, trainIters)
    cb.write.mode("overwrite").parquet(s"$dir/codebook.parquet")
    // cluster by the partition column before the partitioned write
    // (guide §6): without it every write task touches every cell
    // directory — tasks × cells tiny files whose open/commit overhead
    // dominates the build AND every later pruned serve scan; keyed
    // repartition makes files-per-cell ~1 (AQE sizes the task count)
    encodeCodes(emb, cb, m, sub)
      .join(cells, Seq("vec_id"))
      .repartition(col("centroid_id"))
      .write.mode("overwrite").partitionBy("centroid_id")
      .parquet(s"$dir/codes.parquet")
  }

  /** PQ-encode `emb` against codebook `cb`: max-margin argmax per
    * sub-block (dot − ‖c‖²/2, ties → lowest code), the q178 algebra
    * (delegates to [[graft.operators.PqCodebook.encode]]).
    * Returns (vec_id, s, code); the codebook side is broadcast.
    */
  private def encodeCodes(emb: DataFrame, cb: DataFrame,
      m: Int, sub: Int): DataFrame =
    graft.operators.PqCodebook.encode(emb, cb, m, sub)

  /** Nightly delta append: encode ONLY the arriving vectors against the
    * STORED centroids + codebook (both broadcast-sized reads) and append
    * their cell-partitioned codes — the base corpus is never rescanned
    * and existing code files are never rewritten, the same delta-only
    * cost model as the incremental span-dedup index. Quantization drift
    * is the operational counterpart: when the delta distribution departs
    * from the codebook's training corpus, rebuild — this operator makes
    * the refresh cheap enough to schedule nightly either way.
    */
  def appendDelta(spark: SparkSession, dir: String, delta: DataFrame,
      m: Int = 8, sub: Int = 8): Unit = {
    import spark.implicits._
    val cents = spark.read.parquet(s"$dir/centroids.parquet")
    val cb = spark.read.parquet(s"$dir/codebook.parquet")
    val cells = IvfIndex.assign(delta, cents, "vec_id", "embedding")
      .select($"vec_id", $"centroid_id")
    encodeCodes(delta, cb, m, sub)
      .join(cells, Seq("vec_id"))
      .repartition(col("centroid_id")) // one file per touched cell (§6)
      .write.mode("append").partitionBy("centroid_id")
      .parquet(s"$dir/codes.parquet")
  }

  /** Top-k per query against the PERSISTED index only. `queries` carries
    * (`query_id`, `qv`); `excludeSelf` drops `vec_id == query_id` hits for
    * corpus-sourced query sets (the q184 recall convention). Output:
    * (query_id, rank, vec_id, adc_u).
    */
  def query(spark: SparkSession, dir: String, queries: DataFrame,
      k: Int, nprobe: Int, m: Int = 8, sub: Int = 8,
      excludeSelf: Boolean = false): DataFrame = {
    import spark.implicits._
    val cents = spark.read.parquet(s"$dir/centroids.parquet")
      .localCheckpoint(false) // k rows; probed twice (cells + collect)
    val cb = spark.read.parquet(s"$dir/codebook.parquet")
    val subs = broadcast((0 until m).map(_.toLong).toDF("s"))
    val q = queries.localCheckpoint(false) // cell ranking + LUT read it
    val wc = Window.partitionBy($"query_id").orderBy($"csc".desc, $"centroid_id")
    val qcells = q.crossJoin(broadcast(cents))
      .select($"query_id", $"centroid_id",
        VectorFunctions.cosineSim($"qv", $"centroid").as("csc"))
      .withColumn("cell_rank", row_number().over(wc))
      .filter($"cell_rank" <= nprobe)
      .select($"query_id", $"centroid_id")
      .localCheckpoint(false) // candidate join + the isin collect below
    // nprobe·|queries| cell ids -> a STATIC partition-pruning predicate on
    // the codes scan (the collect is bounded by the query batch, never data)
    val probed = qcells.select($"centroid_id").distinct()
      .as[Int].collect().sorted.toSeq
    val lut = q.crossJoin(subs)
      .select($"query_id", $"s",
        slice($"qv", ($"s" * sub + 1).cast("int"), lit(sub)).as("qs"))
      .join(broadcast(cb), Seq("s"))
      .select($"query_id", $"s", $"code",
        floor(VectorFunctions.dotProduct($"qs", $"cent") * lit(1000000.0))
          .cast("long").as("dot_u"))
    val codes = spark.read.parquet(s"$dir/codes.parquet")
      .filter($"centroid_id".isin(probed.map(Integer.valueOf): _*))
    val adc = codes.join(broadcast(qcells), Seq("centroid_id"))
      .filter(if (excludeSelf) $"vec_id" =!= $"query_id" else lit(true))
      .join(broadcast(lut), Seq("query_id", "s", "code"))
      .groupBy($"query_id", $"vec_id")
      .agg(sum($"dot_u").as("adc_u"))
    val wk = Window.partitionBy($"query_id").orderBy($"adc_u".desc, $"vec_id")
    adc.withColumn("rank", row_number().over(wk)).filter($"rank" <= k)
      .select($"query_id", $"rank".cast("long").as("rank"), $"vec_id", $"adc_u")
  }
}
