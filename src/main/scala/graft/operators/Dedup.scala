package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions

/** Deduplication operators for large-scale training-data pipelines — exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard. Everything is expressed in
  * codegen'd built-ins (higher-order array functions + md5-derived hashes)
  * so the same math is reproducible in the DuckDB oracle and survives a
  * 100 TB fan-out: signatures are computed scan-side (no shuffle), candidate
  * generation shuffles once on (band, bandHash), and verification runs only
  * within buckets — never an all-pairs cross join.
  */
object Dedup {

  /** Exact dedup: md5 grouping; keeper = min id per content hash. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keeper_id"))

  /** Character n-gram shingles as an array column (texts shorter than n
    * yield the whole text as a single shingle).
    */
  def shinglesCol(textCol: Column, n: Int): Column =
    when(length(textCol) < n, array(textCol))
      .otherwise(transform(
        sequence(lit(1), length(textCol) - n + 1),
        i => textCol.substr(i, lit(n))))

  /** One MinHash component: `min over shingles s of stableHash64(seed:s)`. */
  def minhashComponent(shingles: Column, seed: Int): Column =
    array_min(transform(shingles, s => HashFunctions.stableHash64(s, seed)))

  /** MinHash signature (array<bigint> of length numHashes) added as
    * `minhash`. Scan-side only — no shuffle.
    */
  def minhashSig(df: DataFrame, textCol: String, numHashes: Int, shingle: Int): DataFrame = {
    val sh = shinglesCol(col(textCol), shingle)
    df.withColumn("minhash",
      array((0 until numHashes).map(j => minhashComponent(sh, j)): _*))
  }

  /** LSH candidate pairs: signatures banded `bands × rowsPerBand`; a pair is
    * a candidate iff some band hashes equal. One shuffle on (band, hash);
    * within-bucket self-join only — never all-pairs.
    */
  def lshCandidates(
      sigDF: DataFrame, idCol: String, bands: Int, rowsPerBand: Int): DataFrame = {
    val exploded = sigDF.select(
      col(idCol),
      posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => HashFunctions.stableHash64(
          concat_ws(",", slice(col("minhash"), b * rowsPerBand + 1, lit(rowsPerBand))))))
        .as(Seq("band", "band_hash")))
    val a = exploded.as("a")
    val b = exploded.as("b")
    a.join(b,
        col("a.band") === col("b.band") &&
        col("a.band_hash") === col("b.band_hash") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }

  /** Estimated Jaccard from two equal-length signatures. */
  def sigJaccard(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / size(a)

  /** Exact n-gram Jaccard between two text columns' distinct shingle sets. */
  def jaccard(textA: Column, textB: Column, n: Int): Column = {
    val sa = array_distinct(shinglesCol(textA, n))
    val sb = array_distinct(shinglesCol(textB, n))
    size(array_intersect(sa, sb)).cast("double") / size(array_union(sa, sb))
  }

  /** 32-bit SimHash over whitespace tokens: bit k set iff the ±1 sum of bit
    * k across token hashes is positive. Hamming distance between simhashes
    * approximates token-set distance; bucket joins on it are the scale path.
    */
  def simhash32(textColName: String): Column = expr(
    s"""aggregate(
       |  transform(sequence(0, 31), k ->
       |    CASE WHEN aggregate(
       |      filter(split(trim($textColName), '\\\\s+'), t -> t != ''),
       |      0,
       |      (acc, t) -> acc + CASE WHEN
       |        shiftright(cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint), k) % 2 = 1
       |      THEN 1 ELSE -1 END) > 0
       |    THEN shiftleft(cast(1 as bigint), k) ELSE cast(0 as bigint) END),
       |  cast(0 as bigint), (acc, v) -> acc + v)""".stripMargin)

  /** Embedding near-dup: cosine above `threshold` marks a duplicate pair.
    * Pairing strategy is the caller's (LSH buckets, consecutive ids, ANN
    * candidates) — this is the verifier column.
    */
  def cosineNearDup(vecA: Column, vecB: Column, threshold: Double): Column =
    graft.functions.VectorFunctions.cosineSim(vecA, vecB) > threshold
}
