package graft.index

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The vector index as a Parquet-backed table with pipeline-2 semantics
  * (`pipeline2.py:117-225`): records `(vector_id, content_vector, title,
  * text)`; create-if-absent with data-derived dimension; batched upsert;
  * delete by ids / by form titles / all; per-form stats and existence.
  *
  * Deletes are expressed as anti-join rewrites (SURVEY.md U2) — next-state =
  * current ⟕̸ victims — which at scale is a distributed rewrite, never a
  * driver-side id scan. The reference's `top_k = total_vector_count` id
  * listing (`pipeline2.py:165`, `221` — a full-index scan per form) becomes a
  * plain filter (SURVEY.md §4.2).
  */
final class VectorIndex(spark: SparkSession, path: String) {

  import spark.implicits._

  def exists: Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p)
  }

  def read: DataFrame = spark.read.parquet(path)

  /** Index dimension derived from data, as the reference creates indexes
    * (`pipeline2.py:134-138`).
    */
  def dimension: Int =
    if (!exists) 0
    else read.select(size($"content_vector")).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(0)

  /** Upsert chunk rows (columns: title, text, content_vector). Ids are
    * minted `title + "_" + n` with n = row_number per title ordered by
    * `ordCol`, OFFSET by the number of records the title already holds —
    * the per-form twin of `pipeline2.py:130-132` (the reference uses the
    * global CSV index; per-title numbering keeps id minting shuffle-local
    * and stable under any partitioning at scale).
    *
    * Two id-minting modes:
    *  - `append = false` (default, reference parity): ids index the INCOMING
    *    batch from 0 — re-upserting the same batch replaces its records
    *    (idempotent), but a PARTIAL batch for an existing title overwrites
    *    that title's low ids (the reference re-uploads whole forms, so this
    *    matches `pipeline2.py`'s model).
    *  - `append = true`: ids continue from the title's existing record
    *    count, so incremental adds never clobber prior records.
    */
  def upsert(records: DataFrame, ordCol: String, append: Boolean = false): Unit = {
    val w = Window.partitionBy($"title").orderBy(col(ordCol))
    val numbered = records.withColumn("__rn", row_number().over(w) - 1)
    val withIds = (
      if (!exists || !append) numbered.withColumn("__base", lit(0L))
      else {
        val existingCounts = read.groupBy($"title").agg(count(lit(1)).as("__base"))
        numbered.join(broadcast(existingCounts), Seq("title"), "left")
          .withColumn("__base", coalesce($"__base", lit(0L)))
      })
      .withColumn("vector_id",
        concat($"title", lit("_"), ($"__base" + $"__rn").cast("string")))
      .select($"vector_id", $"content_vector", $"title", $"text")
    val next =
      if (!exists) withIds
      else read.join(withIds.select("vector_id"), Seq("vector_id"), "left_anti")
        .unionByName(withIds)
    rewrite(next)
  }

  def deleteByIds(ids: Seq[String]): Unit =
    rewrite(read.filter(!$"vector_id".isin(ids: _*)))

  def deleteByForms(titles: Seq[String]): Unit =
    rewrite(read.filter(!$"title".isin(titles: _*)))

  def deleteAll(): Unit = rewrite(read.limit(0))

  /** Per-form vector counts (`describe_index_stats` analog). */
  def stats: DataFrame = read.groupBy($"title").agg(count(lit(1)).as("n_vectors"))

  /** J4 existence probe — a filter+limit, not a dummy-vector full scan. */
  def formExists(title: String): Boolean =
    read.filter($"title" === title).limit(1).count() > 0

  /** All ids for given forms — the J6 id-listing as a filter. */
  def idsForForms(titles: Seq[String]): DataFrame =
    read.filter($"title".isin(titles: _*)).select($"vector_id")

  private def rewrite(next: DataFrame): Unit = {
    // materialize before overwriting the path we read from
    val tmp = path.stripSuffix("/") + ".tmp"
    next.write.mode(SaveMode.Overwrite).parquet(tmp)
    spark.read.parquet(tmp).write.mode(SaveMode.Overwrite).parquet(path)
    val p = new org.apache.hadoop.fs.Path(tmp)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }
}
