package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Distributed chunking (the whole of pipeline 1's transform DAG as ONE lazy
  * plan — SURVEY.md §3.2): documents arrive as (formName, text) rows, are
  * grouped per form (the single shuffle), and each group runs the sequential
  * packer. Parallelism is across forms/documents — at 100 TB that is millions
  * of independent groups, so executors stay saturated while each group's
  * packing remains the order-faithful sequential algorithm.
  */
object ChunkingJob {

  final case class DocInput(formName: String, seq: Long, text: String)
  final case class ChunkRow(Content: String, TokenCount: Int, FormName: String, ChunkId: String)

  /** PyPDF path (C1+C2): text split to lines inside the group — no
    * per-line shuffle, document order preserved by construction.
    */
  def chunkPyPdf(docs: Dataset[DocInput], tokenLimit: Int, parityIds: Boolean = true): Dataset[ChunkRow] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.formName).flatMapGroups { (form, rows) =>
      // several rows may share a form: order by seq so packing is stable
      // under any partitioning (flatMapGroups has no intra-group order)
      val text = rows.toSeq.sortBy(_.seq).map(_.text).mkString("\n")
      val (first, second) = ChunkPacker.packPyPdfPasses(text.split("\n", -1).toSeq, tokenLimit)
      val all = first ++ second
      val ids = ChunkPacker.pyPdfChunkIds(first.size, all.size, form, parityIds)
      all.zip(ids).iterator.map { case (c, id) =>
        ChunkRow(c, TextFunctions.numTokens(c), form, id)
      }
    }
  }

  /** Nougat path (clean → sectionize → C3 → C4) per form. */
  def chunkNougat(docs: Dataset[DocInput], tokenLimit: Int): Dataset[ChunkRow] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.formName).flatMapGroups { (form, rows) =>
      val text = rows.toSeq.sortBy(_.seq).map(_.text).mkString("\n")
      Sectionizer.chunkDocument(form, text, tokenLimit).zipWithIndex.iterator.map {
        case (c, i) => ChunkRow(c.content, c.tokenCount, form, s"${form}_$i")
      }
    }
  }

  /** W1-W4 as pure window expressions over paragraph rows — the declarative
    * twin of [[Sectionizer.paragraphs]], for corpora that are already
    * exploded to lines. Input columns: formName, lineNo, para. Output adds
    * paraSemantics, isHeading, section, tokenCount, cumulativeTokenCount.
    * One shuffle on formName; both windows share the partitioning.
    */
  def sectionizeDF(paras: DataFrame): DataFrame = {
    val byForm = Window.partitionBy(col("formName")).orderBy(col("lineNo"))
    val before = byForm.rowsBetween(Window.unboundedPreceding, -1)
    val upToHere = byForm.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    paras
      .withColumn("paraSemantics", TextFunctions.classifyMarkdownCol(col("para")))
      .withColumn("isHeading", col("paraSemantics").isin("Heading1", "Heading2", "Heading3").cast("int"))
      .withColumn("headingSeenBefore", coalesce(max(col("isHeading")).over(before), lit(0)))
      .withColumn("section",
        sum(when(col("isHeading") === 1 || col("headingSeenBefore") === 0, 1).otherwise(0))
          .over(upToHere))
      .withColumn("tokenCount", TextFunctions.numTokensCol(col("para")))
      .withColumn("cumulativeTokenCount", sum(col("tokenCount")).over(upToHere))
      .drop("headingSeenBefore")
  }

  /** A1 made deterministic: sections aggregated with explicit in-group order
    * (`array_sort(collect_list(struct))` — collect_list alone is
    * order-nondeterministic after shuffle).
    */
  def sectionsDF(sectionized: DataFrame): DataFrame =
    sectionized
      .groupBy(col("formName"), col("section"))
      .agg(expr("array_join(transform(array_sort(collect_list(struct(lineNo, para))), x -> x.para), '\n')").as("chunk"))
      .withColumn("tokenCount", TextFunctions.numTokensCol(col("chunk")))
}
