package graft.app

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.index.VectorIndex

/** Typed pipeline-2 operation config — the engine's front door for the
  * reference's DAG parameters (`operationType` + `operationPayload`,
  * `pipeline2.py:234-278`). Parsing produces a closed ADT; validation
  * failures reproduce the reference's messages, so a config that the
  * reference DAG rejects is rejected here with the same words.
  */
sealed trait IndexOp
object IndexOp {
  final case class Upsert(chunkCsvPath: String) extends IndexOp
  final case class DeleteByFormNames(names: Seq[String]) extends IndexOp
  final case class DeleteByVectorIds(ids: Seq[String]) extends IndexOp
  case object DeleteAll extends IndexOp
}

object OpConfig {

  /** `pipeline2.py:234-278` parity: payload is whatever JSON-ish value the
    * DAG carried — a string for upsert, a list of strings for the deletes,
    * null for deleteAll.
    */
  def validate(operationType: String, payload: Any): Either[String, IndexOp] = {
    def stringList(opName: String, expected: String): Either[String, Seq[String]] =
      payload match {
        case l: Seq[_] =>
          if (l.isEmpty)
            Left(s"While $opName operation - You need to give atleast one $expected in list")
          else if (!l.forall(_.isInstanceOf[String]))
            Left(s"While $opName operation - You need to give list of string values")
          else {
            val strs = l.asInstanceOf[Seq[String]]
            if (strs.exists(s => s.isEmpty || s.trim.isEmpty))
              Left(s"While $opName operation - You need to give list of non-empty string values")
            else Right(strs)
          }
        case _ => Left(s"While $opName operation - list of ${expected}s is expected")
      }
    operationType match {
      case "upsert" => payload match {
        case s: String => Right(IndexOp.Upsert(s))
        case _ => Left("While upsert operation - link of csv file is expected as a string")
      }
      case "deleteByFormNames" =>
        stringList("deleteByFormNames", "form name").map(IndexOp.DeleteByFormNames(_))
      case "deleteByVectorIds" =>
        stringList("deleteByVectorIds", "vector id").map(IndexOp.DeleteByVectorIds(_))
      case "deleteAll" =>
        if (payload == null) Right(IndexOp.DeleteAll)
        else Left("While deleteAll operation - Keep the operationPayload field empty/null")
      case other => Left(s"Unknown operationType: $other")
    }
  }

  /** Execute a validated op against the index, returning the post-op stats
    * frame (`describe_index_stats` analog the reference prints per run).
    * Upsert creates the index if absent (data-derived dimension, as the
    * reference does); every other op against a never-created index fails
    * with a clear reference-style message instead of a raw path-not-found
    * on the `v-1` snapshot dir.
    */
  def run(spark: SparkSession, indexPath: String, op: IndexOp) = {
    val idx = new VectorIndex(spark, indexPath)
    op match {
      case IndexOp.Upsert(csv) =>
        val chunks = Tables.readChunkCsv(spark, csv)
          .select(col("FormName").as("title"), col("Content").as("text"),
            col("Embeddings").as("content_vector"), col("ChunkId").as("ord"))
        idx.upsert(chunks, "ord")
      case _ if !idx.exists =>
        throw new IllegalArgumentException(
          s"Index does not exist at $indexPath - run an upsert operation first")
      case IndexOp.DeleteByFormNames(names) => idx.deleteByForms(names)
      case IndexOp.DeleteByVectorIds(ids) => idx.deleteByIds(ids)
      case IndexOp.DeleteAll => idx.deleteAll()
    }
    idx.stats
  }
}

/** CLI entry: `EngineMain <indexPath> <operationType> [payload...]` —
  * deletes take the payload as remaining args; upsert takes one CSV path.
  */
object EngineMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: EngineMain <indexPath> <operationType> [payload...]")
    val (indexPath, opType) = (args(0), args(1))
    val payload: Any = opType match {
      case "upsert" => if (args.length > 2) args(2) else null
      case "deleteAll" => null
      case _ => args.drop(2).toSeq
    }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // exit code is set INSIDE the try and acted on after the finally:
    // System.exit skips finally blocks, so calling it in the match arm
    // would leak the session
    var exitCode = 0
    try
      OpConfig.validate(opType, payload) match {
        case Left(err) => System.err.println(err); exitCode = 2
        case Right(op) =>
          try OpConfig.run(spark, indexPath, op).show(truncate = false)
          catch {
            case e: IllegalArgumentException =>
              System.err.println(e.getMessage); exitCode = 2
          }
      }
    finally spark.stop()
    if (exitCode != 0) sys.exit(exitCode)
  }
}
