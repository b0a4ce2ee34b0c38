package graft.operators

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.col

import graft.functions.TextFunctions

/** Training-sequence packing — the standard LLM pretraining batch-construction
  * op: documents are greedily packed, in corpus order within each source,
  * into sequences holding at most `tokenBudget` tokens (a document larger
  * than the budget gets a sequence of its own; packing never splits a
  * document). The greedy fold is the C1 packer family applied at document
  * granularity, so it reuses the same distributed shape: ONE columnar
  * shuffle (repartition by source + within-partition sort), then the
  * sequential fold streams each source's run — O(1) state per task,
  * parallel across sources.
  *
  * Output is one row per document with its assigned sequence number and
  * token count; aggregate by (source, seq_no) for per-sequence stats.
  */
object SequencePacker {

  final case class PackedDoc(source: String, doc_id: Long, seq_no: Long, doc_tokens: Int)

  def packBySource(
      docs: Dataset[ChunkingJob.DocInput],
      tokenBudget: Int): Dataset[PackedDoc] = {
    import docs.sparkSession.implicits._
    docs
      .repartition(col("formName"))
      .sortWithinPartitions(col("formName"), col("seq"))
      .mapPartitions { rows =>
        ChunkingJob.formRuns(rows).flatMap { case (source, run) =>
          var cur = 0L
          var seqNo = 0L
          run.map { d =>
            val t = TextFunctions.numTokens(d.text)
            if (cur == 0L || cur + t > tokenBudget) { seqNo += 1; cur = t.toLong }
            else cur += t
            PackedDoc(source, d.seq, seqNo, t)
          }
        }
      }
  }
}
