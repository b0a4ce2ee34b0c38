package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, KeyValueGroupedDataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via `mapGroupsWithState` (the prompt's north-star
  * streaming surface; the reference itself has no streaming — SURVEY §2.10).
  * Running per-user totals survive across micro-batches in the state store;
  * at scale state is partitioned by key like any keyed stream.
  */
object StatefulOps {

  final case class UserEvent(user_id: Long, value: Double)
  final case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

  def runningUserTotals(events: Dataset[UserEvent]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[UserEvent], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(uid, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          it.foreach { e => n += 1; tot += e.value }
          val next = UserTotals(uid, n, tot)
          state.update(next)
          next
      }
  }

  final case class NearDupPair(id_a: Long, id_b: Long, est_jac: Double)
  /** Per-bucket LSH state: (doc id, minhash signature) seen so far. */
  final case class BucketState(members: Seq[(Long, Seq[Long])])

  /** Streaming twin of [[graft.operators.Dedup.nearDupPairs]]: incoming
    * documents are minhash-signed scan-side (same native expression),
    * exploded to (band, bandHash) rows, and each bucket's
    * `flatMapGroupsWithState` state holds the signatures it has seen; a
    * new arrival emits a verified pair (estimated Jaccard ≥ `threshold`,
    * lower id first) against every stored member, then joins the bucket.
    * Across ANY micro-batch split of the corpus, the emitted pair set
    * (after a downstream `dropDuplicates("id_a","id_b")` — a pair can
    * surface from several shared buckets, as in the batch path before its
    * distinct) equals the batch operator's output; the parity spec feeds
    * the same corpus in two batches and checks exactly that.
    *
    * Scale shape: state is partitioned by bucket like any keyed stream —
    * the same one-shuffle candidate structure as the batch join, with
    * per-bucket membership instead of a self-join. Assumes each doc id is
    * delivered once (upstream exactly-once source). State grows with the
    * corpus: an unbounded production stream should bound it (state TTL /
    * periodic snapshot-and-reset against the batch operator) — dedup
    * against an ever-growing history is a retention POLICY decision, so
    * the operator does not pick one silently.
    */
  def streamingNearDupPairs(
      docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int, shingle: Int, bands: Int, rowsPerBand: Int,
      threshold: Double): Dataset[NearDupPair] = {
    import docs.sparkSession.implicits._
    val sigs = graft.operators.Dedup.minhashSig(docs, textCol, numHashes, shingle)
      .select(col(idCol), col("minhash"))
    val exploded = graft.operators.Dedup
      .bandExplode(sigs, idCol, bands, rowsPerBand, Seq("minhash"))
      .select(col("band"), col("band_hash"), col(idCol).as("id"), col("minhash"))
      .as[(Int, Long, Long, Seq[Long])]
    exploded
      .groupByKey { case (band, hash, _, _) => (band, hash) }
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: (Int, Long), rows: Iterator[(Int, Long, Long, Seq[Long])],
         state: GroupState[BucketState]) =>
          var members = state.getOption.map(_.members).getOrElse(Seq.empty)
          val out = Seq.newBuilder[NearDupPair]
          rows.foreach { case (_, _, id, sig) =>
            members.foreach { case (seenId, seenSig) =>
              val agree = seenSig.iterator.zip(sig.iterator).count { case (a, b) => a == b }
              val jac = BigDecimal(agree.toDouble / numHashes)
                .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
              if (jac >= threshold && seenId != id)
                out += NearDupPair(math.min(seenId, id), math.max(seenId, id), jac)
            }
            members = members :+ (id -> sig)
          }
          state.update(BucketState(members))
          out.result().iterator
      }
  }
}
