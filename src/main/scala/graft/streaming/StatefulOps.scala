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
  /** Per-bucket LSH state with event times: (doc id, signature, epoch ms). */
  final case class TimedBucketState(members: Seq[(Long, Seq[Long], Long)])

  /** State-retention policy for [[streamingNearDupPairs]]. */
  sealed trait Retention
  /** Unbounded: every member ever seen stays in its bucket — exact batch
    * parity over the whole stream, state grows with the corpus. For finite
    * replays and tests; an unbounded production stream should use
    * [[EventWindow]].
    */
  case object KeepAll extends Retention
  /** Bounded: documents carry an event-time TIMESTAMP column `tsCol`
    * (watermarked by the operator with `watermarkDelay`); a pair is emitted
    * only between docs whose event times differ by at most `windowMs`, and a
    * bucket retains a member until the WATERMARK passes
    * `member ts + windowMs` — the exact moment Spark guarantees no
    * still-admissible arrival can pair with it (anything older than the
    * watermark is dropped as late before reaching the operator). So every
    * admitted arrival, in order or not, pairs with precisely the members it
    * is entitled to; only late-dropped rows lose pairs, and the watermark
    * delay bounds that loss exactly as it bounds lateness anywhere else.
    * Idle buckets are dropped wholesale once the watermark passes their
    * newest member's window (event-time timeout), so total state is
    * O(docs per window + watermark slack) per bucket — not O(corpus).
    */
  final case class EventWindow(
      tsCol: String, windowMs: Long, watermarkDelay: String = "0 seconds") extends Retention

  private def roundedJaccard(a: Seq[Long], b: Seq[Long], numHashes: Int): Double = {
    val agree = a.iterator.zip(b.iterator).count { case (x, y) => x == y }
    BigDecimal(agree.toDouble / numHashes)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

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
    * delivered once (upstream exactly-once source). Retention is a POLICY
    * decision the caller makes explicitly: [[KeepAll]] (default) matches
    * the batch operator over the whole stream but grows state with the
    * corpus; [[EventWindow]] bounds state to a sliding event-time window
    * and matches the batch operator restricted to pairs within the window.
    */
  def streamingNearDupPairs(
      docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int, shingle: Int, bands: Int, rowsPerBand: Int,
      threshold: Double, retention: Retention = KeepAll): Dataset[NearDupPair] =
    retention match {
      case KeepAll =>
        keepAllPairs(docs, idCol, textCol, numHashes, shingle, bands, rowsPerBand, threshold)
      case w: EventWindow =>
        windowedPairs(docs, idCol, textCol, numHashes, shingle, bands, rowsPerBand, threshold, w)
    }

  private def keepAllPairs(
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
              val jac = roundedJaccard(seenSig, sig, numHashes)
              if (jac >= threshold && seenId != id)
                out += NearDupPair(math.min(seenId, id), math.max(seenId, id), jac)
            }
            members = members :+ (id -> sig)
          }
          state.update(BucketState(members))
          out.result().iterator
      }
  }

  /** [[EventWindow]] path: same bucket structure, but membership and pairing
    * are bounded by the event-time window. Pruning keys off the CURRENT
    * WATERMARK, not the bucket's max event time: the bucket max advances on
    * any new arrival, but Spark still admits rows up to the watermark slack
    * behind it, and such an in-slack out-of-order arrival is entitled to
    * pair with members up to `windowMs` before itself. A member is therefore
    * retained until `watermark > member ts + windowMs`, when no admissible
    * future arrival can reach it. The event-time timeout removes a bucket's
    * state entirely once the watermark passes `newest + windowMs` — by which
    * point every member is individually prunable — so a bucket that stops
    * receiving data costs nothing.
    */
  private def windowedPairs(
      docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int, shingle: Int, bands: Int, rowsPerBand: Int,
      threshold: Double, w: EventWindow): Dataset[NearDupPair] = {
    import docs.sparkSession.implicits._
    val sigs = graft.operators.Dedup
      .minhashSig(docs.withWatermark(w.tsCol, w.watermarkDelay), textCol, numHashes, shingle)
      .select(col(idCol), col("minhash"), col(w.tsCol))
    val exploded = graft.operators.Dedup
      .bandExplode(sigs, idCol, bands, rowsPerBand, Seq("minhash", w.tsCol))
      .select(col("band"), col("band_hash"), col(idCol).as("id"), col("minhash"), col(w.tsCol))
      .as[(Int, Long, Long, Seq[Long], java.sql.Timestamp)]
    exploded
      .groupByKey { case (band, hash, _, _, _) => (band, hash) }
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: (Int, Long), rows: Iterator[(Int, Long, Long, Seq[Long], java.sql.Timestamp)],
         state: GroupState[TimedBucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var members = state.getOption.map(_.members).getOrElse(Seq.empty)
            val out = Seq.newBuilder[NearDupPair]
            rows.foreach { case (_, _, id, sig, ts) =>
              val t = ts.getTime
              members.foreach { case (seenId, seenSig, seenTs) =>
                if (math.abs(t - seenTs) <= w.windowMs && seenId != id) {
                  val jac = roundedJaccard(seenSig, sig, numHashes)
                  if (jac >= threshold)
                    out += NearDupPair(math.min(seenId, id), math.max(seenId, id), jac)
                }
              }
              members = members :+ ((id, sig, t))
            }
            // prune on the watermark: a member at ts can still pair with an
            // admitted arrival until the watermark passes ts + windowMs.
            // Bucket-max pruning here would silently lose pairs for in-slack
            // out-of-order arrivals. The current arrival always survives
            // (its event time is above the watermark or it was late-dropped
            // upstream), so members is never emptied by this filter.
            members = members.filter(_._3 >= state.getCurrentWatermarkMs() - w.windowMs)
            val newest = members.iterator.map(_._3).max
            state.update(TimedBucketState(members))
            // strictly after the current watermark or Spark rejects it; fires
            // once no in-slack arrival can still pair with this bucket
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs() + 1, newest + w.windowMs + 1))
            out.result().iterator
          }
      }
  }

  final case class DistinctEstimate(key: String, n_rows: Long, n_sketch: Long, est: Double)

  /** Streaming running distinct-count per key: the state IS a
    * [[graft.operators.KmvSketchAgg]] buffer (≤ k longs per key, however
    * many rows stream through), updated with the Aggregator's own
    * reduce — the literal hierarchical-merge story the batch sketch
    * promises, realized as a stream. Emits one updated estimate per key
    * per micro-batch; `n_rows` (rows absorbed so far) is monotone, so a
    * reader of the update stream picks each key's latest row by it.
    * Inputs are (key, stable hash) pairs — hash at the scan with
    * [[graft.functions.HashFunctions.stableHash64]], exactly like the
    * batch q73 path, so stream and batch estimates are identical on the
    * same data.
    */
  def runningDistinct(
      hashed: Dataset[(String, Long)], k: Int): Dataset[DistinctEstimate] = {
    import hashed.sparkSession.implicits._
    val sketcher = new graft.operators.KmvSketchAgg(k)
    hashed
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[(String, Long)],
         state: GroupState[(Long, Array[Long])]) =>
          var (n, sk) = state.getOption.getOrElse((0L, sketcher.zero))
          it.foreach { case (_, h) => n += 1; sk = sketcher.reduce(sk, h) }
          state.update((n, sk))
          DistinctEstimate(key, n, sk.length.toLong,
            graft.operators.KmvSketch.estimate(sk.toSeq, k))
      }
  }

  final case class DigestState(digest: String, n_urls: Long, canonical_url: String)

  /** Streaming twin #18 — q280's payload-digest dedup at arrival
    * granularity (the WARC revisit-record ledger a crawler keeps): per
    * digest, state is (arrival count, min URL), both commutative-monoid
    * folds, so after ANY micro-batch split the latest snapshot per
    * digest equals the batch `groupBy(digest).agg(count, min(url))` of
    * everything seen so far. State is O(1) per DISTINCT digest —
    * content-identity dedup is exactly the operator whose state cannot
    * shrink below the distinct-payload census; a recrawl-window
    * retention (evict digests not seen for N days) would ride
    * EventTimeTimeout like twin #17's window.
    */
  def runningDigestDedup(rows: Dataset[(String, String)]): Dataset[DigestState] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (digest: String, it: Iterator[(String, String)],
         state: GroupState[(Long, String)]) =>
          var (n, canon) = state.getOption.getOrElse((0L, null: String))
          it.foreach { case (_, url) =>
            n += 1
            if (canon == null || url < canon) canon = url
          }
          state.update((n, canon))
          DigestState(digest, n, canon)
      }
  }

  final case class CaptureState(urlkey: String, n_captures: Long,
    n_versions: Long, latest_ts: String, latest_status: Int,
    latest_digest: String)

  /** Streaming twin #19 — q285's latest-capture election at arrival
    * granularity (the live CDX a crawler maintains while WARCs are still
    * being written): per urlkey, state is (capture count, distinct-digest
    * set, argmax-by-timestamp capture). The argmax is a commutative
    * idempotent monoid — timestamp14 strings compare lexicographically-
    * chronologically, ties break by (status, digest) so even tie splits
    * are deterministic — the digest set is idempotent union, the count a
    * monoid fold; so after ANY micro-batch split the latest snapshot per
    * urlkey equals q285's batch `groupBy(urlkey).agg(count, n_distinct,
    * max_by(…, ts))` over everything seen so far. State is O(versions)
    * per urlkey (the digest set — the same floor content-identity dedup
    * has; count and argmax are O(1)).
    */
  def runningLatestCapture(
      rows: Dataset[(String, String, Int, String)]): Dataset[CaptureState] = {
    import rows.sparkSession.implicits._
    val ord = Ordering.Tuple3[String, Int, String]
    rows.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[(String, String, Int, String)],
         state: GroupState[(Long, Set[String], (String, Int, String))]) =>
          var (n, digs, best) = state.getOption.getOrElse(
            (0L, Set.empty[String], (null: String, 0, null: String)))
          it.foreach { case (_, ts, st, dg) =>
            n += 1
            digs += dg
            val cand = (ts, st, dg)
            if (best._1 == null || ord.compare(cand, best) > 0) best = cand
          }
          state.update((n, digs, best))
          CaptureState(key, n, digs.size.toLong, best._1, best._2, best._3)
      }
  }

  final case class CmsSnapshot(key: String, n_items: Long, sketch: Seq[Long])

  /** Streaming twin of the Count-Min frequency sketch (q91): per-key state
    * IS the depth×width counter array, updated by the SAME
    * [[graft.operators.CountMinAgg]] reduce the batch aggregator runs, so
    * after any micro-batch split the running sketch is bit-identical to
    * the batch sketch of everything seen so far (CMS is a commutative
    * monoid — order and batching cannot change the counters). State is
    * O(depth·width) per key — bounded regardless of stream length, the
    * property that makes CMS the streaming heavy-hitter structure.
    *
    * Inputs are (key, buckets) pairs — bucket at the scan with
    * [[graft.operators.CountMinAgg.bucketsCol]], exactly like the batch
    * q91 path.
    */
  def runningFrequencySketch(
      bucketed: Dataset[(String, Seq[Int])],
      depth: Int, width: Int): Dataset[CmsSnapshot] = {
    import bucketed.sparkSession.implicits._
    val agg = new graft.operators.CountMinAgg(depth, width)
    bucketed
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[(String, Seq[Int])],
         state: GroupState[(Long, Array[Long])]) =>
          var (n, sk) = state.getOption.getOrElse((0L, agg.zero))
          it.foreach { case (_, bs) => n += 1; sk = agg.reduce(sk, bs) }
          state.update((n, sk))
          CmsSnapshot(key, n, sk.toSeq)
      }
  }

  final case class HllSnapshot(key: String, n_items: Long, registers: Seq[Int])

  /** Streaming twin of the HyperLogLog distinct sketch (q102): per-key
    * state IS the 2^p register array, updated by the SAME
    * [[graft.operators.HllAgg]] reduce the batch aggregator runs — HLL
    * registers are an idempotent commutative monoid (element-wise max), so
    * after any micro-batch split, any arrival order, even REPLAYED rows,
    * the running registers are bit-identical to the batch sketch of
    * everything seen so far (a strictly stronger merge contract than CMS,
    * whose counters double on replay). State is O(2^p) ints per key —
    * bounded regardless of stream length.
    *
    * Inputs are (key, bucket, rank) triples — derive at the scan with
    * [[graft.operators.HllSketch.bucketCol]]/`rankExpr`, exactly like the
    * batch q102 path.
    */
  def runningDistinctRegisters(
      bucketed: Dataset[(String, Int, Int)], p: Int): Dataset[HllSnapshot] = {
    import bucketed.sparkSession.implicits._
    val agg = new graft.operators.HllAgg(p)
    bucketed
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[(String, Int, Int)],
         state: GroupState[(Long, Array[Int])]) =>
          var (n, regs) = state.getOption.getOrElse((0L, agg.zero))
          it.foreach { case (_, b, r) => n += 1; regs = agg.reduce(regs, (b, r)) }
          state.update((n, regs))
          HllSnapshot(key, n, regs.toSeq)
      }
  }

  final case class KmvSnapshot(key: String, n_items: Long, sketch: Seq[Long])

  /** Streaming twin of [[graft.operators.KmvSketchAgg]] (q73's distinct
    * estimator): per-key state is the sorted ≤ k-minima buffer, updated
    * by the SAME reduce the batch aggregator runs. The buffer is a
    * commutative idempotent monoid under merge-and-trim (set semantics —
    * a redelivered hash is dropped by the binary-search dedup), so after
    * any micro-batch split, arrival order, and at-least-once replay the
    * snapshot equals the batch sketch of everything seen — and therefore
    * so does the DETERMINISTIC estimate read off it. State is O(k) longs
    * per group regardless of stream length.
    */
  def runningKmv(
      hashes: Dataset[(String, Long)], k: Int): Dataset[KmvSnapshot] = {
    import hashes.sparkSession.implicits._
    val agg = new graft.operators.KmvSketchAgg(k)
    hashes
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[(String, Long)],
         state: GroupState[(Long, Array[Long])]) =>
          var (n, buf) = state.getOption.getOrElse((0L, agg.zero))
          it.foreach { case (_, h) => n += 1; buf = agg.reduce(buf, h) }
          state.update((n, buf))
          KmvSnapshot(key, n, buf.toSeq)
      }
  }

  final case class BloomWordSnapshot(word_idx: Int, word: Long)

  /** Streaming twin of [[graft.operators.BloomAgg]] (q169's runtime
    * filter): the Bloom filter IS the state, sharded one 64-bit word per
    * key — each arriving key hash fans out to its `numHashes` (word,
    * bit-mask) pairs ([[graft.operators.BloomAgg.reduce]]'s exact
    * arithmetic) and each word's state ORs its masks. State is bounded by
    * `numWords` longs TOTAL regardless of stream length, the OR is a
    * commutative idempotent monoid, so after any micro-batch split, any
    * arrival order, and any at-least-once redelivery the materialized
    * word table equals the batch aggregator's filter — a nightly-refresh
    * runtime filter maintained incrementally instead of rebuilt from a
    * full dim rescan.
    */
  def runningBloomWords(
      hashes: Dataset[Long], numWords: Int, numHashes: Int): Dataset[BloomWordSnapshot] = {
    require(numWords > 0 && (numWords & (numWords - 1)) == 0,
      s"numWords must be a power of two, got $numWords")
    import hashes.sparkSession.implicits._
    val bits = numWords.toLong * 64L
    val mask = bits - 1L
    val shift = java.lang.Long.numberOfTrailingZeros(bits)
    hashes
      .flatMap { h =>
        val h1 = h & mask
        val h2 = ((h >>> shift) & mask) | 1L
        (0 until numHashes).map { i =>
          val pos = (h1 + i * h2) & mask
          ((pos >>> 6).toInt, 1L << (pos & 63L))
        }
      }
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (w: Int, it: Iterator[(Int, Long)], state: GroupState[Long]) =>
          var word = state.getOption.getOrElse(0L)
          it.foreach(word |= _._2)
          state.update(word)
          BloomWordSnapshot(w, word)
      }
  }

  final case class TopKSnapshot(key: String, n_items: Long, top: Seq[(Long, Long)])

  /** Streaming twin of the bounded-heap top-k (q103): per-group state IS
    * [[graft.operators.TopKAgg]]'s sorted ≤ k-pair buffer, updated by the
    * SAME reduce the batch aggregator runs. The buffer is a commutative
    * monoid under the k-way merge, so after any micro-batch split and any
    * arrival order the running snapshot equals the batch top-k of
    * everything seen so far. State is O(k) per group — bounded regardless
    * of stream length (the streaming form of "the shuffle never carries
    * the corpus").
    */
  def runningTopK(
      pairs: Dataset[(String, Long, Long)], k: Int): Dataset[TopKSnapshot] = {
    import pairs.sparkSession.implicits._
    val agg = new graft.operators.TopKAgg(k)
    pairs
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[(String, Long, Long)],
         state: GroupState[(Long, List[(Long, Long)])]) =>
          var (n, buf) = state.getOption.getOrElse((0L, agg.zero))
          it.foreach { case (_, v, id) => n += 1; buf = agg.reduce(buf, (v, id)) }
          state.update((n, buf))
          TopKSnapshot(key, n, buf)
      }
  }

  final case class Scd2Version(
      version: Long, v_u: Long, valid_from_us: Long, valid_to_us: Long,
      is_current: Int)
  final case class Scd2Snapshot(
      user_id: Long, n_events: Long, versions: Seq[Scd2Version])

  /** Streaming SCD2 maintenance — the twin of q94's batch build: a CDC
    * stream of (user_id, ts_us, event_id, v_u) change events maintains each
    * key's [valid_from, valid_to) version chain incrementally. State per
    * key is the (ts_us, event_id, v_u) change set — which is exactly the
    * key's SCD2 table, so the footprint is O(versions per key), inherent to
    * the operator, not a buffering artifact. Each invocation merge-inserts
    * the sorted arrivals into the sorted state (O(B + A log A), the
    * [[streamingSessionize]] move) and re-derives the snapshot, so after
    * any micro-batch split and ANY arrival order — late back-dated changes
    * included, which RENUMBER later versions exactly as a batch rebuild
    * would — the snapshot equals q94's batch window over everything seen.
    * Replay-idempotent: a redelivered (ts_us, event_id) pair is dropped on
    * merge (the suite's at-least-once contract, as the HLL registers).
    *
    * Consumers keep each key's latest snapshot (update-mode semantics); a
    * deployment that needs bounded per-invocation output emits only keys
    * whose chain changed — here every invoked key changed, since only
    * arriving keys are invoked under NoTimeout.
    */
  def runningScd2(
      events: Dataset[(Long, Long, Long, Long)]): Dataset[Scd2Snapshot] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (key: Long, it: Iterator[(Long, Long, Long, Long)],
         state: GroupState[Seq[(Long, Long, Long)]]) =>
          val prev = state.getOption.getOrElse(Seq.empty).toVector
          val seen = prev.iterator.map(e => (e._1, e._2)).toSet
          val incoming = it.map(r => (r._2, r._3, r._4)).toVector
            .filter(e => !seen.contains((e._1, e._2)))
            .distinctBy(e => (e._1, e._2)) // replay inside one batch
            .sortBy(e => (e._1, e._2))
          // merge two (ts, id)-sorted runs
          val buf = {
            val out = Vector.newBuilder[(Long, Long, Long)]
            var (i, j) = (0, 0)
            while (i < prev.length || j < incoming.length) {
              val takeA = j >= incoming.length ||
                (i < prev.length && (prev(i)._1 < incoming(j)._1 ||
                  (prev(i)._1 == incoming(j)._1 && prev(i)._2 <= incoming(j)._2)))
              if (takeA) { out += prev(i); i += 1 } else { out += incoming(j); j += 1 }
            }
            out.result()
          }
          state.update(buf)
          val versions = buf.zipWithIndex.map { case ((ts, _, v), i) =>
            Scd2Version(i + 1L, v, ts,
              if (i + 1 < buf.length) buf(i + 1)._1 else Long.MaxValue,
              if (i + 1 == buf.length) 1 else 0)
          }
          Scd2Snapshot(key, buf.length.toLong, versions)
      }
  }

  final case class FunnelSnapshot(key: Long, n_events: Long, ts: Seq[Long])

  /** Streaming twin of [[graft.operators.Funnel.firstCompletion]]: per
    * entity the state buffers each funnel step's event timestamps (sorted),
    * and every snapshot recomputes the strict first-completion chain from
    * the buffers — so after any micro-batch split and ANY arrival order
    * (late events included) the snapshot equals the batch funnel over
    * everything seen so far. `ts(k) == -1` marks "stage k+1 not reached".
    *
    * Input rows are (entity, stepIndex, ts) — the caller maps event types
    * to step indices and filters to the funnel's steps, so state size is
    * O(entity's funnel-step events), the same buffered-reorder contract as
    * [[sessionizeUpdate]] (an unbuffered funnel state machine CANNOT be
    * correct under out-of-order arrival: a late-arriving earlier signup
    * re-chains every later stage). `pruneCompleted` trades that guarantee
    * for bounded life: once an entity's chain completes, its state is
    * dropped and the completed snapshot is final — late improvements to a
    * COMPLETED funnel are ignored, and later events for that entity
    * accumulate into a FRESH funnel (consumers keep the first completed
    * snapshot). The production default for monotone-enough streams; leave
    * false for exact parity.
    */
  def runningFunnel(
      events: Dataset[(Long, Int, Long)], numSteps: Int,
      pruneCompleted: Boolean = false): Dataset[FunnelSnapshot] = {
    import events.sparkSession.implicits._
    require(numSteps > 0, "numSteps must be positive")
    events.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (key: Long, it: Iterator[(Long, Int, Long)],
         state: GroupState[Seq[Seq[Long]]]) =>
          var buf = state.getOption
            .getOrElse(Seq.fill(numSteps)(Seq.empty[Long])).map(_.toVector).toVector
          it.foreach { case (_, step, ts) =>
            if (step >= 0 && step < numSteps)
              buf = buf.updated(step, (buf(step) :+ ts).sorted)
          }
          // strict first-completion chain over the buffered timestamps
          val out = Array.fill[Long](numSteps)(-1L)
          var prev = Long.MinValue
          var k = 0
          while (k < numSteps &&
              { val c = if (k == 0) buf(0).headOption else buf(k).find(_ > prev)
                c.foreach { t => out(k) = t; prev = t }; c.isDefined })
            k += 1
          if (pruneCompleted && out(numSteps - 1) != -1L) state.remove()
          else state.update(buf.map(_.toSeq))
          FunnelSnapshot(key, buf.map(_.size.toLong).sum, out.toSeq)
      }
  }

  /** One buffered event: (epoch ms, tie-break id, value). */
  final case class SessionizeState(nextSeq: Long, buffer: Seq[(Long, Long, Double)])
  final case class SessionSummary(
      user_id: Long, session_seq: Long, n_events: Long,
      start_ms: Long, dur_ms: Long, total_value: Double)

  /** Streaming twin of [[graft.operators.Sessionize.sessionSummary]]:
    * events (`user_id`, `event_id`, `ts` TIMESTAMP, `value`) are keyed by
    * user; each user's state buffers the events of still-open sessions and
    * a session is emitted exactly when the WATERMARK passes its last event
    * time + `gapMs` — the moment Spark guarantees no admissible arrival
    * can still extend it (anything older is dropped as late upstream). An
    * event-time timeout fires at the earliest unclosed session's close
    * time, so a user who goes quiet still gets their final session emitted
    * and their state removed — state is O(open-session events) per user,
    * not O(stream).
    *
    * Session numbering matches the batch operator: sessions of one user
    * close in event-time order (session k's last + gap < session k+1's
    * first by construction of the gap split), so the running `nextSeq`
    * counter assigns the same 1-based sequence the batch running-sum does.
    * In-slack out-of-order arrivals are handled by sorting the buffer on
    * every invocation; only the close decision consults the watermark.
    * Emitted totals sum values in (ts, event_id) order — deterministic,
    * unlike a batch fold over arbitrary partition order, so exact-binary
    * test values compare bit-for-bit.
    */
  def streamingSessionize(
      events: DataFrame, gapMs: Long,
      watermarkDelay: String = "0 seconds"): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._

    // split a (ts, id, value) buffer sorted on (ts, id) at gaps > gapMs
    def sessionsOf(buf: Seq[(Long, Long, Double)]): Seq[Seq[(Long, Long, Double)]] =
      buf.foldLeft(Vector.empty[Vector[(Long, Long, Double)]]) { (acc, e) =>
        if (acc.nonEmpty && e._1 - acc.last.last._1 <= gapMs)
          acc.init :+ (acc.last :+ e)
        else acc :+ Vector(e)
      }

    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .as[(Long, Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[(Long, Long, java.sql.Timestamp, Double)],
         state: GroupState[SessionizeState]) =>
          val prev = state.getOption.getOrElse(SessionizeState(1L, Seq.empty))
          // the stored buffer is already (ts, id)-sorted — sort only the
          // arrivals and merge the two runs, O(B + A log A) instead of
          // re-sorting the whole buffer every micro-batch on a hot key
          val incoming = rows.map(r => (r._3.getTime, r._2, r._4)).toVector
            .sortBy(e => (e._1, e._2))
          val buf = {
            val out = Vector.newBuilder[(Long, Long, Double)]
            var (i, j) = (0, 0)
            val (a, b) = (prev.buffer, incoming)
            while (i < a.length || j < b.length) {
              val takeA = j >= b.length ||
                (i < a.length && (a(i)._1 < b(j)._1 ||
                  (a(i)._1 == b(j)._1 && a(i)._2 <= b(j)._2)))
              if (takeA) { out += a(i); i += 1 } else { out += b(j); j += 1 }
            }
            out.result()
          }
          val wm = state.getCurrentWatermarkMs()
          // a session is closed when the watermark is strictly past
          // last + gap: any admitted future arrival has ts > wm > last + gap
          // and would start a new session anyway
          val (closed, open) = sessionsOf(buf).partition(s => wm > s.last._1 + gapMs)
          val out = closed.zipWithIndex.map { case (s, i) =>
            val total = BigDecimal(s.iterator.map(_._3).sum)
              .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
            SessionSummary(uid, prev.nextSeq + i, s.size.toLong,
              s.head._1, s.last._1 - s.head._1, total)
          }
          // state keeps the seq counter even with no open session: removing
          // it would restart a returning user at session 1. The residual
          // cost is one counter row per user ever seen (the same footprint
          // as runningUserTotals) — bounded by users, not by the stream. No
          // timeout is set when nothing is open (nothing left to close).
          state.update(SessionizeState(prev.nextSeq + closed.size, open.flatten))
          if (open.nonEmpty)
            // wake at the earliest unclosed session's close time (strictly
            // after the current watermark or Spark rejects the timestamp)
            state.setTimeoutTimestamp(math.max(wm + 1, open.head.last._1 + gapMs + 1))
          out.iterator
      }
  }

  final case class TransitionPair(cur: String, nxt: String, n_pair: Long)
  final case class TransitionSnapshot(
      user_id: Long, n_events: Long, pairs: Seq[TransitionPair])

  /** Streaming twin of q155's transition matrix: a stream of (user_id,
    * ts_us, event_id, event_type) maintains each user's time-ordered event
    * chain; the snapshot emits the user's adjacent-pair counts, and the
    * global matrix is a plain aggregation over latest snapshots. State per
    * key is the user's event set sorted by (ts_us, event_id) — the same
    * footprint as [[runningScd2]] and for the same reason: a LATE event
    * splices into the middle of the chain and rewrites the two transitions
    * around it, so order-correctness under arbitrary arrival requires the
    * chain (a last-event-only state would silently corrupt the matrix on
    * any out-of-order delivery; bound the buffer with a watermark retention
    * window when the stream guarantees bounded lateness). Merge-insert of
    * sorted arrivals into the sorted state is O(B + A log A); redelivered
    * (ts_us, event_id) rows drop on merge — the suite's at-least-once
    * contract. Pair parity with the batch lead-window under 100 random
    * splits/replays is spec-pinned.
    */
  final case class PostingEntry(doc_id: Long, pos: Long)
  final case class PostingsSnapshot(
      term: String, n_docs: Long, n_occ: Long, postings: Seq[PostingEntry])

  /** Streaming twin of [[graft.query.InvertedIndex.postings]] (q113's
    * batch-only index family): documents arrive as (doc_id, text), the
    * RELATIONAL posexplode of the engine tokenizer runs stateless before
    * the keyed state (so batch and stream tokenize identically, by
    * construction), and state per TERM is its sorted posting list.
    * Each snapshot is the term's full postings — flattening the latest
    * snapshot per term reproduces the batch index exactly (100-random-
    * split/replay parity is spec-pinned, the suite's established
    * contract). Redelivered documents drop on the (doc_id, pos) set-merge
    * — at-least-once safe; there is no late-splice hazard because a
    * document's postings never depend on other documents.
    *
    * At scale: state partitions by term like any keyed stream; hot terms
    * hold the largest lists — bound them with the same df-style stopword
    * gate a batch index would apply before this operator.
    */
  def runningPostings(
      docs: Dataset[(Long, String)]): Dataset[PostingsSnapshot] = {
    import docs.sparkSession.implicits._
    val toks = docs.toDF("doc_id", "text")
      .select(col("doc_id"),
        org.apache.spark.sql.functions.posexplode(
          graft.operators.TextAnalysis.tokensCol(col("text"))))
      .select(col("col").as("term"), col("doc_id"),
        (col("pos") + org.apache.spark.sql.functions.lit(1)).as("pos"))
      .as[(String, Long, Long)]
    toks.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (term: String, it: Iterator[(String, Long, Long)],
         state: GroupState[Seq[(Long, Long)]]) =>
          val prev = state.getOption.getOrElse(Seq.empty).toVector
          val seen = prev.toSet
          val incoming = it.map(r => (r._2, r._3)).toVector
            .filter(!seen.contains(_))
            .distinct // replay inside one batch
            .sorted
          // merge-insert of sorted arrivals: O(B + A log A), the suite's
          // stateful-buffer idiom
          val buf = {
            val out = Vector.newBuilder[(Long, Long)]
            var (i, j) = (0, 0)
            while (i < prev.length || j < incoming.length) {
              val takeA = j >= incoming.length ||
                (i < prev.length && (prev(i)._1 < incoming(j)._1 ||
                  (prev(i)._1 == incoming(j)._1 && prev(i)._2 <= incoming(j)._2)))
              if (takeA) { out += prev(i); i += 1 } else { out += incoming(j); j += 1 }
            }
            out.result()
          }
          state.update(buf)
          PostingsSnapshot(term, buf.iterator.map(_._1).toSet.size.toLong,
            buf.length.toLong, buf.map(p => PostingEntry(p._1, p._2)))
      }
  }

  final case class ConcurrencySnapshot(
      bucket: Long, n_starts: Long, n_ends: Long,
      local_peak: Long, bucket_delta: Long)

  /** Streaming twin of [[graft.operators.SweepLine.peakPerBucket]]'s
    * LEVEL 1: per-bucket endpoint state (the ±1 multiset, deduped by
    * (interval id, side) so at-least-once replay is absorbed) maintained
    * under `mapGroupsWithState`, snapshotting the same peer-inclusive
    * local prefix peak and bucket delta the batch window computes. The
    * CALENDAR-sized level 2 (carry-in accumulation across buckets) stays
    * a batch-side read over the snapshot table — exactly how the batch
    * operator splits the work, and how a capacity dashboard reads the
    * store: `peak(bucket) = Σ earlier bucket_delta + local_peak`.
    * Input rows are endpoints: (bucket, ts, delta ±1, interval id).
    */
  def runningConcurrency(
      endpoints: Dataset[(Long, Long, Long, Long)]): Dataset[ConcurrencySnapshot] = {
    import endpoints.sparkSession.implicits._
    endpoints.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (bucket: Long, it: Iterator[(Long, Long, Long, Long)],
         state: GroupState[Seq[(Long, Long, Long)]]) =>
          val prev = state.getOption.getOrElse(Seq.empty).toVector
          val seen = prev.iterator.map(e => (e._3, e._2)).toSet // (id, delta)
          val incoming = it.map(r => (r._2, r._3, r._4)).toVector
            .filter(e => !seen.contains((e._3, e._2)))
            .distinctBy(e => (e._3, e._2)) // replay inside one batch
            .sortBy(e => (e._1, e._2))
          val buf = {
            val out = Vector.newBuilder[(Long, Long, Long)]
            var (i, j) = (0, 0)
            while (i < prev.length || j < incoming.length) {
              val takeA = j >= incoming.length ||
                (i < prev.length && (prev(i)._1 < incoming(j)._1 ||
                  (prev(i)._1 == incoming(j)._1 && prev(i)._2 <= incoming(j)._2)))
              if (takeA) { out += prev(i); i += 1 } else { out += incoming(j); j += 1 }
            }
            out.result()
          }
          state.update(buf)
          // peer-inclusive prefix peak over (ts, delta) groups — the exact
          // semantics of the batch RANGE-framed window
          var run = 0L
          var peak = Long.MinValue
          var idx = 0
          while (idx < buf.length) {
            val (ts, d) = (buf(idx)._1, buf(idx)._2)
            var groupSum = 0L
            while (idx < buf.length && buf(idx)._1 == ts && buf(idx)._2 == d) {
              groupSum += d; idx += 1
            }
            run += groupSum
            if (run > peak) peak = run
          }
          ConcurrencySnapshot(bucket,
            buf.count(_._2 == 1L).toLong, buf.count(_._2 == -1L).toLong,
            peak, run)
      }
  }

  def runningTransitions(
      events: Dataset[(Long, Long, Long, String)]): Dataset[TransitionSnapshot] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (key: Long, it: Iterator[(Long, Long, Long, String)],
         state: GroupState[Seq[(Long, Long, String)]]) =>
          val prev = state.getOption.getOrElse(Seq.empty).toVector
          val seen = prev.iterator.map(e => (e._1, e._2)).toSet
          val incoming = it.map(r => (r._2, r._3, r._4)).toVector
            .filter(e => !seen.contains((e._1, e._2)))
            .distinctBy(e => (e._1, e._2)) // replay inside one batch
            .sortBy(e => (e._1, e._2))
          val buf = {
            val out = Vector.newBuilder[(Long, Long, String)]
            var (i, j) = (0, 0)
            while (i < prev.length || j < incoming.length) {
              val takeA = j >= incoming.length ||
                (i < prev.length && (prev(i)._1 < incoming(j)._1 ||
                  (prev(i)._1 == incoming(j)._1 && prev(i)._2 <= incoming(j)._2)))
              if (takeA) { out += prev(i); i += 1 } else { out += incoming(j); j += 1 }
            }
            out.result()
          }
          state.update(buf)
          val pairs = buf.iterator.zip(buf.iterator.drop(1))
            .map { case (a, b) => (a._3, b._3) }.toVector
            .groupBy(identity).toVector
            .map { case ((c, n), g) => TransitionPair(c, n, g.size.toLong) }
            .sortBy(p => (p.cur, p.nxt))
          TransitionSnapshot(key, buf.length.toLong, pairs)
      }
  }

  final case class QuantilePoint(prob4: Long, rank: Long, value: Long)
  final case class GroupQuantilesSnapshot(
      g: String, n: Long, quantiles: Seq[QuantilePoint])

  /** Streaming twin of [[graft.operators.ExactQuantiles.groupedQuantiles]]:
    * per-group state is the exact VALUE histogram as sorted (value, count)
    * runs — mergeable by construction (a batch arrival is a counts-add) —
    * plus the suite's standard replay-guard id set absorbing at-least-once
    * delivery. State bound: the histogram is bounded by the value DOMAIN
    * (the same premise that makes the batch operator's shuffles
    * histogram-sized — doc-length-style bounded integer metrics), NOT by
    * the row count; the id set is row-sized, and a deployment with an
    * exactly-once upstream (transactional source / CDF) passes
    * `dedupIds = false` to drop it, leaving purely histogram-sized state.
    * Unbounded domains should pre-bucket the value (a coarseWidth div) at
    * the corresponding precision cost.
    *
    * Every snapshot recomputes the nearest-rank table with the batch
    * operator's integer convention (rank = (p4·n + 9999) div 10000; value
    * = smallest v whose cumulative count reaches the rank), so after ANY
    * batch split the latest snapshot equals the batch operator on the
    * union of arrivals (the 100-random-split parity prop).
    *
    * Input rows: (group, row_id, value).
    */
  def runningGroupedQuantiles(
      rows: Dataset[(String, Long, Long)], probs4: Seq[Long],
      dedupIds: Boolean = true): Dataset[GroupQuantilesSnapshot] = {
    import rows.sparkSession.implicits._
    val p4s = probs4.toVector
    rows.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (g: String, it: Iterator[(String, Long, Long)],
         state: GroupState[(Seq[(Long, Long)], Seq[Long])]) =>
          val (histSeq, seenSeq) = state.getOption.getOrElse((Seq.empty, Seq.empty))
          val seen = seenSeq.toSet
          val arrivals0 = it.map(r => (r._2, r._3)).toVector
          val arrivals =
            if (dedupIds)
              arrivals0.distinctBy(_._1).filter(a => !seen.contains(a._1))
            else arrivals0
          var hist = histSeq.toMap
          arrivals.foreach { case (_, v) =>
            hist = hist.updated(v, hist.getOrElse(v, 0L) + 1L)
          }
          val seenNext =
            if (dedupIds) seenSeq ++ arrivals.map(_._1) else seenSeq
          state.update((hist.toSeq, seenNext))
          val n = hist.valuesIterator.sum
          val sorted = hist.toVector.sortBy(_._1)
          val qs =
            if (sorted.isEmpty) Vector.empty[QuantilePoint]
            else p4s.map { p4 =>
              val rank = (p4 * n + 9999L) / 10000L
              var cum = 0L
              val v = sorted.find { case (_, c) => cum += c; cum >= rank }
                .map(_._1).getOrElse(sorted.last._1)
              QuantilePoint(p4, rank, v)
            }
          GroupQuantilesSnapshot(g, n, qs)
      }
  }
  final case class TypeLag(
      event_type: String, n_events: Long, n_late: Long,
      sum_late_us: Long, max_late_us: Long)
  final case class WatermarkLagSnapshot(
      user_id: Long, n_events: Long, types: Seq[TypeLag])

  /** Streaming twin of [[graft.operators.EvalMetrics.watermarkLag]]: the
    * per-user lateness census maintained live. Batch semantics define an
    * event's lateness against the max timestamp of all SMALLER-EVENT-ID
    * events of that user — so an out-of-order arrival with a low event id
    * retroactively changes the lateness of higher-id events already seen.
    * The state is therefore the user's (event_id, tsu, type) buffer
    * (merge-inserted sorted by event id, deduped by id so at-least-once
    * replay is absorbed — the [[runningPostings]] idiom), and each
    * snapshot re-derives the per-type lateness aggregates with one
    * running-max pass. The EVENT-TYPE level (summing user snapshots into
    * the q234 report) stays a batch-side read over the snapshot store,
    * exactly how [[runningConcurrency]] splits its two levels.
    *
    * STATE BOUND (round 11): `evictBelow` maps the user's current maximum
    * seen event id to an ID LOW-WATERMARK — every buffered event with id
    * ≤ that floor is folded into a compact per-type running aggregate
    * (count / late count / late sum / late max, plus the running
    * timestamp max the next fold resumes from) and leaves the buffer.
    * The fold is EXACT because the lateness census is a prefix-
    * decomposable linear scan in id order: aggregates over the folded
    * prefix plus one pass over the open suffix equal the full-buffer
    * pass to the bit. The CONTRACT is the caller's watermark guarantee —
    * no FRESH event with id ≤ the floor arrives later (the same promise
    * an ingest low-watermark makes); replays of already-folded ids are
    * absorbed exactly (dropped — they were counted when folded), and
    * state is O(open window + distinct types) instead of O(history).
    * The default (`_ => Long.MinValue`) never evicts — the original
    * full-buffer behavior, byte-identical snapshots.
    */
  def runningWatermarkLag(
      events: Dataset[(Long, Long, Long, String)],
      evictBelow: Long => Long = _ => Long.MinValue): Dataset[WatermarkLagSnapshot] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[(Long, Long, Long, String)],
         state: GroupState[(Seq[(Long, Long, String)], Long, Long,
           Seq[(String, Long, Long, Long, Long)])]) =>
          val (prevSeq, evMax0, evUpTo0, foldedSeq) = state.getOption
            .getOrElse((Seq.empty[(Long, Long, String)], Long.MinValue,
              Long.MinValue, Seq.empty[(String, Long, Long, Long, Long)]))
          val prev = prevSeq.toVector
          val seen = prev.iterator.map(_._1).toSet
          val incoming = it.map(r => (r._2, r._3, r._4)).toVector
            .distinctBy(_._1)             // replay inside one batch
            // replay across batches: ids still buffered dedup on `seen`;
            // ids at or below the eviction floor were counted when folded
            .filter(e => e._1 > evUpTo0 && !seen.contains(e._1))
            .sortBy(_._1)
          val merged = {
            val out = Vector.newBuilder[(Long, Long, String)]
            var (i, j) = (0, 0)
            while (i < prev.length || j < incoming.length) {
              val takeA = j >= incoming.length ||
                (i < prev.length && prev(i)._1 <= incoming(j)._1)
              if (takeA) { out += prev(i); i += 1 }
              else { out += incoming(j); j += 1 }
            }
            out.result()
          }
          // fold the closed prefix (id ≤ floor) into the compact aggregate
          val floor = if (merged.nonEmpty) evictBelow(merged.last._1) else evUpTo0
          val (closed, open) = merged.span(_._1 <= floor)
          var evMax = evMax0
          val folded = scala.collection.mutable.LinkedHashMap
            .empty[String, (Long, Long, Long, Long)]
          foldedSeq.foreach { case (tp, n, nl, sl, ml) =>
            folded(tp) = (n, nl, sl, ml)
          }
          closed.foreach { case (_, tsu, tp) =>
            val late = if (evMax > tsu) evMax - tsu else 0L
            val (n, nl, sl, ml) = folded.getOrElse(tp, (0L, 0L, 0L, 0L))
            folded(tp) = (n + 1, nl + (if (late > 0) 1L else 0L),
              sl + late, math.max(ml, late))
            if (tsu > evMax) evMax = tsu
          }
          state.update((open, evMax, math.max(evUpTo0, floor),
            folded.iterator.map { case (tp, (n, nl, sl, ml)) =>
              (tp, n, nl, sl, ml)
            }.toSeq))
          // snapshot = folded prefix + one pass over the open window
          var mx = evMax
          val agg = scala.collection.mutable.LinkedHashMap
            .empty[String, (Long, Long, Long, Long)]
          folded.foreach { case (tp, v) => agg(tp) = v }
          open.foreach { case (_, tsu, tp) =>
            val late = if (mx > tsu) mx - tsu else 0L
            val (n, nl, sl, ml) = agg.getOrElse(tp, (0L, 0L, 0L, 0L))
            agg(tp) = (n + 1, nl + (if (late > 0) 1L else 0L),
              sl + late, math.max(ml, late))
            if (tsu > mx) mx = tsu
          }
          WatermarkLagSnapshot(user,
            folded.valuesIterator.map(_._1).sum + open.length.toLong,
            agg.iterator.map { case (tp, (n, nl, sl, ml)) =>
              TypeLag(tp, n, nl, sl, ml)
            }.toSeq)
      }
  }

  final case class CdcStateSnapshot(
      key: Long, op: String, value: Long, n_ops: Long)

  /** Streaming twin of [[graft.operators.Cdc.latestWins]]: per-key
    * latest-wins state under `mapGroupsWithState` — the live materialized
    * view of an upsert/delete stream. State per key is the winning
    * (seq, tiebreak, op, val) plus the SET of applied (seq, tiebreak)
    * ids, so at-least-once replay is absorbed exactly (the
    * [[runningPostings]] precedent: parity with the batch operator's
    * n_ops needs op identity, and the winner election alone is already
    * idempotent — max is max). State grows with ops-per-key id pairs;
    * a production deployment dedups upstream or ages the id set once the
    * source guarantees exactly-once, at which point state is O(1).
    * Snapshots mirror the batch output: (key, op, value, n_ops) with
    * tombstones retained.
    */
  def runningCdcState(
      ops: Dataset[(Long, Long, Long, String, Long)]): Dataset[CdcStateSnapshot] = {
    import ops.sparkSession.implicits._
    ops.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (key: Long, it: Iterator[(Long, Long, Long, String, Long)],
         state: GroupState[(Long, Long, String, Long, Seq[(Long, Long)])]) =>
          val (pSeq, pTb, pOp, pVal, seenSeq) =
            state.getOption.getOrElse((Long.MinValue, Long.MinValue, "", 0L, Seq.empty))
          val seen = seenSeq.toSet
          val fresh = it.map(r => (r._2, r._3, r._4, r._5)).toVector
            .distinctBy(e => (e._1, e._2))           // replay inside one batch
            .filter(e => !seen.contains((e._1, e._2))) // replay across batches
          var (bSeq, bTb, bOp, bVal) = (pSeq, pTb, pOp, pVal)
          fresh.foreach { case (sq, tb, op, v) =>
            if (sq > bSeq || (sq == bSeq && tb > bTb)) {
              bSeq = sq; bTb = tb; bOp = op; bVal = v
            }
          }
          val seenAll = (seenSeq ++ fresh.map(e => (e._1, e._2))).sorted
          state.update((bSeq, bTb, bOp, bVal, seenAll))
          CdcStateSnapshot(key, bOp, bVal, seenAll.length.toLong)
      }
  }

  final case class WeightedSampleSnapshot(stratum: String, n_seen: Long,
      winners: Seq[(Long, Long, Long)]) // (rank, id, weight)

  /** Streaming twin of q219's sequential-Poisson weighted sample
    * ([[graft.operators.WeightedSample]]): priorities are the SAME
    * deterministic u48(salt:id)/weight doubles the batch ranker uses —
    * no RNG state — so the per-stratum top-k survivors of any prefix of
    * ANY interleaving equal the batch election over the rows seen so far
    * (a bounded-state property unique to priority sampling: the sample
    * is a pure min-k of a row-intrinsic value). State per stratum is the
    * k-row winner list — O(k), never the stream. Replays of an id are
    * idempotent by construction (same priority, min-k is a set op).
    */
  def runningWeightedSample(rows: Dataset[(String, Long, Long)], k: Int,
      salt: String = "wps"): Dataset[WeightedSampleSnapshot] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[(String, Long, Long)],
         state: GroupState[(Long, Seq[(Double, Long, Long)])]) =>
          var (n, buf) = state.getOption.getOrElse((0L, Seq.empty))
          it.foreach { case (_, id, w) =>
            n += 1
            val pri = (graft.functions.HashFunctions
              .stableHash64(s"$salt:$id") % 281474976710656L).toDouble / w
            if (!buf.exists(_._2 == id)) // replay-idempotent
              buf = ((pri, id, w) +: buf)
                .sortBy(e => (e._1, e._2)).take(k)
          }
          state.update((n, buf))
          WeightedSampleSnapshot(key, n,
            buf.zipWithIndex.map { case ((_, id, w), i) =>
              ((i + 1).toLong, id, w)
            })
      }
  }

  final case class JoinViewSnapshot(n_name: String, n_orders: Long,
      total_cents: Long)

  /** Streaming twin of q252's incremental join view: the per-dimension
    * (count, sum) revenue view maintained from a stream of fact rows
    * (fk, amount_cents), the dimension shipped as a broadcast-sized map —
    * Structured Streaming's stream-static join collapsed to its essence.
    * Because count/sum are Abelian, the state after any prefix of ANY
    * interleaving equals the batch view of the rows seen so far — the
    * q252 identity, now incremental per micro-batch. Facts with no
    * dimension row land in the "unknown" group (disclosed, never
    * dropped). Amounts are integer cents so parity with a batch groupBy
    * is exact. State per key: two longs — bounded by the dimension's
    * cardinality, never the stream's.
    */
  def runningJoinView(facts: Dataset[(Long, Long)],
      dim: Map[Long, String]): Dataset[JoinViewSnapshot] = {
    import facts.sparkSession.implicits._
    facts.groupByKey(r => dim.getOrElse(r._1, "unknown"))
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[(Long, Long)],
         state: GroupState[(Long, Long)]) =>
          var (n, tot) = state.getOption.getOrElse((0L, 0L))
          it.foreach { r => n += 1; tot += r._2 }
          state.update((n, tot))
          JoinViewSnapshot(key, n, tot)
      }
  }

  final case class SetSimPair(id_a: Long, id_b: Long, inter: Long, uni: Long,
      jac4: Long)
  /** Per-prefix-element inverted-index state: (id, sz, pos of this element
    * in the doc's canonical order, full sorted element set — kept for the
    * exact verify at emit time, the in-memory AllPairs layout).
    */
  final case class PrefixBucketState(members: Seq[(Long, Long, Long, Seq[Long])])
  /** [[PrefixBucketState]] with event-time epoch ms per member. */
  final case class TimedPrefixBucketState(
      members: Seq[(Long, Long, Long, Seq[Long], Long)])

  /** Streaming twin #17 — [[graft.operators.SetSimJoin.deltaJoin]]'s
    * nightly-delta semantics taken to per-arrival granularity: every
    * arriving document emits its EXACT Jaccard-≥-τ pairs against every
    * document seen so far (and earlier rows of its own batch), so the
    * cumulative emitted pair SET over any arrival order equals
    * `selfJoin` over the union. Same machinery as the batch operator —
    * distinct hashed shingles, a consistent canonical order (plain
    * hash-ascending here: the prefix lemma needs only CONSISTENCY, and a
    * stream has no stable df table — the deltaJoin exactness argument),
    * prefix-restricted probing, length + exact-α positional filters, and
    * the exact sorted-merge verify. State is the classic prefix inverted
    * index keyed by element (each bucket holds its members with their
    * full sets), so an element's bucket is visited only by docs carrying
    * it in their prefix. A pair sharing several prefix elements may emit
    * more than once (the [[streamingNearDupPairs]] multi-band contract —
    * consumers read the pair SET). Retention is the [[Retention]] policy:
    * `KeepAll` (whole-stream parity, state grows with the indexed corpus)
    * or [[EventWindow]] (pairs only within the event-time window; members
    * prune once the WATERMARK passes `ts + windowMs` — the exact moment no
    * admissible arrival can still pair with them, the
    * [[streamingNearDupPairs]] eviction argument verbatim — and idle
    * buckets drop wholesale by event-time timeout, so state is O(docs per
    * window + slack) per bucket).
    */
  def streamingSetSimPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, tau4: Long,
      retention: Retention = KeepAll): Dataset[SetSimPair] = {
    require(tau4 > 0 && tau4 <= 10000, s"tau4 must be in (0, 10000], got $tau4")
    retention match {
      case KeepAll => keepAllSetSim(docs, idCol, textCol, shingleN, tau4)
      case w: EventWindow => windowedSetSim(docs, idCol, textCol, shingleN, tau4, w)
    }
  }

  /** Match filters shared by both retention paths: id inequality, length,
    * exact-α positional; returns the verified pair when J ≥ τ.
    */
  private def setSimMatch(id: Long, sz: Long, pos: Long, toks: Seq[Long],
      mid: Long, msz: Long, mpos: Long, mtoks: Seq[Long],
      tau4: Long): Option[SetSimPair] = {
    if (mid == id ||
      math.min(sz, msz) * 10000L < tau4 * math.max(sz, msz) ||
      (math.min(sz - pos, msz - mpos) + 1L) * (10000L + tau4) <
        tau4 * (sz + msz)) return None
    val inter = intersectSortedCount(toks, mtoks)
    val uni = sz + msz - inter
    if (inter * 10000L >= tau4 * uni)
      Some(SetSimPair(math.min(id, mid), math.max(id, mid),
        inter, uni, inter * 10000L / uni))
    else None
  }

  /** Canonical sorted-hash sets + prefix explode (the batch operator's
    * shapes under the df-free hash-ascending order), carrying `extra`
    * columns (the event-time column for the windowed path).
    */
  private def setSimPrefix(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, tau4: Long, extra: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val sets = docs.select(Seq(col(idCol).cast("long").as("id"),
      sort_array(array_distinct(transform(
        graft.operators.Dedup.shinglesCol(col(textCol), shingleN),
        g => xxhash64(g)))).as("toks")) ++ extra.map(col): _*)
      .withColumn("sz", size(col("toks")).cast("long"))
    sets.select(Seq(col("id"), col("sz"), col("toks")) ++ extra.map(col) :+
      posexplode(slice(col("toks"), lit(1),
        (col("sz") - floor((col("sz") * tau4 + lit(9999L)) / lit(10000L)) + lit(1L))
          .cast("int"))).as(Seq("p0", "g")): _*)
      .select(Seq(col("g"), col("id"), col("sz"),
        (col("p0") + 1).cast("long").as("pos"), col("toks")) ++ extra.map(col): _*)
  }

  private def keepAllSetSim(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, tau4: Long): Dataset[SetSimPair] = {
    import docs.sparkSession.implicits._
    setSimPrefix(docs, idCol, textCol, shingleN, tau4, Nil)
      .as[(Long, Long, Long, Long, Seq[Long])]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Long, rows: Iterator[(Long, Long, Long, Long, Seq[Long])],
         state: GroupState[PrefixBucketState]) =>
          var members = state.getOption.map(_.members).getOrElse(Seq.empty)
          val out = Seq.newBuilder[SetSimPair]
          rows.foreach { case (_, id, sz, pos, toks) =>
            members.foreach { case (mid, msz, mpos, mtoks) =>
              setSimMatch(id, sz, pos, toks, mid, msz, mpos, mtoks, tau4)
                .foreach(out += _)
            }
            members = members :+ ((id, sz, pos, toks))
          }
          state.update(PrefixBucketState(members))
          out.result().iterator
      }
  }

  private def windowedSetSim(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, tau4: Long, w: EventWindow): Dataset[SetSimPair] = {
    import docs.sparkSession.implicits._
    setSimPrefix(docs.withWatermark(w.tsCol, w.watermarkDelay),
      idCol, textCol, shingleN, tau4, Seq(w.tsCol))
      .as[(Long, Long, Long, Long, Seq[Long], java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Long, rows: Iterator[(Long, Long, Long, Long, Seq[Long], java.sql.Timestamp)],
         state: GroupState[TimedPrefixBucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var members = state.getOption.map(_.members).getOrElse(Seq.empty)
            val out = Seq.newBuilder[SetSimPair]
            rows.foreach { case (_, id, sz, pos, toks, ts) =>
              val t = ts.getTime
              members.foreach { case (mid, msz, mpos, mtoks, mts) =>
                if (math.abs(t - mts) <= w.windowMs)
                  setSimMatch(id, sz, pos, toks, mid, msz, mpos, mtoks, tau4)
                    .foreach(out += _)
              }
              members = members :+ ((id, sz, pos, toks, t))
            }
            // prune on the WATERMARK, not the bucket max (the
            // streamingNearDupPairs out-of-order entitlement argument): a
            // member at ts can still pair until the watermark passes
            // ts + windowMs; the current arrival always survives
            members = members.filter(_._5 >= state.getCurrentWatermarkMs() - w.windowMs)
            if (members.isEmpty) {
              // every arrival this batch was itself sub-watermark (whether
              // late rows reach the function is Spark-version-dependent) —
              // nothing can pair again, so drop the state instead of
              // calling .max on an empty collection
              state.remove()
            } else {
              val newest = members.iterator.map(_._5).max
              state.update(TimedPrefixBucketState(members))
              state.setTimeoutTimestamp(
                math.max(state.getCurrentWatermarkMs() + 1, newest + w.windowMs + 1))
            }
            out.result().iterator
          }
      }
  }

  final case class FrontierSlot(domain: String, window_start: Long,
    doc_id: Long, priority: Long, wave: Long, delay_ms: Long,
    fetch_offset_ms: Long)

  /** Streaming twin #20 — q300's crawl-delay-paced frontier at discovery
    * granularity: the schedule a polite crawler computes for each
    * (domain, discovery-window) as URL discoveries stream in. Pacing is
    * a FULL-SET property — a URL's wave is its rank by (priority desc,
    * doc_id) among everything the window discovered for that domain —
    * so unlike the monoid twins nothing sound can be emitted per
    * arrival; the twin instead BUFFERS the window and emits the whole
    * schedule exactly once, when the WATERMARK passes window end (the
    * moment no admissible discovery can still arrive — the
    * [[EventWindow]] entitlement argument, used here for emission
    * instead of eviction). Emission-at-close makes the result
    * arrival-order-free by construction: any micro-batch split of the
    * same discoveries yields byte-identical schedules, the q300 batch
    * ranking applied per window. State is O(window URLs per domain)
    * while open — the same floor the batch rank has, bounded in
    * practice by per-domain caps (q270) upstream — and is REMOVED at
    * emission, so closed windows cost nothing.
    *
    * `urls` must carry domain (string), doc_id/priority/delay_ms
    * (long — join the q300 effective-delay relation and robots gate
    * upstream; this operator prices waves, it does not police paths),
    * and `tsCol` (timestamp event time).
    */
  def windowedFrontierSchedule(urls: DataFrame, tsCol: String,
      windowMs: Long, watermarkDelay: String): Dataset[FrontierSlot] = {
    import urls.sparkSession.implicits._
    import org.apache.spark.sql.functions._
    require(windowMs > 0, s"windowMs must be positive, got $windowMs")
    urls.withWatermark(tsCol, watermarkDelay)
      .select(col("domain").cast("string"), col("doc_id").cast("long"),
        col("priority").cast("long"), col("delay_ms").cast("long"),
        (floor(unix_millis(col(tsCol)) / windowMs) * windowMs).cast("long")
          .as("window_start"),
        // the WATERMARKED column itself must reach the stateful operator
        // (Spark refuses event-time timeout otherwise); unused in the
        // function body
        col(tsCol).as("__ts"))
      .as[(String, Long, Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(r => (r._1, r._5))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: (String, Long),
         rows: Iterator[(String, Long, Long, Long, Long, java.sql.Timestamp)],
         state: GroupState[Seq[(Long, Long, Long)]]) =>
          val (domain, winStart) = key
          if (state.hasTimedOut) {
            // window closed: rank by (priority desc, doc_id) — q300's
            // exact batch order — and emit the schedule in one piece
            val members = state.get
            state.remove()
            members.sortBy { case (id, prio, _) => (-prio, id) }
              .iterator.zipWithIndex.map { case ((id, prio, delay), i) =>
                FrontierSlot(domain, winStart, id, prio, i + 1L, delay,
                  i.toLong * delay)
              }
          } else {
            var members = state.getOption.getOrElse(Seq.empty)
            rows.foreach { case (_, id, prio, delay, _, _) =>
              // prepend: O(1) where :+ on the default Seq is O(k) per
              // row (quadratic over a window); emission sorts anyway
              members = ((id, prio, delay)) +: members
            }
            state.update(members)
            // fire the moment the watermark passes window end: every
            // discovery with ts inside the window would be LATE after
            // that, so the buffered set is complete
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs() + 1, winStart + windowMs))
            Iterator.empty
          }
      }
  }

  /** Exact intersection size of two ascending-sorted sequences. */
  private def intersectSortedCount(a: Seq[Long], b: Seq[Long]): Long = {
    val ai = a.iterator.buffered
    val bi = b.iterator.buffered
    var n = 0L
    while (ai.hasNext && bi.hasNext) {
      val c = java.lang.Long.compare(ai.head, bi.head)
      if (c == 0) { n += 1; ai.next(); bi.next() }
      else if (c < 0) ai.next()
      else bi.next()
    }
    n
  }
}
