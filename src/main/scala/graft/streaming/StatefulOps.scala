package graft.streaming

import org.apache.spark.sql.{Dataset, KeyValueGroupedDataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

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
}
