package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Keyed-state streaming operators via `KeyValueGroupedDataset` — the
  * faithful per-key rendering of the reference's consumer loop (one state
  * cell per document id, reference `es.go:47-144`), for cases where the
  * set-oriented `foreachBatch` merge (see [[graft.cdc.ChangelogStream]]) is
  * not enough (e.g. per-key timers or custom eviction).
  *
  * Scale note: state lives in the streaming state store partitioned by key
  * (RocksDB-backed in deployment) — each micro-batch touches only the keys
  * present in the batch. Prefer the foreachBatch merge when the sink is a
  * table; use these when the *transition function* itself is stateful.
  */
object Stateful {

  /** One keyed change event (the DatabaseEvent envelope of reference
    * `utils.go:22-26`, with the payload narrowed to the fields under test). */
  case class KeyedEvent(id: Long, seq: Long, op: String, price: Double)

  /** The per-key register: latest (seq, op, price) seen so far. */
  case class KeyState(seq: Long, op: String, price: Double)

  /** CDC state machine: per id, fold events into latest-writer-wins state
    * (tombstones included — exactly [[graft.cdc.Apply.latestState]] but as
    * an incremental per-key transition). Emits the current state per key on
    * every batch (Update mode). */
  def cdcStateMachine(events: Dataset[KeyedEvent]): Dataset[(Long, KeyState)] = {
    implicit val stEnc = Encoders.product[KeyState]
    implicit val outEnc = Encoders.tuple(Encoders.scalaLong, stEnc)
    events.groupByKey(_.id)(Encoders.scalaLong)
      .flatMapGroupsWithState[KeyState, (Long, KeyState)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (id: Long, batch: Iterator[KeyedEvent], state: GroupState[KeyState]) =>
          val candidates = state.getOption.iterator ++
            batch.map(e => KeyState(e.seq, e.op, e.price))
          val latest = candidates.maxBy(_.seq)
          state.update(latest)
          Iterator.single((id, latest))
      }
  }

  /** Running per-user aggregate with explicit keyed state (count + sum) —
    * `mapGroupsWithState` flavor. */
  case class UserAgg(n: Long, sum: Double)

  def userRunningAgg(events: Dataset[(Long, Double)]): Dataset[(Long, UserAgg)] = {
    implicit val aggEnc = Encoders.product[UserAgg]
    implicit val outEnc = Encoders.tuple(Encoders.scalaLong, aggEnc)
    events.groupByKey(_._1)(Encoders.scalaLong)
      .mapGroupsWithState[UserAgg, (Long, UserAgg)](GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[(Long, Double)], state: GroupState[UserAgg]) =>
          val prev = state.getOption.getOrElse(UserAgg(0L, 0d))
          val next = batch.foldLeft(prev) { case (a, (_, v)) => UserAgg(a.n + 1, a.sum + v) }
          state.update(next)
          (user, next)
      }
  }
}
