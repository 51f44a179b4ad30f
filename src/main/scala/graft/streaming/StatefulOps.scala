package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import scala.reflect.runtime.universe.TypeTag

/** Stateful streaming operators via `flatMapGroupsWithState` — the
  * custom-state mechanism for semantics watermark/window aggregation
  * can't express.
  *
  * Scale shape: state lives in the state store, partitioned by group
  * key; each micro-batch touches only the groups present in the batch,
  * and per-group state here is O(1) (a first-seen marker + counter), so
  * state size grows with distinct keys only — never with stream length.
  */
object StatefulOps {

  final case class Keyed[V](key: String, ts: Long, value: V)
  final case class SeenState(firstTs: Long, duplicates: Long)
  final case class FirstSeen[V](key: String, value: V, firstTs: Long)

  /** Watermark-scoped streaming dedup: [[firstSeenDedup]] suppresses a
    * key FOREVER but its state grows with distinct keys forever too —
    * untenable on an unbounded 100 TB ingest. This variant bounds state
    * by time instead: duplicates whose event times fall within `delay`
    * of each other collapse to the first arrival, and once the
    * watermark passes a key's last-seen time + `delay` its state is
    * EVICTED — a later replay of the same key is re-emitted. That is
    * the correct contract for continuous ingestion where duplicates
    * are bursty (retries, at-least-once upstreams) rather than eternal:
    * state size is O(keys per watermark window), not O(keys ever).
    * Built on Structured Streaming's `dropDuplicatesWithinWatermark`
    * so eviction rides the engine's state-store watermark machinery.
    */
  def dedupWithinWatermark(df: org.apache.spark.sql.DataFrame,
      keyCols: Seq[String], tsCol: String, delay: String): org.apache.spark.sql.DataFrame =
    df.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(keyCols)

  final case class FunnelEvent(userId: Long, eventId: Long, tsUs: Long,
    eventType: String)
  /** −1 = stage not reached. Stages only ever get SET (never revised)
    * under the ts-ordered-feed contract, which is what makes the
    * batch post-pass a plain max-aggregate.
    */
  final case class FunnelSnap(userId: Long, t1: Long, t2: Long, t3: Long)

  /** Incremental greedy ordered FUNNEL (the streaming half of the
    * batch funnel operator): per user, stage 1 is the first `stages(0)`
    * event, stage k>1 the first `stages(k-1)` event STRICTLY AFTER
    * stage k−1's time. State is one (t1, t2, t3) triple per user —
    * O(1), never the event list; each micro-batch sorts only ITS OWN
    * rows for the user (bounded by batch size) and folds them into the
    * state machine, emitting a snapshot when any stage advances.
    *
    * Contract: the feed must be non-decreasing in event time ACROSS
    * batches (within a batch, order is free — the fold sorts). That is
    * the natural shape of a replayed log or a watermarked upstream;
    * under it, "first qualifying event seen" ≡ "minimum qualifying
    * event", so the streamed stages equal the batch min-per-stage
    * formulation exactly — the q93 gate proves it against the batch
    * funnel's own oracle.
    */
  def funnelStates(ds: Dataset[FunnelEvent], stages: Seq[String]): Dataset[FunnelSnap] = {
    require(stages.length == 3, "funnelStates tracks a 3-stage funnel")
    implicit val stateEnc: Encoder[FunnelSnap] = Encoders.product[FunnelSnap]
    ds.groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState[FunnelSnap, FunnelSnap](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[FunnelEvent], state: GroupState[FunnelSnap]) =>
          val sorted = rows.toArray.sortBy(e => (e.tsUs, e.eventId))
          var s = state.getOption.getOrElse(FunnelSnap(uid, -1L, -1L, -1L))
          val before = s
          sorted.foreach { e =>
            if (e.eventType == stages(0) && s.t1 < 0)
              s = s.copy(t1 = e.tsUs)
            else if (e.eventType == stages(1) && s.t1 >= 0 && s.t2 < 0 && e.tsUs > s.t1)
              s = s.copy(t2 = e.tsUs)
            else if (e.eventType == stages(2) && s.t2 >= 0 && s.t3 < 0 && e.tsUs > s.t2)
              s = s.copy(t3 = e.tsUs)
          }
          if (s != before) { state.update(s); Iterator.single(s) }
          else Iterator.empty
      }
  }

  /** Cross-batch first-seen dedup: the first row per key (in stream
    * arrival order) is emitted; later rows only bump a duplicate counter
    * in state. The streaming analog of the exact-dedup operator for
    * continuous ingestion.
    */
  def firstSeenDedup[V: TypeTag](ds: Dataset[Keyed[V]]): Dataset[FirstSeen[V]] = {
    implicit val stateEnc: Encoder[SeenState] = Encoders.product[SeenState]
    implicit val outEnc: Encoder[FirstSeen[V]] = ExpressionEncoder[FirstSeen[V]]()
    ds.groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState[SeenState, FirstSeen[V]](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[Keyed[V]], state: GroupState[SeenState]) =>
          val batch = rows.toSeq
          if (batch.isEmpty) Iterator.empty
          else if (state.exists) {
            val s = state.get
            state.update(s.copy(duplicates = s.duplicates + batch.length))
            Iterator.empty
          } else {
            val first = batch.minBy(_.ts)
            state.update(SeenState(first.ts, (batch.length - 1).toLong))
            Iterator.single(FirstSeen(key, first.value, first.ts))
          }
      }
  }
}
