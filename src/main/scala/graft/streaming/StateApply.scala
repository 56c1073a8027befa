package graft.streaming

import graft.model.ChangeEvent
import graft.operators.Replay
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** State-store-backed CDC apply: the reference's row-at-a-time semantics
  * (`streamer/process_clone.go` — insert-if-absent, merge-if-present with
  * unchanged-TOAST, delete) expressed through Structured Streaming's
  * keyed state (`mapGroupsWithState`) instead of the lake merge join.
  *
  * This is the complementary execution strategy to `Replay.applyBatch`:
  * the lake merge is the set-oriented/batch path (bounded output files,
  * time travel, exactly-once snapshot commits); the state store is the
  * low-latency path — per-key state lives in the checkpointed state store
  * and every micro-batch emits only the keys it touched (update output
  * mode), so a downstream consumer sees per-key upserts immediately
  * without rereading table state.
  *
  * Scale shape: one shuffle per micro-batch on the merge key (the same
  * exchange the fold path pays); state is partitioned across executors by
  * the state-store provider, hot keys cost one state row each. Cross-batch
  * order is the stream's file order (lsn-contiguous WAL segments);
  * intra-batch order is restored by sorting each key's ops by `ord` —
  * together per-key apply order matches the reference's single worker per
  * table (`worker.go:106-108`).
  *
  * Delivery: the STATE is exactly-once (checkpointed with the stream), but
  * update-mode emissions replay on crash between sink write and checkpoint
  * commit — pair with an idempotent downstream (keyed upsert, or the lake
  * writer's epoch check) exactly as the reference pairs at-least-once
  * delivery with ON CONFLICT DO NOTHING.
  */
object StateApply {

  /** Checkpointed per-key state: current row (empty when deleted/absent)
    * plus the cumulative applied-op count (monotone — consumers pick the
    * max-apps emission per key as the latest).
    *
    * Deleted keys keep a tombstone (exists=false) so `apps` stays monotone
    * across delete-then-reinsert; at 10^10-deleted-key scale swap
    * NoTimeout for ProcessingTimeTimeout eviction — or use the lake merge
    * path, whose state IS the table. */
  final case class KeyState(exists: Boolean, row: Map[String, String],
                            apps: Long)

  /** One update-mode emission: the key's state after this micro-batch. */
  final case class Emit(key: String, exists: Boolean, apps: Long,
                        row: Map[String, String])

  val KeySep = "\u0001"

  /** Apply one key's micro-batch slice onto its state — EXACTLY the
    * reference per-row rules (see Oracle.replay): I inserts if absent,
    * U column-merges if present (absent keys in `after` = unchanged
    * TOAST), D removes (absent tolerated). */
  private def applyOps(key: String, it: Iterator[Replay.KeyedOp],
                       state: GroupState[KeyState]): Emit = {
    val sorted = it.toArray.sortBy(_.ord)
    val prev = state.getOption
    var row: Option[Map[String, String]] =
      prev.filter(_.exists).map(_.row)
    sorted.foreach { op =>
      op.op match {
        case "I" => if (row.isEmpty) row = Some(op.after)
        case "U" => row = row.map(_ ++ op.after)
        case "D" => row = None
        case _ =>
      }
    }
    val apps = prev.map(_.apps).getOrElse(0L) + sorted.length
    state.update(KeyState(row.isDefined, row.getOrElse(Map.empty), apps))
    Emit(key, row.isDefined, apps, row.getOrElse(Map.empty))
  }

  /** Normalize a change-event stream (PK-updates split, replica-identity
    * keys extracted — Replay.normalize) and fold it through keyed state;
    * returns the update-mode emission stream. Works on a streaming OR
    * batch Dataset (mapGroupsWithState is supported on both; on batch it
    * degenerates to a single "micro-batch"). */
  def stream(events: Dataset[ChangeEvent], mergeKey: Seq[String],
             appendMode: Boolean = false): Dataset[Emit] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .flatMap(e => Replay.normalize(e, mergeKey, appendMode))
      .groupByKey(_.key.map(k => if (k == null) "" else k).mkString(KeySep))
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(
        (key: String, it: Iterator[Replay.KeyedOp], st: GroupState[KeyState]) =>
          applyOps(key, it, st))
  }
}
