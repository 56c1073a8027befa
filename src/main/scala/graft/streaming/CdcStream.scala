package graft.streaming

import graft.lake.LakeTable
import graft.model.{ChangeEvent, TableMapping}
import graft.operators.Replay
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming ingestion: the Spark analog of the reference's
  * replication loop (`streamer/replicate_database.go:237-338`).
  *
  *   - The file source over the event-log directory plays the replication
  *     slot: the checkpoint offset is the ack LSN (the reference acks the
  *     source only after the destination commit, `worker.go:135-165`; here
  *     the checkpoint advances only after `foreachBatch` returns, i.e.
  *     after the lake snapshot commit).
  *   - `maxFilesPerTrigger` plays the commit_delay batching knob (W9,
  *     `worker.go:61-104`) and the full-sync rate limit (A2).
  *   - Exactly-once: if the process dies between the lake commit and the
  *     checkpoint commit, the batch is replayed on restart and skipped by
  *     the epoch check in `Replay.applyBatch` (commit-epoch snapshot
  *     property) — the idempotent-replay analog of `ON CONFLICT DO
  *     NOTHING` (`process_clone.go:195`).
  *   - One stream fans out to many table mappings (the reference's
  *     multi-table map, `streamer/map.go`): each target table carries its
  *     own epoch, so a crash between two tables' commits in one batch also
  *     replays safely.
  */
object CdcStream {

  final case class Route(mapping: TableMapping, lake: LakeTable)

  def start(spark: SparkSession,
            eventLogGlob: String,
            checkpointDir: String,
            routes: Seq[Route],
            salts: Int = 0,
            maxFilesPerTrigger: Int = 1,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    import spark.implicits._
    val src = spark.readStream
      .schema(ChangeEvent.schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(eventLogGlob)

    src.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        val events = df.as[ChangeEvent]
        routes.foreach { r =>
          Replay.applyBatch(r.lake, events, r.mapping, batchId, salts)
        }
      }
      .start()
  }

  /** Run to completion of currently-available input and stop (used by
    * tests and batch-style backfills). */
  def runAvailable(spark: SparkSession, eventLogGlob: String,
                   checkpointDir: String, routes: Seq[Route],
                   salts: Int = 1, maxFilesPerTrigger: Int = 1): Unit = {
    val q = start(spark, eventLogGlob, checkpointDir, routes, salts,
      maxFilesPerTrigger, Trigger.AvailableNow())
    q.awaitTermination()
  }
}
