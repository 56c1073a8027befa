package graft.streaming

import graft.config.MapConfig
import graft.lake.LakeTable
import graft.model.{TableMode, TableSpec}
import graft.operators.{Backfill, History}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** The engine's main loop: declarative map config -> running replication —
  * the Spark analog of the reference's startup wiring
  * (`streamer/kuvasz-streamer.go:94-100`: one reader goroutine per
  * (database, url); `streamer/map.go:160-187`: resolve the table map;
  * `streamer/replicate_database.go:220-235`: full-sync all tables when the
  * replication slot is new and only newly-added tables on an existing
  * slot).
  *
  * Per source database x URL, this:
  *   1. resolves the database's table map to engine mappings (R1 routing,
  *      P1/P2 filter & set, table mode);
  *   2. loads or creates each target lake table from `specs` (history
  *      targets get the kvsz_* validity columns appended automatically);
  *   3. runs the initial full sync for every (table, sid) that has never
  *      been synced — tracked as a `full-sync-<sid>` snapshot property, so
  *      the "new slot -> sync everything, new table on old slot -> sync
  *      just it" matrix falls out of one rule, and the property commits
  *      atomically with the copied data (a crash mid-sync re-syncs, a
  *      crash after never re-syncs);
  *   4. starts one Structured Streaming query over the URL's WAL directory
  *      with a per-(db, sid) checkpoint (the replication-slot resume
  *      point) and the config sid stamped onto every event (the reference
  *      assigns sid per URL in config — it is not wire data).
  *
  * Cross-source fan-in into one table is safe: applies serialize on the
  * per-table lock (CdcStream) and each (stream, mapping) pair keeps its own
  * epoch property (`commit-epoch-<db>-<sid>-<sourceTable>`), so neither
  * cross-stream fan-in nor two mappings of ONE stream sharing a target can
  * collide on idempotent-replay bookkeeping.
  */
object Orchestrator {

  final case class Handle(db: String, url: String, sid: String,
                          query: StreamingQuery)

  /** @param dbMap       parsed map config (MapConfig.load / .parse)
    * @param targetsRoot directory holding one lake table per target name
    * @param specs       table spec per target name (schema + merge key);
    *                    history targets may omit the kvsz_* columns
    * @param backfill    (sourceTable, sid) -> current source snapshot for
    *                    the initial full sync; None = nothing to sync
    *                    (stream-only source)
    */
  def start(spark: SparkSession,
            dbMap: MapConfig.DbMap,
            targetsRoot: String,
            specs: Map[String, TableSpec],
            checkpointRoot: String,
            backfill: (String, String) => Option[DataFrame] = (_, _) => None,
            salts: Int = 0,
            maxFilesPerTrigger: Int = 1,
            trigger: org.apache.spark.sql.streaming.Trigger =
              org.apache.spark.sql.streaming.Trigger.AvailableNow()): Seq[Handle] = {
    ProgressLog.attach(spark)
    dbMap.databases.flatMap { db =>
      val routes0 = MapConfig.mappings(db).map { m =>
        val root = s"$targetsRoot/${m.target}"
        val spec0 = specs.getOrElse(m.target, throw new IllegalArgumentException(
          s"no TableSpec for target '${m.target}' (database '${db.name}')"))
        val spec =
          if (m.mode == TableMode.History &&
              !spec0.schema.fieldNames.contains("kvsz_start"))
            spec0.copy(schema = History.historySchema(spec0.schema))
          else spec0
        val lake =
          if (LakeTable.exists(root)) LakeTable.load(spark, root)
          else LakeTable.create(spark, root, spec)
        CdcStream.Route(m, lake)
      }
      db.urls.map { u =>
        // initial full sync: once per (table, sid), recorded atomically.
        // Under the table lock: an earlier URL's stream may already be
        // committing to the same target (single-writer commit protocol).
        routes0.foreach { r =>
          CdcStream.lockFor(r.lake.root).synchronized {
            val prop = s"full-sync-${u.sid}"
            if (!r.lake.snapshot().properties.contains(prop))
              backfill(r.mapping.sourceTable, u.sid).foreach { src =>
                Backfill.initialSync(r.lake, src, sid = Some(u.sid), propKey = prop)
              }
          }
        }
        // Epoch key per (stream, MAPPING), not per stream: two map entries
        // may share one target (the reference's consolidation shape), and a
        // shared key would let the first route's commit mark the batch done
        // for the second route — silently dropping its events every batch.
        val routes = routes0.map(r => r.copy(
          sidOverride = Some(u.sid),
          epochKey = s"commit-epoch-${db.name}-${u.sid}-${r.mapping.sourceTable}"))
        // One-time upgrade migration: tables written before the epoch key
        // carried the source-table suffix hold `commit-epoch-<db>-<sid>`
        // only. Seed the per-mapping key from it, or a checkpoint-
        // redelivered last batch (crash between sink commit and checkpoint)
        // would re-apply once per existing deployment — the idempotent-
        // replay gate would read -1 under the new key.
        routes.foreach { r =>
          CdcStream.lockFor(r.lake.root).synchronized {
            val props = r.lake.snapshot().properties
            val legacy = s"commit-epoch-${db.name}-${u.sid}"
            if (!props.contains(r.epochKey) && props.contains(legacy))
              r.lake.commit(Nil, Set.empty,
                properties = Map(r.epochKey -> props(legacy)))
          }
        }
        val q = CdcStream.start(spark, u.url,
          s"$checkpointRoot/${db.name}-${u.sid}", routes,
          salts = salts, maxFilesPerTrigger = maxFilesPerTrigger,
          trigger = trigger)
        Handle(db.name, u.url, u.sid, q)
      }
    }
  }

  /** Start from a map FILE, drain all currently-available WAL, and stop —
    * the batch-style entry point (tests, driver queries, catch-up runs). */
  def runAvailable(spark: SparkSession, mapPath: String, targetsRoot: String,
                   specs: Map[String, TableSpec], checkpointRoot: String,
                   backfill: (String, String) => Option[DataFrame] = (_, _) => None,
                   salts: Int = 0): Seq[Handle] = {
    val hs = start(spark, MapConfig.load(mapPath), targetsRoot, specs,
      checkpointRoot, backfill, salts)
    hs.foreach(_.query.awaitTermination())
    hs
  }

  /** Live map reload: run repeated AvailableNow drain cycles, re-reading
    * the map FILE whenever its mtime changes — the analog of the reference
    * watching its config file and restarting streams on change
    * (`streamer/config.go:180-186`, restart channel
    * `handle_url.go:242-245`). Reload semantics across cycles:
    *
    *   - ADDED table: routed from the next cycle; its initial full sync
    *     runs automatically (the "new table on an existing slot" rule —
    *     the per-(table, sid) `full-sync-*` property makes it exactly-once);
    *   - REMOVED table: routing stops; the TARGET TABLE IS KEPT as-is
    *     (the reference never drops destination tables; re-adding the
    *     entry resumes routing without a duplicate sync);
    *   - unchanged tables: checkpoints + per-(stream, mapping) epochs make
    *     every cycle a pure resume — no replay, no loss.
    *
    * Runs until `until()` turns true; returns the number of completed
    * drain cycles. */
  def runWatched(spark: SparkSession, mapPath: String, targetsRoot: String,
                 specs: Map[String, TableSpec], checkpointRoot: String,
                 backfill: (String, String) => Option[DataFrame] = (_, _) => None,
                 salts: Int = 0,
                 pollMs: Long = 200,
                 until: () => Boolean): Int = {
    var cycles = 0
    var lastMtime = Long.MinValue
    var dbMap: MapConfig.DbMap = null
    while (!until()) {
      val mt = java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(mapPath)).toMillis
      if (dbMap == null || mt != lastMtime) {
        if (dbMap != null)
          System.err.println(s"[orchestrator] map file changed — rebuilding routes")
        lastMtime = mt
        dbMap = MapConfig.load(mapPath)
      }
      val hs = start(spark, dbMap, targetsRoot, specs, checkpointRoot,
        backfill, salts)
      hs.foreach(_.query.awaitTermination())
      cycles += 1
      if (!until()) Thread.sleep(pollMs)
    }
    cycles
  }
}
