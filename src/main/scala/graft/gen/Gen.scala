package graft.gen

import graft.model.ChangeEvent
import org.apache.spark.sql.{Dataset, SparkSession}

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

/** Deterministic synthetic transcript-CDC log generator.
  *
  * Every event is a pure function of its row id (splitmix64 streams), so the
  * log is reproducible at any scale and parallelism without coordination:
  * `spark.range(n).map(mkEvent)` — no external data, no driver state. This
  * plays the role of the reference's pgbench load driver
  * (`test/load/run`, `test/load/init`) and its robot-suite op scripts.
  *
  * Shape knobs mirror the reference test matrix: update/delete ratios,
  * PK-update events (old_kind "K", `20-clone.robot:37-41`), unchanged-TOAST
  * updates that omit the `text` column (`60-Toast.robot:14-25`), Zipf-ish
  * hot-conversation skew (the north rule's 10^10-scale skew case), multiple
  * sids (fan-in, `00-common.robot:9-11`), and a mid-stream schema-evolution
  * epoch that emits a Relation ("R") message adding a `tokens` column.
  */
object Gen {

  final case class Config(
      numEvents: Long = 100000L,
      numConvs: Int = 1000,
      turnsPerConv: Int = 32,
      txnSize: Int = 4, // events sharing one lsn; seq breaks ties
      pInsert: Double = 0.55,
      pUpdate: Double = 0.30,
      // remainder = deletes
      pPkUpdate: Double = 0.05, // fraction of updates that change the key
      pToast: Double = 0.20, // fraction of updates omitting `text`
      skew: Double = 1.0, // >1 concentrates events on low conv ids
      numSids: Int = 1,
      seed: Long = 42L,
      sourceTables: Seq[String] = Seq("transcripts"),
      evolveAtId: Option[Long] = None, // emit R(+tokens) at this id
      numPartitions: Int = 32)

  private val roles = Array("user", "assistant", "tool", "system")
  private val tsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
  private val t0 = LocalDateTime.of(2024, 1, 1, 0, 0, 0)

  @inline def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }
  @inline private def u01(h: Long): Double = (h >>> 11).toDouble / (1L << 53).toDouble
  @inline private def pick(h: Long, n: Int): Int = java.lang.Math.floorMod(h, n.toLong).toInt

  /** The event for row `id` — pure, deterministic. */
  def mkEvent(id: Long, cfg: Config): ChangeEvent = {
    val lsn = id / cfg.txnSize + 1
    val seq = (id % cfg.txnSize).toInt
    val h = mix(cfg.seed ^ (id * 0x5851F42D4C957F2DL))
    val hConv = mix(h + 1); val hTurn = mix(h + 2); val hOp = mix(h + 3)
    val hRole = mix(h + 4); val hText = mix(h + 5); val hTool = mix(h + 6)
    val hSid = mix(h + 7); val hPk = mix(h + 8); val hTbl = mix(h + 9)

    val conv = math.min(cfg.numConvs - 1,
      (cfg.numConvs * math.pow(u01(hConv), cfg.skew)).toInt)
    val convId = f"c$conv%08d"
    val turn = pick(hTurn, cfg.turnsPerConv)
    val sid = "s" + pick(hSid, cfg.numSids)
    val table = cfg.sourceTables(pick(hTbl, cfg.sourceTables.size))
    val evolved = cfg.evolveAtId.exists(id > _)

    if (cfg.evolveAtId.contains(id)) {
      // Relation message: current schema + added `tokens` column (analog of
      // pgoutput RelationMessage, process_message.go:191-213)
      return ChangeEvent(lsn, seq, "R", table, sid, "none", Map.empty, Map(
        "conv_id" -> "string", "turn_idx" -> "int", "role" -> "string",
        "text" -> "string", "tool" -> "string", "ts" -> "timestamp",
        "tokens" -> "int"))
    }

    val ts = t0.plusSeconds(id % 86400000L).format(tsFmt)
    val role = roles(pick(hRole, roles.length))
    val text = s"t-$convId-$turn-$lsn-${hText & 0xFFFFL}"
    val tool: String = if (pick(hTool, 10) < 7) null else "tool" + pick(hTool, 8)
    def fullTuple(c: String, t: Int): Map[String, String] = {
      val base = Map(
        "conv_id" -> c, "turn_idx" -> t.toString, "role" -> role,
        "text" -> text, "tool" -> tool, "ts" -> ts)
      if (evolved) base + ("tokens" -> pick(hText, 4096).toString) else base
    }

    val opU = u01(hOp)
    if (opU < cfg.pInsert) {
      ChangeEvent(lsn, seq, "I", table, sid, "none", Map.empty, fullTuple(convId, turn))
    } else if (opU < cfg.pInsert + cfg.pUpdate) {
      val isPk = u01(mix(hPk + 1)) < cfg.pPkUpdate
      if (isPk) {
        // key change: (conv, turn) -> (conv, turn'), full new tuple
        val newTurn = pick(mix(hPk + 2), cfg.turnsPerConv)
        ChangeEvent(lsn, seq, "U", table, sid, "K",
          Map("conv_id" -> convId, "turn_idx" -> turn.toString),
          fullTuple(convId, newTurn))
      } else {
        val toast = u01(mix(hPk + 3)) < cfg.pToast
        val after0 = fullTuple(convId, turn)
        val after = if (toast) after0 - "text" else after0
        ChangeEvent(lsn, seq, "U", table, sid, "none", Map.empty, after)
      }
    } else {
      ChangeEvent(lsn, seq, "D", table, sid, "K",
        Map("conv_id" -> convId, "turn_idx" -> turn.toString), Map.empty)
    }
  }

  /** Distributed generation: pure map over spark.range — embarrassingly
    * parallel, deterministic at any partitioning. */
  def events(spark: SparkSession, cfg: Config): Dataset[ChangeEvent] = {
    import spark.implicits._
    spark.range(0, cfg.numEvents, 1, cfg.numPartitions).map(id => mkEvent(id, cfg))
  }

  /** Materialize a log to parquet split into `numFiles` lsn-contiguous
    * segments — the streaming source replays them as micro-batches in
    * order (the event-log analog of the WAL segments the reference
    * tails). `filesPerSegment` > 1 splits each segment into several
    * parquet files so a batch scan parallelizes across executor cores
    * (a single-file segment pins the whole map side — decode, filter,
    * stats, fold phase A — to ONE task). */
  def writeLog(spark: SparkSession, cfg: Config, path: String, numFiles: Int,
               filesPerSegment: Int = 1): Unit =
    writeSegments(spark, cfg, path, numFiles, 0 until numFiles, filesPerSegment)

  /** Write only segments `segs` of an `numFiles`-segment split — lets tests
    * append WAL segments to a live log directory. */
  def writeSegments(spark: SparkSession, cfg: Config, path: String,
                    numFiles: Int, segs: Range,
                    filesPerSegment: Int = 1): Unit = {
    val n = cfg.numEvents
    val per = math.max(1L, (n + numFiles - 1) / numFiles)
    import spark.implicits._
    segs.foreach { i =>
      val lo = i * per; val hi = math.min(n, lo + per)
      if (lo < hi)
        // segments replay in (mtime, path) order; intra-segment file order
        // is irrelevant because the merge folds per key by (lsn, seq)
        spark.range(lo, hi, 1, cfg.numPartitions).map(id => mkEvent(id, cfg))
          .coalesce(filesPerSegment).write.mode("overwrite")
          .parquet(f"$path/seg-$i%05d")
    }
  }
}
