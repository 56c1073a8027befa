package graft.config

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import graft.model.TableSpec
import org.apache.spark.sql.types.StructType

import java.nio.file.{Files, Paths}

/** Layered process configuration — the analog of the reference's config
  * loader (`streamer/config.go:111-188`: TOML file + environment + flags
  * merged with precedence). Here the layers are, lowest to highest:
  *
  *   defaults  <  settings file (`--config <path>`; JSON, or TOML like the
  *                reference — chosen by the `.toml` extension)
  *             <  environment (`GRAFT_<UPPER_SNAKE_KEY>`)
  *             <  CLI flags (`--kebab-key=value` or `--kebab-key value`)
  *
  * Settings-file keys are snake_case; the same key spells
  * `GRAFT_MAP_FILE` in the environment and `--map-file` on the command
  * line. Unknown flags and file keys fail loudly (a typo must not
  * silently fall back to a default). The MAP file named here is separate
  * and stays live-reloadable (Orchestrator watches its mtime); the
  * process config itself is boot-time, like the reference's flag layer.
  */
final case class ProcessConfig(
    mapFile: String = "map.json",
    targetsRoot: String = "targets",
    checkpointRoot: String = "checkpoints",
    specsFile: Option[String] = None,
    adminPort: Int = -1, // -1 = admin API off; 0 = ephemeral
    metricsPort: Int = -1, // -1 = metrics endpoint off; 0 = ephemeral
    jwtKey: Option[String] = None, // admin auth secret; None = dev mode
    master: String = "local[*]",
    shufflePartitions: Int = 32,
    salts: Int = 0,
    maxFilesPerTrigger: Int = 1,
    triggerMs: Long = 250L,
    drain: Boolean = false, // true = drain available WAL once and exit
    // periodic lake maintenance: every interval, vacuum (expire snapshots
    // past vacuum_retain + reclaim unreferenced files) and compact
    // over-fragmented buckets on every map target — continuous ingest at
    // 10^10 events otherwise accumulates manifests/files without bound.
    // <= 0 disables (drain mode and tests).
    maintenanceIntervalSec: Long = -1L,
    vacuumRetain: Int = 8,
    // ONE compaction threshold for every reader (maintenance loop, inline
    // merge compaction, signature-store merge): resolved through the same
    // defaults < file < env (GRAFT_COMPACT_FILE_CAP) < flags layering and
    // published to graft.config.Knobs at serve() time
    compactFileCap: Int = Knobs.compactFileCap)

object ProcessConfig {

  private val mapper = new ObjectMapper().registerModule(DefaultScalaModule)

  private val keys = Seq("map_file", "targets_root", "checkpoint_root",
    "specs_file", "admin_port", "metrics_port", "jwt_key", "master",
    "shuffle_partitions", "salts", "max_files_per_trigger", "trigger_ms",
    "drain", "maintenance_interval_sec", "vacuum_retain",
    "compact_file_cap")

  /** Resolve the config from `args` + `env` (+ the settings file named by
    * `--config`/GRAFT_CONFIG, if any). */
  def resolve(args: Seq[String],
              env: Map[String, String] = sys.env): ProcessConfig = {
    // --k=v and --k v forms; later flags win
    val flags = scala.collection.mutable.Map[String, String]()
    var i = 0
    while (i < args.length) {
      val a = args(i)
      if (!a.startsWith("--"))
        throw new IllegalArgumentException(s"unexpected argument '$a'")
      val (k, v) = a.indexOf('=') match {
        case -1 =>
          if (i + 1 >= args.length)
            throw new IllegalArgumentException(s"flag '$a' needs a value")
          i += 1
          (a.drop(2), args(i))
        case eq => (a.substring(2, eq), a.substring(eq + 1))
      }
      val snake = k.replace('-', '_')
      if (snake != "config" && !keys.contains(snake))
        throw new IllegalArgumentException(s"unknown flag '--$k'")
      flags(snake) = v
      i += 1
    }

    val fileVals: Map[String, String] =
      flags.get("config").orElse(env.get("GRAFT_CONFIG")) match {
        case None => Map.empty
        case Some(path) =>
          val text = Files.readString(Paths.get(path))
          // the reference's settings file is TOML (config.go); accept both
          // formats by extension — same flat keys, same typo policy
          val raw: Map[String, String] =
            if (path.endsWith(".toml")) parseFlatToml(text, path)
            else {
              val node = mapper.readTree(text)
              val it = node.properties().iterator()
              val out = Map.newBuilder[String, String]
              while (it.hasNext) {
                val e = it.next()
                out += e.getKey -> e.getValue.asText()
              }
              out.result()
            }
          raw.keys.find(!keys.contains(_)).foreach(k =>
            throw new IllegalArgumentException(
              s"unknown settings key '$k' in $path"))
          raw
      }

    // the flag and file layers reject typos outright; env vars are shared
    // with the engine's runtime knobs (GRAFT_TIMING, GRAFT_OCCUPANCY, ...),
    // so an unrecognized GRAFT_* gets a loud WARNING instead of a hard
    // failure — a typo'd GRAFT_MAP_FIL must not silently fall back
    val runtimeKnobs = Set("GRAFT_CONFIG", "GRAFT_TIMING", "GRAFT_OCCUPANCY",
      "GRAFT_CANDIDATE_CAP", "GRAFT_METRICS_DIR",
      "GRAFT_ZONE_STATS", "GRAFT_CALIBRATE",
      "GRAFT_MASTER", "GRAFT_AQE", "GRAFT_WORK_BASE", "GRAFT_PLANS_FULL",
      "GRAFT_SALTS", "GRAFT_CC_COLLECT_CAP", "GRAFT_CC_DEBUG",
      "GRAFT_BOILER_DF")
    // renamed/retired knobs: still recognized (no "unrecognized" warning,
    // which would be misleading) but called out explicitly — a deployment
    // still setting the old name gets neither effect nor silence
    val deprecatedKnobs = Map(
      "GRAFT_OCCUPANCY_CAP" -> "GRAFT_CANDIDATE_CAP")
    deprecatedKnobs.foreach { case (old, now) =>
      if (env.contains(old))
        System.err.println(s"[config] WARNING: '$old' is deprecated and has " +
          s"no effect — set '$now' instead")
    }
    val knownEnv = keys.map(k => "GRAFT_" + k.toUpperCase).toSet ++
      runtimeKnobs ++ deprecatedKnobs.keySet
    env.keys.filter(k => k.startsWith("GRAFT_") && !knownEnv.contains(k))
      .foreach(k => System.err.println(
        s"[config] WARNING: unrecognized environment variable '$k' is " +
          "ignored (known keys: " + keys.mkString(", ") + ")"))

    def get(key: String): Option[String] =
      flags.get(key)
        .orElse(env.get("GRAFT_" + key.toUpperCase))
        .orElse(fileVals.get(key))
    def str(key: String, d: String): String = get(key).getOrElse(d)
    def opt(key: String): Option[String] = get(key).filter(_.nonEmpty)
    def int(key: String, d: Int): Int = get(key).map(_.toInt).getOrElse(d)
    def bool(key: String, d: Boolean): Boolean =
      get(key).map(_.toBoolean).getOrElse(d)

    val dflt = ProcessConfig()
    ProcessConfig(
      mapFile = str("map_file", dflt.mapFile),
      targetsRoot = str("targets_root", dflt.targetsRoot),
      checkpointRoot = str("checkpoint_root", dflt.checkpointRoot),
      specsFile = opt("specs_file"),
      adminPort = int("admin_port", dflt.adminPort),
      metricsPort = int("metrics_port", dflt.metricsPort),
      jwtKey = opt("jwt_key"),
      master = str("master", dflt.master),
      shufflePartitions = int("shuffle_partitions", dflt.shufflePartitions),
      salts = int("salts", dflt.salts),
      maxFilesPerTrigger = int("max_files_per_trigger", dflt.maxFilesPerTrigger),
      triggerMs = get("trigger_ms").map(_.toLong).getOrElse(dflt.triggerMs),
      drain = bool("drain", dflt.drain),
      maintenanceIntervalSec = get("maintenance_interval_sec").map(_.toLong)
        .getOrElse(dflt.maintenanceIntervalSec),
      vacuumRetain = int("vacuum_retain", dflt.vacuumRetain),
      compactFileCap = int("compact_file_cap", dflt.compactFileCap))
  }

  /** Flat TOML settings parser — the engine's process settings are a flat
    * key space (see [[keys]]), so the accepted TOML is the flat subset:
    * `key = value` lines, `#` comments, basic/literal strings, bare
    * ints/floats/bools. Table headers (`[section]`) fail loudly — a
    * sectioned file from another tool must be flattened consciously, not
    * silently mis-read (same typo policy as the JSON and flag layers). */
  private[config] def parseFlatToml(text: String, path: String): Map[String, String] = {
    def fail(ln: Int, msg: String): Nothing =
      throw new IllegalArgumentException(s"$path:${ln + 1}: $msg")
    val out = Map.newBuilder[String, String]
    text.linesIterator.zipWithIndex.foreach { case (raw, ln) =>
      val line = raw.trim
      if (line.isEmpty || line.startsWith("#")) ()
      else if (line.startsWith("["))
        fail(ln, "table headers are not supported — the engine's settings " +
          "are flat keys (" + keys.mkString(", ") + ")")
      else {
        val eq = line.indexOf('=')
        if (eq < 1) fail(ln, "expected 'key = value'")
        val key = line.substring(0, eq).trim
        if (!key.matches("[A-Za-z0-9_-]+"))
          fail(ln, s"unsupported key syntax '$key'")
        val rhs = line.substring(eq + 1).trim
        val value =
          if (rhs.startsWith("\"")) {
            val sb = new StringBuilder
            var i = 1; var closed = false
            while (i < rhs.length && !closed) rhs.charAt(i) match {
              case '"' => closed = true; i += 1
              case '\\' =>
                if (i + 1 >= rhs.length) fail(ln, "dangling escape")
                rhs.charAt(i + 1) match {
                  case 'n' => sb += '\n'; case 't' => sb += '\t'
                  case 'r' => sb += '\r'; case '"' => sb += '"'
                  case '\\' => sb += '\\'
                  case 'u' =>
                    if (i + 6 > rhs.length) fail(ln, "bad \\u escape")
                    sb += Integer.parseInt(rhs.substring(i + 2, i + 6), 16).toChar
                    i += 4
                  case other => fail(ln, s"unsupported escape '\\$other'")
                }
                i += 2
              case c => sb += c; i += 1
            }
            if (!closed) fail(ln, "unterminated string")
            val rest = rhs.substring(i).trim
            if (rest.nonEmpty && !rest.startsWith("#"))
              fail(ln, s"trailing content after string: '$rest'")
            sb.toString
          } else if (rhs.startsWith("'")) {
            val end = rhs.indexOf('\'', 1)
            if (end < 0) fail(ln, "unterminated literal string")
            val rest = rhs.substring(end + 1).trim
            if (rest.nonEmpty && !rest.startsWith("#"))
              fail(ln, s"trailing content after string: '$rest'")
            rhs.substring(1, end)
          } else {
            val bare = rhs.indexOf('#') match {
              case -1 => rhs
              case h => rhs.substring(0, h).trim
            }
            if (!bare.matches("true|false|[+-]?[0-9_]+([.][0-9_]+)?"))
              fail(ln, s"unsupported value '$bare' (strings must be quoted)")
            bare.replace("_", "")
          }
        out += key.replace('-', '_') -> value
      }
    }
    out.result()
  }

  /** Load target TableSpecs from a specs file — the declarative schema
    * source for targets that do not exist yet (existing lake tables carry
    * their own spec; the admin clone endpoint derives specs from source
    * schemas). Format, one entry per target name:
    * {{{
    * { "transcripts": { "ddl": "conv_id string, turn_idx int, text string",
    *                    "keys": ["conv_id", "turn_idx"],
    *                    "buckets": ["conv_id"],      // default: keys
    *                    "num_buckets": 64,            // default: 16
    *                    "sid": true } }               // default: false
    * }}} */
  def loadSpecs(path: String): Map[String, TableSpec] = {
    val node = mapper.readTree(Files.readString(Paths.get(path)))
    val out = Map.newBuilder[String, TableSpec]
    val it = node.properties().iterator()
    while (it.hasNext) {
      val e = it.next()
      val name = e.getKey
      val v: JsonNode = e.getValue
      def strs(field: String): Seq[String] = {
        val n = v.get(field)
        if (n == null) Nil
        else {
          val b = Seq.newBuilder[String]
          n.forEach(x => b += x.asText())
          b.result()
        }
      }
      val ddl = Option(v.get("ddl")).map(_.asText()).getOrElse(
        throw new IllegalArgumentException(s"spec '$name' needs \"ddl\""))
      val keysCols = strs("keys")
      require(keysCols.nonEmpty, s"spec '$name' needs non-empty \"keys\"")
      val buckets = { val b = strs("buckets"); if (b.isEmpty) keysCols else b }
      val hasSid = Option(v.get("sid")).exists(_.asBoolean())
      val payload = StructType.fromDDL(ddl)
      // sid tables physically store the tenant column; prepend it so the
      // ddl stays the payload shape (the orchestrator stamps the value)
      val schema =
        if (hasSid && !payload.fieldNames.contains("sid"))
          StructType(org.apache.spark.sql.types.StructField("sid",
            org.apache.spark.sql.types.StringType, nullable = true) +: payload.fields)
        else payload
      out += name -> TableSpec(name, schema,
        keyCols = keysCols, bucketCols = buckets,
        numBuckets = Option(v.get("num_buckets")).map(_.asInt()).getOrElse(16),
        hasSid = hasSid)
    }
    out.result()
  }
}
