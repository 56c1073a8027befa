package graft.streaming

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.annotation.JsonInclude
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.config.MapConfig
import graft.lake.LakeTable
import graft.model.{TableMode, TableSpec}

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, StandardCopyOption}
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** Admin control plane — the analog of the reference's REST API + config
  * CRUD + JWT auth (`streamer/api.go:299-358`, `handle_db.go` /
  * `handle_url.go` / `handle_tbl.go` / `handle_map.go`, `configdb.go`,
  * `handle_auth.go`), re-expressed for the declarative engine: the map
  * FILE is the config store (the reference's SQLite rows become structured
  * edits of the same JSON the orchestrator loads), every mutation is
  * validated through `MapConfig.parse` and written atomically, and the
  * running streams react through the existing reload machinery
  * (`Orchestrator.runWatched` / `runContinuous` watch the file's mtime —
  * the restart-channel analog, `handle_url.go:242-245`). POST /api/restart
  * bumps the mtime without changing content, forcing a stream rebuild
  * (runtime URL restart).
  *
  * Table clone (`handle_map.go:90-172`): POST /api/tbl/{src}/clone creates
  * the destination lake table from the SOURCE's schema (supplied by the
  * `sourceSpec` callback — the catalog-scan analog of `t.SourceColumns`),
  * honoring type=clone|append|history (history gets the kvsz_* validity
  * columns) and partitions_regex, then adds the map entry — so the next
  * reload routes it and the per-(table, sid) full-sync property triggers
  * its initial sync exactly once.
  *
  * Row-level parity (round 5): per-entity GET (`/api/db/{db}/url/{sid}`,
  * `/api/db/{db}/tbl/{src}` — the reference's `/api/url/{id}` /
  * `/api/map/{id}`, `api.go:319-342`), PUT-for-update of URLs
  * (`handle_url.go`), `/api/status` (deployment summary gate), and CORS
  * headers + OPTIONS preflight (the reference's CORS middleware; emitted
  * only when JWT auth is configured — a wildcard origin on an auth-free
  * dev-mode API would hand any local web page a cross-origin mutation
  * channel). Every path-bearing name is validated against a
  * safe-identifier pattern before touching the filesystem or map —
  * including every db/sid/table/target inside a bulk PUT /api/map body —
  * and every response body is Jackson-serialized (request-supplied
  * strings escape correctly).
  *
  * Auth mirrors `handle_auth.go` + `TokenValidationMiddleware`
  * (`api.go:264-296`): Bearer JWT, HS256 only (any other alg rejected),
  * `role` claim required; role "viewer" may only GET; expired tokens
  * (exp claim, seconds) rejected. `jwtKey = None` disables auth (dev
  * mode). Non-/api paths (/healthz) skip auth like the reference; CORS
  * preflights (OPTIONS) skip auth and reach no mutating handler.
  */
object AdminHttp {

  final case class Server(port: Int, underlying: HttpServer) {
    def stop(): Unit = underlying.stop(0)
  }

  private val mapper: ObjectMapper = new ObjectMapper()
    .registerModule(DefaultScalaModule)
    .setSerializationInclusion(JsonInclude.Include.NON_ABSENT)

  private final class HttpError(val status: Int, val code: String,
                                val detail: String) extends RuntimeException(detail)
  private def fail(status: Int, code: String, detail: String): Nothing =
    throw new HttpError(status, code, detail)

  // db / sid / table / target names are used inside filesystem paths
  // (s"$targetsRoot/$target") and map entries: anything outside this
  // pattern (leading dots, slashes, '..') could traverse out of the
  // targets root — reject it before any side effect
  private val SafeName = "^[A-Za-z0-9_][A-Za-z0-9_.-]*$".r
  private def checkName(kind: String, v: String): String = {
    if (!SafeName.matches(v) || v.contains(".."))
      fail(400, "bad_name", s"$kind '$v' must match ${SafeName.regex}")
    v
  }

  // -- JWT (HS256 only; `handle_auth.go:10-28` rejects non-HMAC algs) -----

  private[streaming] def validateJwt(token: String, key: Array[Byte],
                                     nowSec: Long = System.currentTimeMillis() / 1000): Option[String] =
    try {
      val parts = token.split('.')
      if (parts.length != 3) None
      else {
        def b64(s: String): Array[Byte] = java.util.Base64.getUrlDecoder.decode(s)
        val mac = Mac.getInstance("HmacSHA256")
        mac.init(new SecretKeySpec(key, "HmacSHA256"))
        val sig = mac.doFinal(s"${parts(0)}.${parts(1)}".getBytes(UTF_8))
        if (!java.security.MessageDigest.isEqual(sig, b64(parts(2)))) None
        else if (mapper.readTree(b64(parts(0))).path("alg").asText() != "HS256") None
        else {
          val payload = mapper.readTree(b64(parts(1)))
          if (payload.has("exp") && payload.get("exp").asLong() <= nowSec) None
          else Option(payload.get("role")).map(_.asText()).filter(_.nonEmpty)
        }
      }
    } catch { case _: IllegalArgumentException | _: java.io.IOException => None }

  /** Mint an HS256 token (ops tooling + tests; the reference's
    * refresh-token endpoint analog). */
  def signJwt(key: Array[Byte], role: String, expSec: Long = 0L): String = {
    def enc(b: Array[Byte]): String =
      java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(b)
    val header = enc("""{"alg":"HS256","typ":"JWT"}""".getBytes(UTF_8))
    val exp = if (expSec > 0) s""","exp":$expSec""" else ""
    val payload = enc(s"""{"role":"${role}"$exp}""".getBytes(UTF_8))
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    s"$header.$payload." + enc(mac.doFinal(s"$header.$payload".getBytes(UTF_8)))
  }

  // -- config-store edits (atomic read-modify-write of the map file) ------

  // one writer at a time per process: two concurrent API mutations would
  // otherwise read-modify-write the same base and silently drop one edit
  // (the reference serializes through SQLite; the JDK httpserver dispatches
  // requests on a thread pool)
  private val editLock = new Object

  private def readMap(mapPath: Path): MapConfig.DbMap =
    MapConfig.load(mapPath.toString)

  /** The store's extension, kept on the temp file so validation parses it
    * with the same syntax the live loader will. */
  private def suffix(p: Path): String = {
    val n = p.getFileName.toString
    val i = n.lastIndexOf('.')
    if (i >= 0) n.substring(i) else ""
  }

  private def writeMap(mapPath: Path, m: MapConfig.DbMap): Unit = {
    // format-preserving: a .yaml store re-renders in the reference's own
    // map.yaml shape, JSON in the native shape (MapConfig.render)
    val text = MapConfig.render(m, mapPath.toString)
    val tmp = mapPath.resolveSibling(
      s".tmp-${java.util.UUID.randomUUID()}${suffix(mapPath)}")
    Files.writeString(tmp, text)
    try {
      // validate the round-trip through the REAL loader before it becomes
      // live (same syntax + shape detection the orchestrator reload uses)
      MapConfig.load(tmp.toString)
      Files.move(tmp, mapPath, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    } finally Files.deleteIfExists(tmp)
  }

  /** @param spark       session used to create clone targets
    * @param mapPath     the declarative map file (the config store)
    * @param targetsRoot lake-table root for clone-created targets
    * @param sourceSpec  source-table schema lookup for /clone (the catalog
    *                    scan analog); None = unknown source -> 404
    * @param jwtKey      HS256 key; None disables auth */
  def start(spark: org.apache.spark.sql.SparkSession,
            mapPath: Path,
            targetsRoot: String,
            sourceSpec: String => Option[TableSpec] = _ => None,
            jwtKey: Option[Array[Byte]] = None,
            port: Int = 0): Server = {
    val startedAtMs = System.currentTimeMillis()
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    srv.createContext("/", (ex: HttpExchange) => handle(ex))
    srv.start()

    def respond(ex: HttpExchange, status: Int, body: String): Unit = {
      val b = body.getBytes(UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/json; charset=utf-8")
      // CORS (the reference serves its UI cross-origin through the same
      // middleware, api.go CORS handler) — emitted ONLY when JWT auth is
      // configured: with auth off (dev mode), a wildcard origin would let
      // any web page in a browser on the operator's machine send
      // cross-origin mutations to this loopback API and read the responses
      if (jwtKey.isDefined) {
        ex.getResponseHeaders.add("Access-Control-Allow-Origin", "*")
        ex.getResponseHeaders.add("Access-Control-Allow-Methods",
          "GET, POST, PUT, DELETE, OPTIONS")
        ex.getResponseHeaders.add("Access-Control-Allow-Headers",
          "Authorization, Content-Type")
      }
      ex.sendResponseHeaders(status, b.length)
      val os = ex.getResponseBody
      try os.write(b) finally os.close()
    }

    // every response body goes through Jackson — request-supplied strings
    // (names, error details) must escape, or a quote/backslash in them
    // yields invalid JSON
    def obj(fields: (String, Any)*): String = {
      val m = new java.util.LinkedHashMap[String, Any]()
      fields.foreach { case (k, v) => m.put(k, v) }
      mapper.writeValueAsString(m)
    }

    // auth gates on the SAME normalized segments the router matches on —
    // gating on the raw path string would let "//api/db" (empty segment
    // collapsed by the router, not by startsWith) bypass the check
    def authorize(ex: HttpExchange, segs: List[String]): Unit = jwtKey.foreach { key =>
      if (segs.headOption.contains("api")) {
        val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
          .getOrElse(fail(401, "not_allowed", "no authorization header"))
        val role = validateJwt(auth.stripPrefix("Bearer "), key)
          .getOrElse(fail(401, "not_allowed", "invalid authorization token"))
        if (role == "viewer" && ex.getRequestMethod != "GET")
          fail(403, "not_allowed", "viewer cannot modify configuration")
        if (role != "viewer" && role != "admin")
          fail(403, "not_allowed", s"unknown role: $role")
      }
    }

    def body(ex: HttpExchange): JsonNode =
      try mapper.readTree(ex.getRequestBody)
      catch { case _: Exception => fail(400, "bad_json", "request body is not JSON") }

    def handle(ex: HttpExchange): Unit = {
      try {
        val segs = ex.getRequestURI.getPath.split('/').filter(_.nonEmpty).toList
        val method = ex.getRequestMethod
        // CORS preflights carry no Authorization header by design; they
        // also reach no handler with side effects (the OPTIONS arm above)
        if (method != "OPTIONS") authorize(ex, segs)
        (method, segs) match {
          // CORS preflight (no auth — the browser sends it without headers)
          case ("OPTIONS", _) => respond(ex, 204, "")

          case ("GET", List("healthz")) => respond(ex, 200, obj("status" -> "ok"))

          // deployment status gate (reference api.go:201-297 serves /api/
          // behind a status check; here: one cheap liveness+shape summary)
          case ("GET", List("api", "status")) =>
            val m = readMap(mapPath)
            respond(ex, 200, obj(
              "status" -> "ok",
              "databases" -> m.databases.size,
              "urls" -> m.databases.map(_.urls.size).sum,
              "tables" -> m.databases.map(_.tables.size).sum,
              "uptime_sec" -> (System.currentTimeMillis() - startedAtMs) / 1000))

          case ("GET", List("api", "map")) =>
            respond(ex, 200, mapper.writeValueAsString(readMap(mapPath)))
          case ("PUT", List("api", "map")) =>
            val m = try MapConfig.parse(mapper.writeValueAsString(body(ex)))
              catch { case e: Exception => fail(400, "bad_map", e.getMessage) }
            // the bulk upload must enforce the SAME safe-name validation as
            // every per-entity endpoint: db/sid/table/target names end up in
            // filesystem paths (s"$targetsRoot/$target"), so an unchecked
            // '../../x' here would traverse out of the targets root
            m.databases.foreach { db =>
              checkName("db", db.name)
              db.urls.foreach(u => checkName("sid", u.sid))
              // validate with the SAME kind hints the orchestrator's route
              // build and boot validation use (target spec schema -> CEL
              // column kinds): a hint-free check here would accept CEL
              // that only fails to translate under hints, writing a map
              // the next reload/boot then throws on
              val mps = try MapConfig.mappings(db, (_, tgt) =>
                  sourceSpec(tgt).map(s => MapConfig.kindsOf(s.schema))
                    .getOrElse(Map.empty)) // also validates modes
                catch {
                  case e: HttpError => throw e
                  case e: Exception => fail(400, "bad_map", e.getMessage)
                }
              mps.foreach { mp =>
                checkName("table", mp.sourceTable)
                checkName("target", mp.target)
                MapConfig.signatureTarget(db, mp).foreach(checkName("target", _))
                MapConfig.labelTarget(db, mp).foreach(checkName("target", _))
              }
            }
            editLock.synchronized { writeMap(mapPath, m) }
            respond(ex, 200, obj("updated" -> "map"))

          case ("GET", List("api", "db")) =>
            respond(ex, 200, mapper.writeValueAsString(readMap(mapPath).databases.map(_.name)))
          case ("POST", List("api", "db")) =>
            val name = checkName("db", Option(body(ex).get("name")).map(_.asText())
              .filter(_.nonEmpty).getOrElse(fail(400, "bad_db", "missing name")))
            editLock.synchronized {
              val m = readMap(mapPath)
              if (m.databases.exists(_.name == name)) fail(409, "exists", name)
              writeMap(mapPath, m.copy(databases = m.databases :+
                MapConfig.SourceDatabase(name, Nil, Map.empty)))
            }
            respond(ex, 201, obj("created" -> name))
          case ("DELETE", List("api", "db", name)) =>
            editLock.synchronized {
              val m = readMap(mapPath)
              if (!m.databases.exists(_.name == name)) fail(404, "not_found", name)
              writeMap(mapPath, m.copy(databases = m.databases.filterNot(_.name == name)))
            }
            respond(ex, 200, obj("deleted" -> name))

          // row-level url reads/updates (reference /api/url/{id} GET/PUT,
          // handle_url.go): per-entity GET, PUT-for-update of the url
          case ("GET", List("api", "db", name, "url")) =>
            val db = readMap(mapPath).databases.find(_.name == name)
              .getOrElse(fail(404, "not_found", name))
            respond(ex, 200, mapper.writeValueAsString(db.urls))
          case ("GET", List("api", "db", name, "url", sid)) =>
            val db = readMap(mapPath).databases.find(_.name == name)
              .getOrElse(fail(404, "not_found", name))
            val u = db.urls.find(_.sid == sid).getOrElse(fail(404, "not_found", sid))
            respond(ex, 200, mapper.writeValueAsString(u))
          case ("POST", List("api", "db", name, "url")) =>
            val j = body(ex)
            val (url, sid) = (j.path("url").asText(""), j.path("sid").asText(""))
            if (url.isEmpty || sid.isEmpty) fail(400, "bad_url", "need url and sid")
            checkName("sid", sid)
            val fmt = urlFormat(j)
            editDb(name) { db =>
              if (db.urls.exists(_.sid == sid)) fail(409, "exists", sid)
              db.copy(urls = db.urls :+ MapConfig.UrlEntry(url, sid, fmt))
            }
            respond(ex, 201, obj("created" -> sid))
          case ("PUT", List("api", "db", name, "url", sid)) =>
            val j = body(ex)
            val url = j.path("url").asText("")
            if (url.isEmpty) fail(400, "bad_url", "need url")
            // format: updated when supplied, otherwise PRESERVED — a url
            // move must not silently strip a pgoutput url back to parquet
            val fmt = urlFormat(j)
            editDb(name) { db =>
              if (!db.urls.exists(_.sid == sid)) fail(404, "not_found", sid)
              db.copy(urls = db.urls.map(u =>
                if (u.sid == sid)
                  MapConfig.UrlEntry(url, sid, fmt.orElse(u.format))
                else u))
            }
            respond(ex, 200, obj("updated" -> sid))
          case ("DELETE", List("api", "db", name, "url", sid)) =>
            editDb(name) { db =>
              if (!db.urls.exists(_.sid == sid)) fail(404, "not_found", sid)
              db.copy(urls = db.urls.filterNot(_.sid == sid))
            }
            respond(ex, 200, obj("deleted" -> sid))

          case ("GET", List("api", "db", name, "tbl")) =>
            val db = readMap(mapPath).databases.find(_.name == name)
              .getOrElse(fail(404, "not_found", name))
            respond(ex, 200, mapper.writeValueAsString(db.tables))
          // per-entity table read (reference /api/map/{id} GET)
          case ("GET", List("api", "db", name, "tbl", src)) =>
            val db = readMap(mapPath).databases.find(_.name == name)
              .getOrElse(fail(404, "not_found", name))
            val t = db.tables.getOrElse(src, fail(404, "not_found", src))
            respond(ex, 200, mapper.writeValueAsString(t))
          case ("POST" | "PUT", List("api", "db", name, "tbl", src)) =>
            checkName("table", src)
            val entry = parseTableEntry(body(ex))
            entry.target.foreach(checkName("target", _))
            editDb(name)(db => db.copy(tables = db.tables + (src -> entry)))
            respond(ex, 201, obj("created" -> src))
          case ("DELETE", List("api", "db", name, "tbl", src)) =>
            editDb(name) { db =>
              if (!db.tables.contains(src)) fail(404, "not_found", src)
              db.copy(tables = db.tables - src)
            }
            respond(ex, 200, obj("deleted" -> src))

          // handle_map.go:90-172 — create dest table from the source
          // schema + add the map entry; idempotent on an existing target
          case ("POST", List("api", "tbl", src, "clone")) =>
            val q = queryParams(ex)
            val dbName = q.getOrElse("db", fail(400, "bad_clone", "need db param"))
            // validate EVERYTHING (db, mode, source schema) before the
            // side effect, or a 404 would leave an orphan target dir
            if (!readMap(mapPath).databases.exists(_.name == dbName))
              fail(404, "not_found", s"database '$dbName'")
            val mode = q.getOrElse("type", "clone")
            try TableMode.parse(mode)
            catch { case e: IllegalArgumentException => fail(400, "invalid_type", e.getMessage) }
            checkName("table", src)
            val target = checkName("target", q.getOrElse("target", src))
            val spec0 = sourceSpec(src).getOrElse(
              fail(404, "unknown_source", s"no source schema for '$src'"))
            val spec =
              if (mode == "history")
                spec0.copy(schema = graft.operators.History.historySchema(spec0.schema))
              else spec0
            val root = s"$targetsRoot/$target"
            if (!LakeTable.exists(root))
              LakeTable.create(spark, root, spec.copy(name = target))
            // MERGE into an existing entry: re-cloning must not wipe the
            // configured filter/set/signatures
            editDb(dbName) { db =>
              val prev = db.tables.get(src)
              val entry = MapConfig.TableEntry(Some(mode), Some(target),
                prev.flatMap(_.filter), prev.flatMap(_.set),
                q.get("partitions_regex").orElse(prev.flatMap(_.partitions_regex)),
                prev.flatMap(_.signatures))
              db.copy(tables = db.tables + (src -> entry))
            }
            respond(ex, 201, obj("cloned" -> src, "target" -> target))

          // lake maintenance, serialized on the per-table commit lock so
          // they are safe to invoke while the table's stream is live
          case ("POST", List("api", "table", target, "vacuum")) =>
            checkName("target", target)
            val root = s"$targetsRoot/$target"
            if (!LakeTable.exists(root)) fail(404, "not_found", target)
            val retain = intParam(ex, "retain", default = 2, min = 1)
            val (manifests, files) =
              CdcStream.vacuumUnderLock(spark, root, retain)
            respond(ex, 200, obj("vacuumed" -> target,
              "expired_manifests" -> manifests, "deleted_files" -> files))
          case ("POST", List("api", "table", target, "compact")) =>
            checkName("target", target)
            val root = s"$targetsRoot/$target"
            if (!LakeTable.exists(root)) fail(404, "not_found", target)
            val cap = intParam(ex, "max_files_per_bucket",
              default = graft.config.Knobs.compactFileCap, min = 1)
            val buckets = CdcStream.compactUnderLock(spark, root, cap)
            respond(ex, 200, obj("compacted" -> target, "buckets" -> buckets))

          // the restart channel analog: bump the map mtime so the watcher
          // stops/rebuilds/resumes the streams (handle_url.go:242-245).
          // max(now, mtime+1ms): on coarse-mtime filesystems a restart
          // within the same tick would otherwise be invisible to the
          // mtime-polling watcher
          case ("POST", List("api", "restart")) =>
            val next = math.max(System.currentTimeMillis(),
              Files.getLastModifiedTime(mapPath).toMillis + 1)
            Files.setLastModifiedTime(mapPath,
              java.nio.file.attribute.FileTime.fromMillis(next))
            respond(ex, 200, obj("restarted" -> true))

          case _ => fail(404, "not_found", ex.getRequestURI.getPath)
        }
      } catch {
        case e: HttpError =>
          respond(ex, e.status, obj("error" -> e.code, "detail" -> e.detail))
        case e: Exception =>
          respond(ex, 500, obj("error" -> "internal",
            "detail" -> String.valueOf(e.getMessage)))
      }
    }

    def editDb(name: String)(f: MapConfig.SourceDatabase => MapConfig.SourceDatabase): Unit =
      editLock.synchronized {
        val m = readMap(mapPath)
        val db = m.databases.find(_.name == name)
          .getOrElse(fail(404, "not_found", s"database '$name'"))
        writeMap(mapPath, m.copy(databases =
          m.databases.map(d => if (d.name == name) f(db) else d)))
      }

    Server(srv.getAddress.getPort, srv)
  }

  private def parseTableEntry(j: JsonNode): MapConfig.TableEntry = {
    val mode = Option(j.get("type")).map(_.asText())
    mode.foreach { m =>
      try TableMode.parse(m)
      catch { case e: IllegalArgumentException => fail(400, "invalid_type", e.getMessage) }
    }
    import scala.jdk.CollectionConverters._
    MapConfig.TableEntry(
      `type` = mode,
      target = Option(j.get("target")).map(_.asText()),
      filter = Option(j.get("filter")).map(_.asText()),
      set = Option(j.get("set")).map(n =>
        n.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap),
      partitions_regex = Option(j.get("partitions_regex")).map(_.asText()),
      signatures = Option(j.get("signatures")).map(_.asBoolean()))
  }

  /** Optional per-url event-log format from a request body; unknown values
    * are a 400 (they would crash the stream at the next reload). */
  private def urlFormat(j: JsonNode): Option[String] =
    Option(j.get("format")).map(_.asText()).filter(_.nonEmpty).map { f =>
      if (f != "parquet" && f != "pgoutput")
        fail(400, "bad_format", s"unknown event-log format '$f'")
      f
    }

  /** Bounded-int query param: malformed or out-of-range input is a 400
    * (client error), never a NumberFormatException-turned-500. */
  private def intParam(ex: HttpExchange, name: String, default: Int,
                       min: Int): Int =
    queryParams(ex).get(name).map { v =>
      val n = try v.toInt
        catch { case _: NumberFormatException =>
          fail(400, "bad_param", s"$name must be an integer, got '$v'") }
      if (n < min) fail(400, "bad_param", s"$name must be >= $min, got $n")
      n
    }.getOrElse(default)

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getQuery).map(_.split('&').toSeq
      .flatMap { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => Some(k -> java.net.URLDecoder.decode(v, "UTF-8"))
          case Array(k) => Some(k -> "")
          case _ => None
        }
      }.toMap).getOrElse(Map.empty)
}
