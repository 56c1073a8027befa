package graft

import graft.config.MapConfig
import graft.lake.LakeTable
import graft.model.Transcripts
import graft.streaming.AdminHttp
import org.scalatest.funsuite.AnyFunSuite

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}

/** Admin control plane: CRUD over the declarative map file (validated,
  * atomic), table clone creating the target lake table, restart touch,
  * and HS256 JWT auth with role enforcement. */
class AdminHttpSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val client = HttpClient.newHttpClient()

  private def req(port: Int, method: String, path: String, body: String = "",
                  token: Option[String] = None): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .method(method, if (body.isEmpty) HttpRequest.BodyPublishers.noBody()
        else HttpRequest.BodyPublishers.ofString(body))
    token.foreach(t => b.header("Authorization", s"Bearer $t"))
    client.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }

  private def freshMap(tag: String): java.nio.file.Path = {
    val dir = SparkTestBase.tmpDir(tag)
    val p = Paths.get(s"$dir/map.json")
    Files.writeString(p,
      """{"databases":[{"name":"app",
        |  "urls":[{"url":"wal/seg-*","sid":"s0"}],
        |  "tables":{"transcripts":{"type":"clone","target":"transcripts"}}}]}""".stripMargin)
    p
  }

  test("bulk map upload validates CEL under the SAME kind hints as boot") {
    import graft.model.TableSpec
    import org.apache.spark.sql.types._
    val mapPath = freshMap("adminhints")
    val spec = TableSpec("transcripts",
      StructType(Seq(StructField("conv_id", StringType, nullable = false),
        StructField("tags", ArrayType(StringType), nullable = true))),
      keyCols = Seq("conv_id"), bucketCols = Seq("conv_id"), numBuckets = 4)
    val srv = AdminHttp.start(spark, mapPath, s"${mapPath.getParent}/th",
      sourceSpec = n => if (n == "transcripts") Some(spec) else None)
    try {
      val p = srv.port
      val beforeMap = Files.readString(mapPath)
      // `.substring` on a LIST-kind column errs only when kind hints flow
      // into the CEL translation — a hint-free validation would accept
      // this map, and the next orchestrator boot/reload would then throw
      // on the exact same expression
      val b =
        """{"databases":[{"name":"app","urls":[],
          |  "tables":{"transcripts":{"type":"clone","target":"transcripts",
          |    "lang":"cel","filter":"tags.substring(0, 1) == \"a\""}}}]}""".stripMargin
      val r = req(p, "PUT", "/api/map", b)
      assert(r.statusCode() == 400, s"got ${r.statusCode()}: ${r.body()}")
      assert(r.body().contains("slice"), r.body())
      assert(Files.readString(mapPath) == beforeMap,
        "the rejected map must not be written")
    } finally srv.stop()
  }

  test("config CRUD: validated, atomic, reload-visible") {
    val mapPath = freshMap("admin")
    val srv = AdminHttp.start(spark, mapPath, s"${mapPath.getParent}/targets")
    try {
      val p = srv.port
      assert(req(p, "GET", "/healthz").statusCode() == 200)
      assert(req(p, "GET", "/api/map").body().contains("transcripts"))

      // db CRUD
      assert(req(p, "POST", "/api/db", """{"name":"aux"}""").statusCode() == 201)
      assert(req(p, "POST", "/api/db", """{"name":"aux"}""").statusCode() == 409)
      assert(MapConfig.load(mapPath.toString).databases.map(_.name) ==
        Seq("app", "aux"))

      // url CRUD
      assert(req(p, "POST", "/api/db/aux/url",
        """{"url":"wal2/seg-*","sid":"s9"}""").statusCode() == 201)
      assert(req(p, "DELETE", "/api/db/aux/url/nope").statusCode() == 404)
      assert(MapConfig.load(mapPath.toString).databases.find(_.name == "aux")
        .get.urls.map(_.sid) == Seq("s9"))

      // table CRUD with validation: bad type rejected, file unchanged
      val before = Files.readString(mapPath)
      assert(req(p, "POST", "/api/db/app/tbl/events",
        """{"type":"bogus"}""").statusCode() == 400)
      assert(Files.readString(mapPath) == before, "invalid write must not land")
      assert(req(p, "POST", "/api/db/app/tbl/events",
        """{"type":"append","target":"events_log","filter":"value > 1",
          |"set":{"c":"upper(c)"},"partitions_regex":"events_p[0-9]"}""".stripMargin)
        .statusCode() == 201)
      val m = MapConfig.mappings(
        MapConfig.load(mapPath.toString).databases.find(_.name == "app").get)
      val ev = m.find(_.sourceTable == "events").get
      assert(ev.target == "events_log" &&
        ev.mode == graft.model.TableMode.Append &&
        ev.filter.contains("value > 1") &&
        ev.set.contains(Seq("c" -> "upper(c)")) &&
        ev.partitionsRegex.contains("events_p[0-9]"))
      assert(req(p, "DELETE", "/api/db/app/tbl/events").statusCode() == 200)

      // restart touch bumps the mtime (the watcher's reload signal)
      val mt0 = Files.getLastModifiedTime(mapPath).toMillis
      Thread.sleep(5)
      assert(req(p, "POST", "/api/restart").statusCode() == 200)
      assert(Files.getLastModifiedTime(mapPath).toMillis >= mt0)
    } finally srv.stop()
  }

  test("table clone: creates the target lake from the source schema + map entry") {
    val mapPath = freshMap("adminclone")
    val targets = s"${mapPath.getParent}/targets"
    val srv = AdminHttp.start(spark, mapPath, targets,
      sourceSpec = s => if (s == "transcripts_v2") Some(Transcripts.spec(numBuckets = 4)) else None)
    try {
      val p = srv.port
      assert(req(p, "POST", "/api/tbl/unknown/clone?db=app").statusCode() == 404)
      assert(req(p, "POST",
        "/api/tbl/transcripts_v2/clone?db=app&type=bogus").statusCode() == 400)
      val r = req(p, "POST",
        "/api/tbl/transcripts_v2/clone?db=app&type=history&target=t2_hist&partitions_regex=t2_%5B0-9%5D")
      assert(r.statusCode() == 201, r.body())
      // target exists with the history validity columns
      val lake = LakeTable.load(spark, s"$targets/t2_hist")
      assert(lake.schema.fieldNames.contains("kvsz_start"))
      // map entry added; clone is idempotent on the existing target
      val e = MapConfig.load(mapPath.toString).databases.find(_.name == "app")
        .get.tables("transcripts_v2")
      assert(e.target.contains("t2_hist") && e.`type`.contains("history") &&
        e.partitions_regex.contains("t2_[0-9]"))
      assert(req(p, "POST",
        "/api/tbl/transcripts_v2/clone?db=app&type=history&target=t2_hist")
        .statusCode() == 201)
      // re-cloning must MERGE with a configured entry, not wipe it
      assert(req(p, "POST", "/api/db/app/tbl/transcripts_v2",
        """{"type":"history","target":"t2_hist","filter":"turn_idx > 0",
          |"signatures":false}""".stripMargin).statusCode() == 201)
      assert(req(p, "POST",
        "/api/tbl/transcripts_v2/clone?db=app&type=history&target=t2_hist")
        .statusCode() == 201)
      val e2 = MapConfig.load(mapPath.toString).databases.find(_.name == "app")
        .get.tables("transcripts_v2")
      assert(e2.filter.contains("turn_idx > 0") && e2.signatures.contains(false),
        s"clone must preserve configured filter/signatures: $e2")
      // clone against an unknown db: 404 and NO orphan target directory
      assert(req(p, "POST",
        "/api/tbl/transcripts_v2/clone?db=nope&target=orphan").statusCode() == 404)
      assert(!LakeTable.exists(s"$targets/orphan"),
        "a failed clone must not leave an orphan target")
    } finally srv.stop()
  }

  test("e2e: API clone over a LIVE continuous deployment routes + streams") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = SparkTestBase.tmpDir("adminlive")
    val cfg = graft.gen.Gen.Config(numEvents = 1500, numConvs = 15, seed = 707,
      sourceTables = Seq("t1", "t2"), evolveAtId = None)
    graft.gen.Gen.writeLog(spark, cfg, s"$dir/wal", 1, filesPerSegment = 1)
    val mapPath = Paths.get(s"$dir/map.json")
    Files.writeString(mapPath,
      s"""{"databases":[{"name":"app",
         |  "urls":[{"url":"$dir/wal/seg-*","sid":"s0"}],
         |  "tables":{"t1":{"type":"clone","target":"t1"}}}]}""".stripMargin)
    val specs = Map(
      "t1" -> Transcripts.spec(name = "t1", numBuckets = 4),
      "t2" -> Transcripts.spec(name = "t2", numBuckets = 4))
    def await(what: String, timeoutMs: Long = 180000)(cond: => Boolean): Unit = {
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      while (!cond) {
        if (System.nanoTime() > deadline) fail(s"timed out waiting for: $what")
        Thread.sleep(200)
      }
    }
    val h = graft.streaming.Orchestrator.runContinuous(spark, mapPath.toString,
      s"$dir/targets", specs, s"$dir/ckpt", pollMs = 100,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))
    val srv = AdminHttp.start(spark, mapPath, s"$dir/targets",
      sourceSpec = s => specs.get(s))
    try {
      await("t1 converged")(LakeTable.exists(s"$dir/targets/t1") &&
        LakeTable.load(spark, s"$dir/targets/t1").snapshot()
          .properties.contains("commit-epoch-app-s0-t1"))
      // operator clones t2 through the API; the live watcher picks up the
      // map change and the new route streams
      assert(req(srv.port, "POST", "/api/tbl/t2/clone?db=app").statusCode() == 201)
      Seq(graft.model.ChangeEvent(999990L, 0, "I", "t2", "s0", "none",
        Map.empty, Map("conv_id" -> "api-live", "turn_idx" -> "0",
          "role" -> "user", "text" -> "routed")))
        .toDS().toDF().coalesce(1).write.parquet(s"$dir/wal/seg-00001")
      await("cloned t2 routed and streaming") {
        LakeTable.exists(s"$dir/targets/t2") &&
          LakeTable.load(spark, s"$dir/targets/t2").read()
            .filter(col("conv_id") === "api-live").count() == 1
      }
    } finally { srv.stop(); h.stop() }
  }

  test("maintenance endpoints: vacuum + compact under the table lock") {
    import spark.implicits._
    val mapPath = freshMap("adminmaint")
    val targets = s"${mapPath.getParent}/targets"
    val lake = LakeTable.create(spark, s"$targets/transcripts",
      Transcripts.spec(numBuckets = 1))
    (0 until 4).foreach { i =>
      val df = Seq((f"c$i%04d", 0, "user", s"t$i", null: String,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
        .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .withColumn("__bucket", org.apache.spark.sql.functions.lit(0))
      lake.commit(lake.writeDataFiles(df.coalesce(1),
        lake.snapshot().currentSchemaId), Set.empty)
    }
    val srv = AdminHttp.start(spark, mapPath, targets)
    try {
      val p = srv.port
      assert(req(p, "POST", "/api/table/nope/vacuum").statusCode() == 404)
      val rc = req(p, "POST", "/api/table/transcripts/compact?max_files_per_bucket=1")
      assert(rc.statusCode() == 200 && rc.body().contains("\"buckets\":1"), rc.body())
      val rv = req(p, "POST", "/api/table/transcripts/vacuum?retain=1")
      assert(rv.statusCode() == 200, rv.body())
      // malformed/out-of-range params are CLIENT errors, not 500s
      assert(req(p, "POST", "/api/table/transcripts/vacuum?retain=abc")
        .statusCode() == 400)
      assert(req(p, "POST", "/api/table/transcripts/compact?max_files_per_bucket=0")
        .statusCode() == 400)
      assert(lake.read().count() == 4, "maintenance must not lose rows")
      assert(lake.snapshot().files.size == 1)
    } finally srv.stop()
  }

  test("row-level parity: per-entity GET/PUT, /api/status, CORS") {
    val mapPath = freshMap("adminrow")
    val srv = AdminHttp.start(spark, mapPath, s"${mapPath.getParent}/targets")
    try {
      val p = srv.port
      // per-entity reads (reference /api/url/{id}, /api/map/{id})
      val u = req(p, "GET", "/api/db/app/url/s0")
      assert(u.statusCode() == 200 && u.body().contains("wal/seg-*"), u.body())
      assert(req(p, "GET", "/api/db/app/url").body().contains("s0"))
      assert(req(p, "GET", "/api/db/app/url/nope").statusCode() == 404)
      val t = req(p, "GET", "/api/db/app/tbl/transcripts")
      assert(t.statusCode() == 200 && t.body().contains("clone"), t.body())
      assert(req(p, "GET", "/api/db/app/tbl/nope").statusCode() == 404)
      // PUT-for-update of a url (runtime URL change, handle_url.go)
      assert(req(p, "PUT", "/api/db/app/url/s0",
        """{"url":"wal-moved/seg-*"}""").statusCode() == 200)
      assert(MapConfig.load(mapPath.toString).databases.head.urls ==
        Seq(MapConfig.UrlEntry("wal-moved/seg-*", "s0")))
      assert(req(p, "PUT", "/api/db/app/url/nope", """{"url":"x"}""")
        .statusCode() == 404)
      // the per-url format survives a url move (PUT without format) and is
      // settable/validated on POST — losing it would flip a pgoutput url
      // back to the parquet reader at the next reload
      assert(req(p, "POST", "/api/db/app/url",
        """{"url":"chunks/c-*.bin","sid":"s8","format":"pgoutput"}""")
        .statusCode() == 201)
      assert(req(p, "POST", "/api/db/app/url",
        """{"url":"x","sid":"s9","format":"bogus"}""").statusCode() == 400)
      assert(req(p, "PUT", "/api/db/app/url/s8",
        """{"url":"chunks-moved/c-*.bin"}""").statusCode() == 200)
      val s8 = MapConfig.load(mapPath.toString).databases.head.urls
        .find(_.sid == "s8").get
      assert(s8 == MapConfig.UrlEntry("chunks-moved/c-*.bin", "s8",
        Some("pgoutput")), s"format must survive a url PUT: $s8")
      // /api/status summary
      val st = req(p, "GET", "/api/status")
      assert(st.statusCode() == 200 &&
        st.body().contains("\"databases\":1") &&
        st.body().contains("\"tables\":1"), st.body())
      // CORS headers are withheld in dev mode (no JWT): a wildcard origin
      // on an auth-free API would hand any local web page cross-origin
      // access to it (the with-auth case is asserted in the JWT test)
      assert(!st.headers().firstValue("Access-Control-Allow-Origin").isPresent,
        "no CORS headers without auth")
      assert(req(p, "OPTIONS", "/api/map").statusCode() == 204)
    } finally srv.stop()
  }

  test("hardening: path traversal rejected, JSON responses escape, restart mtime monotone") {
    val mapPath = freshMap("adminhard")
    val targets = s"${mapPath.getParent}/targets"
    val srv = AdminHttp.start(spark, mapPath, targets,
      sourceSpec = _ => Some(Transcripts.spec(numBuckets = 4)))
    try {
      val p = srv.port
      // traversal attempts in every path-bearing name: 400, no side effect
      val enc = java.net.URLEncoder.encode("../../evil", "UTF-8")
      assert(req(p, "POST", s"/api/tbl/src1/clone?db=app&target=$enc")
        .statusCode() == 400)
      assert(!Files.exists(Paths.get(s"${mapPath.getParent}/evil")) &&
        !Files.exists(Paths.get(s"$targets/../../evil")),
        "a traversal target must never be created")
      assert(req(p, "POST", "/api/db", s"""{"name":"${"a/b"}"}""")
        .statusCode() == 400)
      assert(req(p, "POST", "/api/db/app/tbl/..",
        """{"type":"clone"}""").statusCode() == 400)
      assert(req(p, "POST", "/api/db/app/url",
        """{"url":"w","sid":"../x"}""").statusCode() == 400)
      // bulk map upload enforces the same safe-name checks as the
      // per-entity endpoints: a traversal target/sid/db inside the body is
      // rejected before anything is written
      val beforeMap = Files.readString(mapPath)
      Seq(
        """{"databases":[{"name":"app","urls":[],
          |  "tables":{"t":{"type":"clone","target":"../../x"}}}]}""".stripMargin,
        """{"databases":[{"name":"../up","urls":[],"tables":{}}]}""",
        """{"databases":[{"name":"app",
          |  "urls":[{"url":"w","sid":"../s"}],"tables":{}}]}""".stripMargin,
        """{"databases":[{"name":"app","urls":[],
          |  "tables":{"../t":{"type":"clone"}}}]}""".stripMargin).foreach { b =>
        val r = req(p, "PUT", "/api/map", b)
        assert(r.statusCode() == 400, s"must reject: $b -> ${r.body()}")
      }
      assert(Files.readString(mapPath) == beforeMap,
        "a rejected bulk map must leave the store untouched")
      // JSON escaping: a detail carrying quotes/backslashes still parses
      val bad = req(p, "POST", "/api/db", """{"name":"a\"b\\c"}""")
      assert(bad.statusCode() == 400)
      val parsed = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(bad.body())
      assert(parsed.get("error") != null, s"body must be valid JSON: ${bad.body()}")
      // restart bumps mtime STRICTLY even within one clock tick
      val mt0 = Files.getLastModifiedTime(mapPath).toMillis
      assert(req(p, "POST", "/api/restart").statusCode() == 200)
      val mt1 = Files.getLastModifiedTime(mapPath).toMillis
      assert(req(p, "POST", "/api/restart").statusCode() == 200)
      val mt2 = Files.getLastModifiedTime(mapPath).toMillis
      assert(mt1 > mt0 && mt2 > mt1,
        s"restart mtime must strictly increase: $mt0 -> $mt1 -> $mt2")
    } finally srv.stop()
  }

  test("yaml map store: admin edits re-render in the reference shape") {
    val dir = SparkTestBase.tmpDir("adminyaml")
    val mapPath = Paths.get(s"$dir/map.yaml")
    Files.writeString(mapPath,
      """- database: app
        |  urls:
        |    - url: wal/seg-*
        |      sid: s0
        |  tables:
        |    transcripts:
        |      type: clone
        |""".stripMargin)
    val srv = AdminHttp.start(spark, mapPath, s"$dir/targets")
    try {
      val p = srv.port
      assert(req(p, "GET", "/api/map").body().contains("transcripts"))
      assert(req(p, "POST", "/api/db", """{"name":"aux"}""").statusCode() == 201)
      // an admin-created entry carries a SPARK SQL filter (native
      // semantics); the yaml render must pin lang so the reload does not
      // re-interpret it as CEL (where e.g. int '/' would translate to div)
      assert(req(p, "POST", "/api/db/app/tbl/events",
        """{"type":"append","filter":"value > 1"}""").statusCode() == 201)
      val text = Files.readString(mapPath)
      // still the reference map.yaml shape (loadable by the reference's
      // own yaml.v2 loader): top-level list, database key, no JSON braces
      assert(text.contains("database:") && !text.trim.startsWith("{"), text)
      val reloaded = MapConfig.load(mapPath.toString)
      assert(reloaded.databases.map(_.name) == Seq("app", "aux"))
      val ev = reloaded.databases.find(_.name == "app").get.tables("events")
      assert(ev.lang.contains("sql"), ev)
      assert(MapConfig.mappings(reloaded.databases.find(_.name == "app").get)
        .find(_.sourceTable == "events").get.filter.contains("value > 1"))
    } finally srv.stop()
  }

  test("JWT auth: HS256 only, role enforcement, expiry") {
    val mapPath = freshMap("adminjwt")
    val key = "graft-test-secret".getBytes("UTF-8")
    val srv = AdminHttp.start(spark, mapPath, s"${mapPath.getParent}/targets",
      jwtKey = Some(key))
    try {
      val p = srv.port
      val admin = AdminHttp.signJwt(key, "admin")
      val viewer = AdminHttp.signJwt(key, "viewer")
      assert(req(p, "GET", "/healthz").statusCode() == 200, "non-/api skips auth")
      assert(req(p, "GET", "/api/map").statusCode() == 401, "no token")
      assert(req(p, "GET", "/api/map", token = Some("garbage")).statusCode() == 401)
      assert(req(p, "GET", "/api/map",
        token = Some(AdminHttp.signJwt("wrong-key".getBytes, "admin")))
        .statusCode() == 401, "bad signature")
      // alg downgrade: unsigned token with alg=none must be rejected
      def enc(s: String) = java.util.Base64.getUrlEncoder.withoutPadding
        .encodeToString(s.getBytes("UTF-8"))
      val none = enc("""{"alg":"none","typ":"JWT"}""") + "." +
        enc("""{"role":"admin"}""") + "."
      assert(req(p, "GET", "/api/map", token = Some(none)).statusCode() == 401)
      // expired token
      val expired = AdminHttp.signJwt(key, "admin",
        expSec = System.currentTimeMillis() / 1000 - 10)
      assert(req(p, "GET", "/api/map", token = Some(expired)).statusCode() == 401)
      // roles: viewer reads, cannot write; admin writes
      val vr = req(p, "GET", "/api/map", token = Some(viewer))
      assert(vr.statusCode() == 200)
      // CORS headers ARE emitted once auth gates the API (browser clients
      // still need them; mutations now require a bearer token)
      assert(vr.headers().firstValue("Access-Control-Allow-Origin")
        .orElse("") == "*")
      assert(req(p, "POST", "/api/db", """{"name":"x"}""",
        token = Some(viewer)).statusCode() == 403)
      assert(req(p, "POST", "/api/db", """{"name":"x"}""",
        token = Some(admin)).statusCode() == 201)
      // path-normalization bypass: "//api/..." must be gated like
      // "/api/..." (the JDK server may 400 it outright; what matters is
      // that it can never SUCCEED unauthenticated and never mutates)
      assert(req(p, "GET", "//api/map").statusCode() >= 400,
        "collapsed-empty-segment paths must not bypass auth")
      assert(req(p, "POST", "//api/db", """{"name":"y"}""").statusCode() >= 400)
      assert(!Files.readString(mapPath).contains("\"y\""),
        "an unauthenticated double-slash mutation must not land")
    } finally srv.stop()
  }
}
