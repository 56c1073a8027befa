package graft

import graft.config.MapConfig
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Map-store formats: the native JSON shape, the reference's `map.yaml`
  * schema (`streamer/map.go:17-43` — top-level list, `database:` key,
  * CEL filter/set), and the reference's SQLite config-DB JSON export
  * (`map.go:45-91` — same shape + ids). A kuvasz deployment's existing
  * map must load VERBATIM, expressions included. */
class MapConfigSpec extends AnyFunSuite {

  private val refYaml =
    """- database: db1
      |  urls:
      |    - url: wal/db1
      |      sid: s0
      |    - url: wal/db1b
      |      sid: s1
      |  tables:
      |    public.orders:
      |      type: clone
      |      filter: amount > 10 && status.startsWith("ok")
      |    audit_log:
      |      type: append
      |      target: audit
      |      insert: deferred
      |- database: db2
      |  urls:
      |    - url: wal/db2
      |      sid: s2
      |  tables: {}
      |""".stripMargin

  private def writeTmp(name: String, text: String): String = {
    val f = Files.createTempFile("graft-map-", name)
    Files.writeString(f, text)
    f.toString
  }

  test("reference map.yaml loads verbatim: list shape, database key, " +
       "defaults, lang=cel") {
    val m = MapConfig.load(writeTmp(".yaml", refYaml))
    assert(m.databases.map(_.name) == Seq("db1", "db2"))
    assert(m.databases.head.urls ==
      Seq(MapConfig.UrlEntry("wal/db1", "s0"),
          MapConfig.UrlEntry("wal/db1b", "s1")))
    val t = m.databases.head.tables
    // reference-shape tables default to the reference's expression language
    assert(t("public.orders").lang.contains("cel"))
    assert(t("audit_log").target.contains("audit"))
    // the CEL filter translates at mapping-compile time (map.go's filters
    // are CEL programs; startsWith is a CEL method, not Spark SQL)
    val maps = MapConfig.mappings(m.databases.head,
      (_, _) => Map("amount" -> "int", "status" -> "string"))
    val f = maps.find(_.sourceTable == "public.orders").get.filter.get
    assert(f.toLowerCase.contains("startswith("), f)
    assert(!f.contains(".startsWith"), f)
  }

  test("config-DB JSON export loads: top-level array + ids accepted") {
    val exportJson =
      """[{"db_id": 1, "database": "db1",
        |  "urls": [{"url_id": 7, "url": "wal/db1", "sid": "s0"}],
        |  "tables": {"t1": {"tbl_id": 3, "type": "clone", "target": "t1"}}
        |}]""".stripMargin
    val m = MapConfig.load(writeTmp(".json", exportJson))
    assert(m.databases.head.name == "db1")
    assert(m.databases.head.tables("t1").lang.contains("cel"))
  }

  test("native JSON shape still loads with lang defaulting to sql") {
    val native =
      """{"databases": [{"name": "db1",
        |  "urls": [{"url": "wal/db1", "sid": "s0"}],
        |  "tables": {"t1": {"type": "clone", "filter": "v > 1"}}}]}
        |""".stripMargin
    val m = MapConfig.load(writeTmp(".json", native))
    assert(m.databases.head.tables("t1").lang.isEmpty)
    assert(MapConfig.mappings(m.databases.head).head.filter.contains("v > 1"))
  }

  test("yaml render round-trips through the reference shape") {
    val path = writeTmp(".yaml", refYaml)
    val m = MapConfig.load(path)
    val rendered = MapConfig.render(m, path)
    // reference shape: a top-level list, database key, no nulls
    assert(rendered.contains("database:"))
    assert(!rendered.contains("null"), rendered)
    val path2 = writeTmp(".yaml", rendered)
    assert(MapConfig.load(path2) == m)
  }

  test("typos fail loudly in both shapes") {
    intercept[Exception] {
      MapConfig.load(writeTmp(".yaml",
        "- database: d\n  urls: []\n  tabels: {}\n"))
    }
    intercept[Exception] {
      MapConfig.load(writeTmp(".json",
        """{"databases": [{"name": "d", "urls": [], "tabels": {}}]}"""))
    }
  }
}
