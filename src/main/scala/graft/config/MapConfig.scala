package graft.config

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import graft.model.{TableMapping, TableMode}

import java.nio.file.{Files, Paths}

/** Declarative mapping-file loader — the analog of the reference's YAML map
  * (`streamer/map.go:17-141`) / SQLite config schema
  * (`streamer/migrations/0001_initial.sql:1-24`): a list of source
  * databases, each with one or more tenant URLs (sid) and a table map
  * carrying replication type, destination target, optional row filter,
  * optional column-transform map, and optional physical-partition regex.
  *
  * Two accepted shapes, auto-detected from the top-level node (extension
  * picks the syntax only: `.yaml`/`.yml` parse as YAML, anything else as
  * JSON — both via Jackson, which ships on the Spark classpath):
  *
  * Native (top-level object):
  * {{{
  * { "databases": [ {
  *     "name": "db1",
  *     "urls": [ {"url": "wal/db1", "sid": "s0"} ],
  *     "tables": {
  *       "t1": {"type": "clone", "target": "t1",
  *              "filter": "value > 10",
  *              "set": {"c": "upper(c)"},
  *              "partitions_regex": "t1_[0-9]+"}
  *     } } ] }
  * }}}
  *
  * Reference (top-level LIST — the exact schema of the reference's
  * `map.yaml`, `streamer/map.go:17-43`, and of its SQLite config-DB JSON
  * export, `map.go:45-91`): `database:` instead of `name:`, the same
  * urls/tables fields, and since a kuvasz map's filter/set expressions
  * are CEL, tables in THIS shape default to `lang: cel` (override with an
  * explicit `lang: sql`). The config-DB export's `db_id`/`url_id`/`tbl_id`
  * and the declared-but-unread `insert` field (`map.go:38` — no reference
  * code path consumes it) are accepted and ignored, with a warning for
  * `insert`. A kuvasz `map.yaml` or a `ReadMapDatabase` dump therefore
  * ports verbatim:
  * {{{
  * - database: db1
  *   urls:
  *     - url: wal/db1
  *       sid: s0
  *   tables:
  *     public.t1:
  *       type: clone
  *       filter: value > 10
  * }}}
  * Defaults mirror `map.go:93-141`: type=clone, target=source name.
  */
object MapConfig {

  /** @param format event-log encoding at `url`: "parquet" (default — the
    *               WAL-shaped parquet event log) or "pgoutput"
    *               (self-contained pgoutput chunk files, decoded by
    *               graft.sources.PgOutput — the logical-replication wire
    *               path). */
  final case class UrlEntry(url: String, sid: String,
                            format: Option[String] = None)
  /** @param signatures true = maintain a companion near-dup signatures
    *                   lake table per applied micro-batch (SignatureStore;
    *                   clone/append modes only). The orchestrator places
    *                   it at `<targetsRoot>/<target>_signatures`.
    * @param lang expression language of `filter` and `set` values: "sql"
    *             (default — Spark SQL) or "cel" (the reference's language;
    *             translated once at map-compile time via [[Cel.translate]],
    *             so a kuvasz map file ports verbatim). Unknown values fail
    *             loudly at load, matching the loader's typo policy. */
  /** @param labels true = maintain a companion duplicate-cluster label
    *               table per applied micro-batch (LabelStore; requires
    *               `signatures: true` — labels fold off the signature
    *               table). Placed at `<targetsRoot>/<target>_labels`.
    * @param text_col the target column the signature/label companions
    *                 treat as the document text (default "text"). */
  final case class TableEntry(
      `type`: Option[String],
      target: Option[String],
      filter: Option[String],
      set: Option[Map[String, String]],
      partitions_regex: Option[String],
      signatures: Option[Boolean] = None,
      lang: Option[String] = None,
      labels: Option[Boolean] = None,
      text_col: Option[String] = None)
  final case class SourceDatabase(name: String, urls: Seq[UrlEntry],
                                  tables: Map[String, TableEntry])
  final case class DbMap(databases: Seq[SourceDatabase])

  // ---- reference-shape mirror (map.go:17-43 + the config-DB export ids)
  final case class RefUrl(url: String, sid: String,
                          format: Option[String] = None,
                          url_id: Option[Long] = None)
  final case class RefTable(
      `type`: Option[String] = None,
      target: Option[String] = None,
      filter: Option[String] = None,
      set: Option[Map[String, String]] = None,
      insert: Option[String] = None,
      partitions_regex: Option[String] = None,
      signatures: Option[Boolean] = None,
      lang: Option[String] = None,
      labels: Option[Boolean] = None,
      text_col: Option[String] = None,
      tbl_id: Option[Long] = None)
  final case class RefDb(database: String, urls: Seq[RefUrl],
                         tables: Option[Map[String, RefTable]],
                         db_id: Option[Long] = None)

  // NON_ABSENT: None fields stay OUT of rendered files (a `type: null`
  // line would read back fine here but trip the reference's own loader)
  private val mapper = new ObjectMapper().registerModule(DefaultScalaModule)
    .setSerializationInclusion(
      com.fasterxml.jackson.annotation.JsonInclude.Include.NON_ABSENT)
  private val yamlMapper =
    new ObjectMapper(new YAMLFactory()).registerModule(DefaultScalaModule)
      .setSerializationInclusion(
        com.fasterxml.jackson.annotation.JsonInclude.Include.NON_ABSENT)

  def parse(json: String): DbMap = parseWith(mapper, json)

  private def parseWith(m: ObjectMapper, text: String): DbMap = {
    // shape detection: a top-level array is the reference schema (and the
    // reference's filter/set are CEL expressions — default lang follows)
    val root = m.readTree(text)
    require(root != null && !root.isMissingNode && !root.isNull,
      "empty map config")
    if (root.isArray) {
      val dbs = m.convertValue(root,
        classOf[Array[RefDb]]).toSeq.map { r =>
        require(r.database != null && r.database.nonEmpty,
          "reference-shape map entry missing 'database'")
        SourceDatabase(
          name = r.database,
          urls = r.urls.map(u => UrlEntry(u.url, u.sid, u.format)),
          tables = r.tables.getOrElse(Map.empty).map { case (src, t) =>
            if (t.insert.isDefined)
              System.err.println(s"[map] WARNING: table '$src' sets " +
                "'insert', which no reference code path reads " +
                "(map.go:38) — accepted and ignored")
            src -> TableEntry(t.`type`, t.target, t.filter, t.set,
              t.partitions_regex, t.signatures,
              lang = t.lang.orElse(Some("cel")), labels = t.labels,
              text_col = t.text_col)
          })
      }
      DbMap(dbs)
    } else m.treeToValue(root, classOf[DbMap])
  }

  private def isYaml(path: String): Boolean =
    path.endsWith(".yaml") || path.endsWith(".yml")

  def load(path: String): DbMap = {
    val text = new String(Files.readAllBytes(Paths.get(path)), "UTF-8")
    if (isYaml(path)) parseWith(yamlMapper, text) else parse(text)
  }

  /** Serialize a map for write-back to `path`, format-preserving: a
    * `.yaml`/`.yml` store renders in the REFERENCE shape (so an admin-API
    * edit of a ported kuvasz map keeps the file loadable by the reference
    * itself), everything else as pretty JSON in the native shape. Tables
    * already carrying an explicit `lang` keep it; YAML tables WITHOUT one
    * were defaulted to CEL at load, so the round-trip pins `lang` only
    * when the in-memory entry says so. */
  def render(m: DbMap, path: String): String =
    if (isYaml(path)) {
      val refs = m.databases.map { d =>
        RefDb(d.name, d.urls.map(u => RefUrl(u.url, u.sid, u.format)),
          Some(d.tables.map { case (src, t) =>
            // lang is ALWAYS pinned explicitly in the reference shape:
            // in-memory None means SQL (the native default), but a
            // reference-shape load defaults to cel — rendering an
            // admin-created SQL entry without the key would silently
            // flip its filter/set to CEL on the next reload. Explicit
            // keys are harmless to the reference (yaml.v2 ignores
            // unknown fields) and lossless for us.
            src -> RefTable(t.`type`, t.target, t.filter, t.set, None,
              t.partitions_regex, t.signatures,
              lang = t.lang.orElse(Some("sql")), labels = t.labels,
              text_col = t.text_col)
          }))
      }
      yamlMapper.writeValueAsString(refs)
    } else mapper.writerWithDefaultPrettyPrinter().writeValueAsString(m)

  /** The companion near-dup signatures table NAME for a mapping, when its
    * table entry opts in (`"signatures": true`) — the single authority for
    * both the orchestrator (sink wiring) and graft.Main (metrics +
    * maintenance coverage); a divergence between those sites would
    * silently exempt the companion from vacuum/compact/metrics. */
  def signatureTarget(db: SourceDatabase, m: TableMapping): Option[String] =
    db.tables.get(m.sourceTable).flatMap(_.signatures).filter(identity)
      .map(_ => s"${m.target}_signatures")

  /** The companion duplicate-cluster LABEL table name for a mapping, when
    * its entry opts in (`"labels": true`) — same single-authority rule as
    * [[signatureTarget]] (orchestrator sink wiring + Main's metrics and
    * maintenance coverage must agree). */
  def labelTarget(db: SourceDatabase, m: TableMapping): Option[String] =
    db.tables.get(m.sourceTable).flatMap(_.labels).filter(identity)
      .map(_ => s"${m.target}_labels")

  /** The target column the signature/label companions sign as document
    * text for this mapping (`"text_col"`, default "text"). */
  def textColOf(db: SourceDatabase, m: TableMapping): String =
    db.tables.get(m.sourceTable).flatMap(_.text_col).getOrElse("text")

  /** Resolve one database's table map to engine mappings (the analog of
    * `RefreshMappingTable`, `streamer/mapping_table.go:85-180`). Callers
    * that know the source-row schema should use the [[mappings(db,kindsFor)*]]
    * overload: CEL translation is type-dependent (int `/` is `div`, `size`
    * vs `length`), and without hints every column infers Unknown. */
  def mappings(db: SourceDatabase): Seq[TableMapping] =
    mappings(db, (_, _) => Map.empty)

  /** [[Cel.translate]] kind hints from a Spark schema — the analog of the
    * reference building the CEL type env from PG column types
    * (`streamer/cel.go:94-127`). Unmapped Spark types are simply unhinted. */
  def kindsOf(schema: org.apache.spark.sql.types.StructType): Map[String, String] = {
    import org.apache.spark.sql.types._
    schema.fields.flatMap { f =>
      val k = f.dataType match {
        case StringType => Some("string")
        case BinaryType => Some("bytes")
        case ByteType | ShortType | IntegerType | LongType => Some("int")
        case FloatType | DoubleType | _: DecimalType => Some("double")
        case BooleanType => Some("bool")
        case TimestampType | TimestampNTZType | DateType => Some("timestamp")
        case _: ArrayType => Some("list")
        case _: MapType => Some("map")
        case _ => None
      }
      k.map(f.name -> _)
    }.toMap
  }

  /** As [[mappings(db)*]], with `kindsFor(sourceTable, resolvedTarget)`
    * supplying per-column kind hints for type-dependent CEL translation
    * from the caller's schema authority (TableSpec / lake schema). */
  def mappings(db: SourceDatabase,
               kindsFor: (String, String) => Map[String, String]): Seq[TableMapping] =
    db.tables.toSeq.sortBy(_._1).map { case (src, t) =>
      val target = t.target.getOrElse(src)
      val xl: String => String = t.lang.map(_.toLowerCase) match {
        case None | Some("sql") => identity
        case Some("cel") => e =>
          try Cel.translate(e, kindsFor(src, target))
          catch {
            case ce: Cel.CelError => throw new IllegalArgumentException(
              s"table '$src': cannot translate CEL expression: ${ce.getMessage}", ce)
          }
        case Some(other) => throw new IllegalArgumentException(
          s"table '$src': unknown expression lang '$other' (supported: sql, cel)")
      }
      TableMapping(
        sourceTable = src,
        target = target,
        mode = TableMode.parse(t.`type`.getOrElse("clone")),
        partitionsRegex = t.partitions_regex,
        filter = t.filter.map(xl),
        set = t.set.map(_.toSeq.sortBy(_._1).map { case (c, e) => c -> xl(e) }))
    }
}
