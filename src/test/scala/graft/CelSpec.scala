package graft

import graft.config.{Cel, MapConfig}
import org.apache.spark.sql.functions.expr
import org.scalatest.funsuite.AnyFunSuite

/** The CEL → Spark SQL translator is verified SEMANTICALLY: every rule is
  * evaluated through Catalyst against a typed one-row env and compared to
  * the value the reference's CEL evaluator defines (0-based indices,
  * end-exclusive ranges, truncating int division, 0-based month, …) — not
  * just string-compared, so an emitted expression that parses but computes
  * the wrong thing fails here before it can pass rows it shouldn't. */
class CelSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private lazy val env = spark.sql(
    """SELECT
      |  'hello world' AS s, 'purchase' AS event_type,
      |  CAST(NULL AS STRING) AS props, 'order' AS type,
      |  42L AS n, 7L AS m, 2.5D AS d,
      |  array(1L, 2L, 3L) AS xs, array('a', 'b') AS tags,
      |  map('k', 'v') AS mp,
      |  CAST('2026-03-15 10:30:45' AS TIMESTAMP) AS ts,
      |  CAST('abc' AS BINARY) AS bin
      |""".stripMargin)

  private val hints = Map("s" -> "string", "n" -> "int", "m" -> "int",
    "xs" -> "list", "tags" -> "list", "mp" -> "map", "ts" -> "timestamp")

  private def eval(cel: String): Any =
    env.select(expr(Cel.translate(cel, hints)).as("r")).head().get(0)

  // ---- strings (built-ins + ext.Strings)

  test("substring / charAt / indexOf are 0-based, end-exclusive") {
    assert(eval("s.substring(0, 5)") == "hello")
    assert(eval("s.substring(6)") == "world")
    assert(eval("s.charAt(1)") == "e")
    assert(eval("s.indexOf(\"world\")") == 6L)
    assert(eval("s.indexOf(\"zz\")") == -1L)
    assert(eval("s.indexOf(\"o\", 5)") == 7L) // from-index variant
  }

  test("lastIndexOf via the reverse trick") {
    assert(eval("s.lastIndexOf(\"o\")") == 7L)
    assert(eval("\"abcab\".lastIndexOf(\"ab\")") == 3L)
    assert(eval("s.lastIndexOf(\"zz\")") == -1L)
  }

  test("case / trim / replace / reverse / contains / startsWith / endsWith") {
    assert(eval("s.upperAscii()") == "HELLO WORLD")
    assert(eval("\"AbC\".lowerAscii()") == "abc")
    assert(eval("\"  a  \".trim()") == "a")
    assert(eval("s.replace(\"l\", \"L\")") == "heLLo worLd")
    assert(eval("\"ab\".reverse()") == "ba")
    assert(eval("s.contains(\"lo w\")") == true)
    assert(eval("s.startsWith(\"he\")") == true)
    assert(eval("s.endsWith(\"ld\")") == true)
  }

  test("split is LITERAL in CEL — regex metachars are quoted") {
    assert(eval("\"a.b.c\".split(\".\")[1]") == "b")
    assert(eval("s.split(\" \")[0]") == "hello")
  }

  test("format / join / size") {
    assert(eval("\"%s-%d\".format([\"a\", 3])") == "a-3")
    assert(eval("tags.join(\"-\")") == "a-b")
    assert(eval("tags.join()") == "ab")
    assert(eval("s.size()") == 11)
    assert(eval("size(s)") == 11)
    assert(eval("xs.size()") == 3) // hinted list -> size, not length
    assert(eval("size(mp)") == 1)
  }

  // ---- operators, typing, precedence

  test("int division truncates; unhinted '/' stays double") {
    assert(eval("n / m") == 6L) // both hinted int -> div
    assert(eval("(0 - 7) / 2") == -3L) // truncation toward zero
    assert(eval("d / 2.5") == 1.0)
  }

  test("+ concatenates strings and lists, adds numbers") {
    assert(eval("\"a\" + \"b\"") == "ab")
    assert(eval("(s + \"!\").size()") == 12)
    assert(eval("n + m") == 49L)
    assert(eval("(xs + [4]).size()") == 4)
  }

  test("precedence: && binds tighter than ||; ternary; not") {
    assert(eval("false && true || true") == true)
    assert(eval("true ? 1 : 2") == 1L)
    assert(eval("!(n > 100)") == true)
    assert(eval("n % 5 == 2") == true)
  }

  test("in: literal list -> IN, list expr -> array_contains, map -> key") {
    assert(eval("2 in [1, 2, 3]") == true)
    assert(eval("5 in xs") == false)
    assert(eval("\"k\" in mp") == true)
  }

  test("indexing: lists 0-based, maps by key") {
    assert(eval("xs[0]") == 1L)
    assert(eval("mp[\"k\"]") == "v")
  }

  test("literals: hex, uint suffix, exponent doubles, escapes") {
    assert(eval("0xFF == 255") == true)
    assert(eval("5u == 5") == true)
    assert(eval("1e2 == 100.0") == true)
    assert(eval("\"\\t\".size()") == 1)
    assert(eval("\"it\\\"s\".size()") == 4)
  }

  // ---- comprehension macros

  test("exists / all / map / filter / exists_one") {
    assert(eval("xs.exists(x, x == 2)") == true)
    assert(eval("xs.all(x, x > 0)") == true)
    assert(eval("xs.all(x, x > 1)") == false)
    assert(eval("xs.map(x, x * 2)[0]") == 2L)
    assert(eval("xs.filter(x, x > 1).size()") == 2)
    assert(eval("xs.exists_one(x, x == 2)") == true)
    assert(eval("xs.map(x, x > 1, x * 10)[0]") == 20L) // 3-arg filter+map
  }

  // ---- ext.Sets / ext.Lists / ext.Math / ext.Regex / ext.Encoders

  test("sets.contains / intersects / equivalent") {
    assert(eval("sets.contains(tags, [\"a\"])") == true)
    assert(eval("sets.contains(tags, [\"z\"])") == false)
    assert(eval("sets.intersects(tags, [\"a\", \"z\"])") == true)
    assert(eval("sets.equivalent(tags, [\"b\", \"a\"])") == true)
  }

  test("lists.range / flatten / distinct / sort / slice") {
    assert(eval("lists.range(3)[2]") == 2L)
    assert(eval("lists.range(0).size()") == 0)
    assert(eval("[[1], [2]].flatten()[1]") == 2L)
    assert(eval("[2, 1, 2].distinct().size()") == 2)
    assert(eval("[2, 1].sort()[0]") == 1L)
    assert(eval("xs.slice(1, 3).size()") == 2) // end-exclusive
  }

  test("math namespace") {
    assert(eval("math.greatest(n, m)") == 42L)
    assert(eval("math.least(n, m, 3)") == 3L)
    assert(eval("math.abs(0 - 5)") == 5L)
    assert(eval("math.ceil(2.1)") == 3L)
    assert(eval("math.floor(2.9)") == 2L)
    assert(eval("math.bitAnd(6, 3)") == 2L)
    assert(eval("math.bitOr(4, 1)") == 5L)
    assert(eval("math.bitXor(6, 3)") == 5L)
    assert(eval("math.bitShiftLeft(1, 4)") == 16L)
    assert(eval("math.bitShiftRight(16, 4)") == 1L)
    assert(eval("math.sign(0 - 9)") == -1L)
  }

  test("regex.extract returns the capture group as NULL-able optional") {
    assert(eval("regex.extract(\"id-42\", \"id-(\\\\d+)\")") == "42")
    assert(eval("regex.extract(s, \"zz\").orValue(\"none\")") == "none")
    assert(eval("regex.replace(s, \"o\", \"0\")") == "hell0 w0rld")
    assert(eval("s.matches(\"wor\")") == true) // partial match, like CEL/RE2
    assert(eval("s.matches(\"^wor$\")") == false)
  }

  test("base64 / sliceBytes") {
    assert(eval("base64.encode(bin)") == "YWJj")
    assert(eval("string(base64.decode(\"YWJj\"))") == "abc")
    assert(eval("string(bin.sliceBytes(0, 2))") == "ab")
  }

  // ---- bindings, optionals, timestamps, env conventions

  test("cel.bind inlines; optMap guards") {
    assert(eval("cel.bind(x, s.size(), x > 2 && x < 100)") == true)
    assert(eval("props.optMap(p, p + \"!\").orValue(\"-\")") == "-")
    assert(eval("s.optMap(v, v.size())") == 11)
  }

  test("orValue -> coalesce; hasValue -> IS NOT NULL") {
    assert(eval("props.orValue(\"anon\")") == "anon")
    assert(eval("s.orValue(\"anon\")") == "hello world")
    assert(eval("props.hasValue()") == false)
  }

  test("timestamp accessors use CEL's 0-based conventions") {
    assert(eval("ts.getFullYear()") == 2026)
    assert(eval("ts.getMonth()") == 2) // March, CEL 0-11
    assert(eval("ts.getDate()") == 15) // 1-based
    assert(eval("ts.getDayOfMonth()") == 14) // 0-based
    assert(eval("ts.getHours()") == 10)
    assert(eval("ts.getMinutes()") == 30)
    assert(eval("timestamp(\"2026-03-15T10:30:45Z\") == ts") == true)
    assert(eval("(ts + duration(\"1h30m\")).getHours()") == 12)
    // fractional hours/minutes fold into make_interval's DECIMAL secs —
    // the INT hour/min parameters would truncate 1.5h to 1h silently
    assert(eval("(ts + duration(\"1.5h\")).getHours()") == 12)
    assert(eval("(ts + duration(\"1.5h\")).getMinutes()") == 0)
    assert(eval("(ts + duration(\"0.5m\")).getSeconds()") == 15)
    assert(eval("ts < now") == true)
  }

  test("implicit now and the _type reserved-word rename") {
    assert(eval("now > timestamp(\"2020-01-01T00:00:00Z\")") == true)
    assert(eval("_type == \"order\"") == true) // hits the `type` column
  }

  // ---- fail-loud boundary

  test("unsupported constructs fail at translate time, with position") {
    def bad(cel: String): Unit = {
      val e = intercept[Cel.CelError](Cel.translate(cel))
      assert(e.getMessage.contains("at offset"))
    }
    bad("foo.bar") // nested field access
    bad("m.transformMapEntries(k, v, v)") // TwoVarComprehensions
    bad("s.split(sep)") // non-literal separator (Spark split is regex)
    bad("duration(x)") // non-literal duration
    bad("duration(\"1h\") + duration(\"5ns\")") // sub-ms precision
    bad("has(a.b)")
    bad("1 2") // trailing input
    bad("regex.replace(s, \"a\", \"b\", 1)") // count-limited replace
    bad("s.lastIndexOf(\"o\", 5)") // offset form would silently search ALL
    intercept[Cel.CelError](Cel.translate("x > 1", Map("x" -> "jsonb")))
  }

  test("x in [] is FALSE, not the invalid SQL `IN ()`") {
    assert(eval("event_type in []") == false)
    assert(eval("!(event_type in [])") == true)
  }

  // ---- null semantics (SQL `= NULL` is always NULL — must be IS NULL)

  test("null comparisons translate to IS [NOT] NULL, not = NULL") {
    assert(eval("props == null") == true) // props is a NULL column
    assert(eval("props != null") == false)
    assert(eval("null == props") == true)
    assert(eval("s == null") == false)
    assert(eval("s != null") == true)
    assert(eval("null == null") == true)
    assert(eval("null != null") == false)
    // the round-trip that silently dropped every row before the fix:
    // a keep-undeleted filter over a NULL column must be TRUE, not NULL
    assert(eval("props == null || s == \"x\"") == true)
  }

  test("regex group counting ignores '(' inside character classes") {
    // zero capture groups -> regexp_extract group 0 (whole match), where
    // counting the class-literal '(' produced group 1 and a runtime error
    assert(eval("regex.extract(\"a(b\", \"a[(]b\")") == "a(b")
    // trailing-position '(' + a real group still counts
    assert(eval("regex.extract(\"xab\", \"x(ab)\")") == "ab")
  }

  test("lists.range clamps a runtime-negative length to empty") {
    assert(eval("lists.range(n - 44)") == Seq.empty) // 42 - 44 = -2
    assert(eval("lists.range(3)") == Seq(0L, 1L, 2L))
  }

  // ---- map-file integration (the production path)

  test("MapConfig kind hints drive type-dependent translation") {
    import org.apache.spark.sql.types._
    val db = MapConfig.parse(
      """{"databases":[{"name":"d","urls":[{"url":"u","sid":"s0"}],
        |"tables":{"t":{"target":"t2","lang":"cel",
        |"filter":"value / 2 == 5"}}}]}""".stripMargin)
      .databases.head
    val schema = StructType(Seq(StructField("value", LongType)))
    // hinted: CEL int division truncates -> SQL `div` (11 div 2 == 5 TRUE)
    val hinted = MapConfig.mappings(db,
      (_, tgt) => { assert(tgt == "t2"); MapConfig.kindsOf(schema) }).head
    assert(hinted.filter.get.contains("div"), hinted.filter.get)
    // unhinted falls to Unknown: plain `/` (double division) — the exact
    // silent row-flip the hints exist to prevent
    val unhinted = MapConfig.mappings(db).head
    assert(!unhinted.filter.get.contains("div"))
    // kindsOf maps the full Spark type surface
    val kinds = MapConfig.kindsOf(StructType(Seq(
      StructField("s", StringType), StructField("b", BinaryType),
      StructField("i", IntegerType), StructField("l", LongType),
      StructField("f", DoubleType), StructField("o", BooleanType),
      StructField("t", TimestampType), StructField("a", ArrayType(LongType)),
      StructField("m", MapType(StringType, StringType)))))
    assert(kinds == Map("s" -> "string", "b" -> "bytes", "i" -> "int",
      "l" -> "int", "f" -> "double", "o" -> "bool", "t" -> "timestamp",
      "a" -> "list", "m" -> "map"))
  }

  test("MapConfig lang=cel translates filter and set at compile time") {
    val db = MapConfig.parse(
      """{"databases":[{"name":"d","urls":[{"url":"u","sid":"s0"}],
        |"tables":{"t":{"target":"t2","lang":"cel",
        |"filter":"value > 10.0 && name.startsWith(\"a\")",
        |"set":{"name_up":"name.upperAscii()"}}}}]}""".stripMargin)
      .databases.head
    val m = MapConfig.mappings(db).head
    assert(m.filter.contains("((`value` > 10.0D) AND startswith(`name`, 'a'))"))
    assert(m.set.get == Seq("name_up" -> "upper(`name`)"))
  }

  test("MapConfig lang=sql (and absent) passes expressions through") {
    val db = MapConfig.parse(
      """{"databases":[{"name":"d","urls":[{"url":"u","sid":"s0"}],
        |"tables":{"t":{"filter":"value > 10","lang":"sql"}}}]}""".stripMargin)
      .databases.head
    assert(MapConfig.mappings(db).head.filter.contains("value > 10"))
  }

  test("MapConfig unknown lang and untranslatable CEL fail loudly") {
    val bad = MapConfig.parse(
      """{"databases":[{"name":"d","urls":[{"url":"u","sid":"s0"}],
        |"tables":{"t":{"filter":"x > 1","lang":"toml"}}}]}""".stripMargin)
      .databases.head
    val e = intercept[IllegalArgumentException](MapConfig.mappings(bad))
    assert(e.getMessage.contains("unknown expression lang"))
    val badCel = MapConfig.parse(
      """{"databases":[{"name":"d","urls":[{"url":"u","sid":"s0"}],
        |"tables":{"t":{"filter":"a.b.c > 1","lang":"cel"}}}]}""".stripMargin)
      .databases.head
    val e2 = intercept[IllegalArgumentException](MapConfig.mappings(badCel))
    assert(e2.getMessage.contains("cannot translate CEL"))
  }

  test("README worked example round-trips") {
    val sql = Cel.translate(
      "amount > 100.0 && _type != \"test\" && email.matches(\"@corp[.]com$\")")
    val got = spark.sql(
      s"SELECT $sql FROM VALUES (150.0, 'order', 'x@corp.com') AS t(amount, type, email)")
      .head().getBoolean(0)
    assert(got)
  }
}
