package graft.config

/** CEL → Spark SQL expression translator — the migration shim for map files
  * written against the reference's CEL evaluator (`streamer/cel.go:67-146`
  * registers the extension set; `streamer/process_message.go:116-135`
  * evaluates filter/set programs over the decoded row env). A kuvasz map
  * file ports without rewriting expressions: set `"lang": "cel"` on the
  * table entry and `MapConfig.mappings` routes `filter` and every `set`
  * value through [[translate]] at map-compile time, after which everything
  * downstream is an ordinary Catalyst expression (fail-open wrapper, P1/P2
  * application order, before-image translation all unchanged).
  *
  * Coverage is the CEL subset the reference actually enables — operators,
  * string/list/timestamp built-ins, `ext.Strings/Math/Lists/Sets/Regex/
  * Encoders/Bindings`, comprehension macros, optional-value accessors, the
  * custom `sliceBytes`, and the implicit `now` variable — with CEL's index
  * conventions preserved exactly (0-based substring/indexOf/charAt/slice,
  * 0-based getMonth/getDayOfMonth/getDayOfYear/getDayOfWeek, end-exclusive
  * ranges) by emitting the 1-based Spark arithmetic (`instr(s, x) - 1` IS
  * CEL `indexOf`: both yield -1/absent and 0-based/present). Anything
  * outside the subset fails loudly at translate time with the offending
  * position — never silently mistranslated.
  *
  * Typing: CEL is typed (the reference builds the env from PG column
  * types, `cel.go:94-127`); SQL strings are not. A tiny bottom-up kind
  * inference (literals, known function signatures, optional caller hints)
  * resolves the translations that genuinely depend on type:
  *   - `size(x)`   → `size` on lists/maps, `length` on strings/bytes
  *                   (default when unknown: `length` — the common row-env
  *                   case; pass `kinds` to override)
  *   - `a + b`     → `concat` on strings/lists, `+` otherwise
  *   - `a / b`     → `div` when both sides are ints (CEL int division
  *                   truncates), `/` otherwise
  *   - `x in y`    → `IN (…)` on literal lists, `array_contains` on list
  *                   exprs, `map_contains_key` on maps
  *   - `l[i]`      → `element_at(l, i + 1)` on lists (CEL is 0-based),
  *                   `element_at(m, k)` on maps
  * Known divergences, documented rather than hidden: CEL `regex.extract`
  * returns an optional → emitted as `nullif(regexp_extract(…), '')`, so an
  * empty-string match maps to NULL; replacement backrefs are `$1` in Spark
  * vs `\1` in CEL (literal replacements port as-is).
  */
object Cel {

  final class CelError(msg: String, val pos: Int)
      extends IllegalArgumentException(s"CEL: $msg (at offset $pos)")

  /** Column-kind hints for expressions whose translation is type-dependent:
    * name → one of "string", "bytes", "int", "double", "bool", "timestamp",
    * "list", "map". Unlisted columns are Unknown (defaults above apply). */
  def translate(cel: String, kinds: Map[String, String] = Map.empty): String = {
    val hints: Map[String, Kind] = kinds.map { case (k, v) =>
      k -> (v.toLowerCase match {
        case "string" | "text" | "uuid"          => KStr
        case "bytes" | "bytea" | "binary"        => KBytes
        case "int" | "int2" | "int4" | "int8" | "long" => KInt
        case "double" | "float8" | "float"       => KDouble
        case "bool" | "boolean"                  => KBool
        case "timestamp" | "timestamptz"         => KTs
        case "list" | "array"                    => KList
        case "map"                               => KMap
        case other => throw new CelError(s"unknown kind hint '$other' for column '$k'", 0)
      })
    }
    val toks = lex(cel)
    val p = new Parser(toks, cel)
    val ast = p.parseExpr()
    p.expectEof()
    new Emitter(hints).emit(ast, Map.empty)
  }

  // ---------------------------------------------------------------- kinds

  private sealed trait Kind
  private case object KStr extends Kind
  private case object KBytes extends Kind
  private case object KInt extends Kind
  private case object KDouble extends Kind
  private case object KBool extends Kind
  private case object KTs extends Kind
  private case object KDur extends Kind
  private case object KList extends Kind
  private case object KMap extends Kind
  private case object KUnknown extends Kind

  // ------------------------------------------------------------------ ast

  private sealed trait Node { def pos: Int }
  private final case class NInt(v: Long, pos: Int) extends Node
  private final case class NDouble(text: String, pos: Int) extends Node
  private final case class NStr(v: String, pos: Int) extends Node
  private final case class NBytes(v: Array[Byte], pos: Int) extends Node
  private final case class NBool(v: Boolean, pos: Int) extends Node
  private final case class NNull(pos: Int) extends Node
  private final case class NId(name: String, pos: Int) extends Node
  private final case class NList(items: Seq[Node], pos: Int) extends Node
  private final case class NMapLit(entries: Seq[(Node, Node)], pos: Int) extends Node
  private final case class NIndex(recv: Node, idx: Node, pos: Int) extends Node
  private final case class NSelect(recv: Node, field: String, pos: Int) extends Node
  private final case class NCall(recv: Option[Node], fn: String, args: Seq[Node],
                                 pos: Int) extends Node
  private final case class NUnary(op: String, e: Node, pos: Int) extends Node
  private final case class NBin(op: String, l: Node, r: Node, pos: Int) extends Node
  private final case class NTernary(c: Node, t: Node, f: Node, pos: Int) extends Node

  // ---------------------------------------------------------------- lexer

  private sealed trait Tok { def pos: Int }
  private final case class TId(s: String, pos: Int) extends Tok
  private final case class TInt(v: Long, pos: Int) extends Tok
  private final case class TDouble(text: String, pos: Int) extends Tok
  private final case class TStr(v: String, pos: Int) extends Tok
  private final case class TBytes(v: Array[Byte], pos: Int) extends Tok
  private final case class TOp(s: String, pos: Int) extends Tok
  private final case class TEof(pos: Int) extends Tok

  private def lex(src: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = src.length
    def err(m: String, p: Int) = throw new CelError(m, p)
    while (i < n) {
      val c = src.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '/' && i + 1 < n && src.charAt(i + 1) == '/') {
        while (i < n && src.charAt(i) != '\n') i += 1
      } else if (c.isDigit ||
                 (c == '.' && i + 1 < n && src.charAt(i + 1).isDigit)) {
        val start = i
        if (c == '0' && i + 1 < n &&
            (src.charAt(i + 1) == 'x' || src.charAt(i + 1) == 'X')) {
          i += 2
          while (i < n && isHex(src.charAt(i))) i += 1
          val v = java.lang.Long.parseLong(src.substring(start + 2, i), 16)
          if (i < n && (src.charAt(i) == 'u' || src.charAt(i) == 'U')) i += 1
          out += TInt(v, start)
        } else {
          var isDouble = false
          while (i < n && src.charAt(i).isDigit) i += 1
          if (i < n && src.charAt(i) == '.' && i + 1 < n && src.charAt(i + 1).isDigit) {
            isDouble = true; i += 1
            while (i < n && src.charAt(i).isDigit) i += 1
          }
          if (i < n && (src.charAt(i) == 'e' || src.charAt(i) == 'E')) {
            isDouble = true; i += 1
            if (i < n && (src.charAt(i) == '+' || src.charAt(i) == '-')) i += 1
            while (i < n && src.charAt(i).isDigit) i += 1
          }
          if (!isDouble && i < n && (src.charAt(i) == 'u' || src.charAt(i) == 'U')) {
            out += TInt(src.substring(start, i).toLong, start); i += 1
          } else if (isDouble) out += TDouble(src.substring(start, i), start)
          else out += TInt(src.substring(start, i).toLong, start)
        }
      } else if (c == '"' || c == '\'') {
        val (s, ni) = lexString(src, i, raw = false)
        out += TStr(s, i); i = ni
      } else if ((c == 'r' || c == 'R') && i + 1 < n &&
                 (src.charAt(i + 1) == '"' || src.charAt(i + 1) == '\'')) {
        val (s, ni) = lexString(src, i + 1, raw = true)
        out += TStr(s, i); i = ni
      } else if ((c == 'b' || c == 'B') && i + 1 < n &&
                 (src.charAt(i + 1) == '"' || src.charAt(i + 1) == '\'')) {
        val (s, ni) = lexString(src, i + 1, raw = false)
        out += TBytes(s.getBytes("ISO-8859-1"), i); i = ni
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (src.charAt(i).isLetterOrDigit || src.charAt(i) == '_')) i += 1
        out += TId(src.substring(start, i), start)
      } else {
        val two = if (i + 1 < n) src.substring(i, i + 2) else ""
        two match {
          case "==" | "!=" | "<=" | ">=" | "&&" | "||" =>
            out += TOp(two, i); i += 2
          case _ =>
            c match {
              case '(' | ')' | '[' | ']' | '{' | '}' | ',' | '.' | '?' | ':' |
                   '<' | '>' | '+' | '-' | '*' | '/' | '%' | '!' =>
                out += TOp(c.toString, i); i += 1
              case _ => err(s"unexpected character '$c'", i)
            }
        }
      }
    }
    out += TEof(n)
    out.result()
  }

  private def isHex(c: Char) = c.isDigit || ('a' to 'f').contains(c.toLower)

  /** Lex one quoted string starting at the quote; returns (value, nextIdx). */
  private def lexString(src: String, from: Int, raw: Boolean): (String, Int) = {
    val q = src.charAt(from)
    val sb = new StringBuilder
    var i = from + 1
    val n = src.length
    while (i < n && src.charAt(i) != q) {
      val c = src.charAt(i)
      if (c == '\\' && !raw) {
        if (i + 1 >= n) throw new CelError("dangling escape", i)
        val e = src.charAt(i + 1)
        i += 2
        e match {
          case 'a' => sb += '\u0007'
          case 'b' => sb += '\b'
          case 'f' => sb += '\f'
          case 'n' => sb += '\n'
          case 'r' => sb += '\r'
          case 't' => sb += '\t'
          case 'v' => sb += '\u000B'
          case '\\' => sb += '\\'
          case '\'' => sb += '\''
          case '"' => sb += '"'
          case '`' => sb += '`'
          case '?' => sb += '?'
          case 'x' | 'X' =>
            sb += Integer.parseInt(src.substring(i, i + 2), 16).toChar; i += 2
          case 'u' =>
            sb += Integer.parseInt(src.substring(i, i + 4), 16).toChar; i += 4
          case 'U' =>
            sb.appendAll(Character.toChars(
              Integer.parseInt(src.substring(i, i + 8), 16))); i += 8
          case d if d >= '0' && d <= '7' =>
            sb += Integer.parseInt(src.substring(i - 1, i + 2), 8).toChar; i += 2
          case other => throw new CelError(s"unsupported escape '\\$other'", i - 1)
        }
      } else { sb += c; i += 1 }
    }
    if (i >= n) throw new CelError("unterminated string literal", from)
    (sb.toString, i + 1)
  }

  // --------------------------------------------------------------- parser

  private final class Parser(toks: Vector[Tok], src: String) {
    private var i = 0
    private def cur: Tok = toks(i)
    private def advance(): Tok = { val t = toks(i); i += 1; t }
    private def err(m: String): Nothing = throw new CelError(m, cur.pos)
    private def eatOp(s: String): Unit = cur match {
      case TOp(`s`, _) => i += 1
      case _ => err(s"expected '$s'")
    }
    private def peekOp(s: String): Boolean = cur match {
      case TOp(`s`, _) => true
      case _ => false
    }

    def expectEof(): Unit = cur match {
      case TEof(_) => ()
      case t => throw new CelError("trailing input", t.pos)
    }

    def parseExpr(): Node = {
      val c = parseOr()
      if (peekOp("?")) {
        val p = cur.pos; eatOp("?")
        val t = parseOr(); eatOp(":")
        val f = parseExpr()
        NTernary(c, t, f, p)
      } else c
    }

    private def parseOr(): Node = {
      var l = parseAnd()
      while (peekOp("||")) { val p = cur.pos; eatOp("||"); l = NBin("||", l, parseAnd(), p) }
      l
    }
    private def parseAnd(): Node = {
      var l = parseRel()
      while (peekOp("&&")) { val p = cur.pos; eatOp("&&"); l = NBin("&&", l, parseRel(), p) }
      l
    }
    private def parseRel(): Node = {
      var l = parseAdd()
      var more = true
      while (more) cur match {
        case TOp(op @ ("==" | "!=" | "<" | "<=" | ">" | ">="), p) =>
          i += 1; l = NBin(op, l, parseAdd(), p)
        case TId("in", p) =>
          i += 1; l = NBin("in", l, parseAdd(), p)
        case _ => more = false
      }
      l
    }
    private def parseAdd(): Node = {
      var l = parseMul()
      var more = true
      while (more) cur match {
        case TOp(op @ ("+" | "-"), p) => i += 1; l = NBin(op, l, parseMul(), p)
        case _ => more = false
      }
      l
    }
    private def parseMul(): Node = {
      var l = parseUnary()
      var more = true
      while (more) cur match {
        case TOp(op @ ("*" | "/" | "%"), p) => i += 1; l = NBin(op, l, parseUnary(), p)
        case _ => more = false
      }
      l
    }
    private def parseUnary(): Node = cur match {
      case TOp("!", p) => i += 1; NUnary("!", parseUnary(), p)
      case TOp("-", p) => i += 1; NUnary("-", parseUnary(), p)
      case _ => parsePostfix()
    }

    private def parsePostfix(): Node = {
      var e = parsePrimary()
      var more = true
      while (more) cur match {
        case TOp(".", p) =>
          i += 1
          val name = cur match {
            case TId(s, _) => i += 1; s
            case _ => err("expected identifier after '.'")
          }
          if (peekOp("(")) e = NCall(Some(e), name, parseArgs(), p)
          else e = NSelect(e, name, p)
        case TOp("[", p) =>
          i += 1
          val idx = parseExpr()
          eatOp("]")
          e = NIndex(e, idx, p)
        case _ => more = false
      }
      e
    }

    private def parseArgs(): Seq[Node] = {
      eatOp("(")
      val args = Seq.newBuilder[Node]
      if (!peekOp(")")) {
        args += parseExpr()
        while (peekOp(",")) { eatOp(","); args += parseExpr() }
      }
      eatOp(")")
      args.result()
    }

    private def parsePrimary(): Node = cur match {
      case TInt(v, p) => i += 1; NInt(v, p)
      case TDouble(t, p) => i += 1; NDouble(t, p)
      case TStr(s, p) => i += 1; NStr(s, p)
      case TBytes(b, p) => i += 1; NBytes(b, p)
      case TId("true", p) => i += 1; NBool(true, p)
      case TId("false", p) => i += 1; NBool(false, p)
      case TId("null", p) => i += 1; NNull(p)
      case TId(name, p) =>
        i += 1
        if (peekOp("(")) NCall(None, name, parseArgs(), p) else NId(name, p)
      case TOp("(", _) =>
        i += 1; val e = parseExpr(); eatOp(")"); e
      case TOp("[", p) =>
        i += 1
        val items = Seq.newBuilder[Node]
        if (!peekOp("]")) {
          items += parseExpr()
          while (peekOp(",")) { eatOp(","); items += parseExpr() }
        }
        eatOp("]")
        NList(items.result(), p)
      case TOp("{", p) =>
        i += 1
        val entries = Seq.newBuilder[(Node, Node)]
        if (!peekOp("}")) {
          def entry(): Unit = {
            val k = parseExpr(); eatOp(":"); entries += (k -> parseExpr())
          }
          entry()
          while (peekOp(",")) { eatOp(","); entry() }
        }
        eatOp("}")
        NMapLit(entries.result(), p)
      case t => err(s"unexpected token")
    }
  }

  // -------------------------------------------------------------- emitter

  /** A name in scope: either a cel.bind substitution (already-emitted SQL)
    * or a comprehension lambda variable (emitted bare). */
  private sealed trait Binding { def sql: String; def kind: Kind }
  private final case class Bound(sql: String, kind: Kind) extends Binding
  private final case class LambdaVar(name: String, kind: Kind) extends Binding {
    def sql: String = name
  }

  private final class Emitter(hints: Map[String, Kind]) {
    private def err(m: String, n: Node): Nothing = throw new CelError(m, n.pos)

    /** Spark SQL single-quoted string literal (backslash escaping is ON by
      * default in Spark's parser). */
    private def sqlStr(s: String): String = {
      val sb = new StringBuilder("'")
      s.foreach {
        case '\'' => sb ++= "\\'"
        case '\\' => sb ++= "\\\\"
        case '\n' => sb ++= "\\n"
        case '\r' => sb ++= "\\r"
        case '\t' => sb ++= "\\t"
        case c if c < ' ' => sb ++= f"\\u${c.toInt}%04X"
        case c => sb += c
      }
      (sb += '\'').toString
    }

    private def ident(name: String): String = s"`$name`"

    /** CEL split/contains-style LITERAL separators must not be interpreted
      * as regex by Spark's `split`. */
    private def regexQuote(s: String): String =
      s.flatMap(c => if ("\\^$.|?*+()[]{}".contains(c)) s"\\$c" else c.toString)

    /** idx + 1 with literal folding (CEL 0-based → SQL 1-based). */
    private def plus1(n: Node, env: Map[String, Binding]): String = n match {
      case NInt(v, _) => (v + 1).toString
      case _ => s"(${emit(n, env)} + 1)"
    }
    /** end - start with literal folding (CEL end-exclusive → SQL length). */
    private def lenOf(start: Node, end: Node, env: Map[String, Binding]): String =
      (start, end) match {
        case (NInt(a, _), NInt(b, _)) => (b - a).toString
        case _ => s"(${emit(end, env)} - ${emit(start, env)})"
      }

    def kindOf(n: Node, env: Map[String, Binding]): Kind = n match {
      case _: NInt => KInt
      case _: NDouble => KDouble
      case _: NStr => KStr
      case _: NBytes => KBytes
      case _: NBool => KBool
      case _: NNull => KUnknown
      case _: NList => KList
      case _: NMapLit => KMap
      case NId("now", _) => KTs
      case NId(name, _) =>
        env.get(name).map(_.kind).orElse(hints.get(name)).getOrElse(KUnknown)
      case NIndex(r, _, _) => KUnknown
      case NSelect(_, _, _) => KUnknown
      case NTernary(_, t, f, _) =>
        val kt = kindOf(t, env)
        if (kt != KUnknown) kt else kindOf(f, env)
      case NUnary("!", _, _) => KBool
      case NUnary(_, e, _) => kindOf(e, env)
      case NBin(op, l, r, _) => op match {
        case "&&" | "||" | "==" | "!=" | "<" | "<=" | ">" | ">=" | "in" => KBool
        case "+" | "-" | "*" | "/" | "%" =>
          (kindOf(l, env), kindOf(r, env)) match {
            case (KStr, _) | (_, KStr) => KStr
            case (KList, _) | (_, KList) => KList
            case (KDouble, _) | (_, KDouble) => KDouble
            case (KTs, _) | (_, KTs) => KTs
            case (KInt, KInt) => KInt
            case _ => KUnknown
          }
        case _ => KUnknown
      }
      case NCall(recv, fn, _, _) => fn match {
        case "size" | "indexOf" | "lastIndexOf" | "getFullYear" | "getMonth" |
             "getDate" | "getDayOfMonth" | "getDayOfYear" | "getDayOfWeek" |
             "getHours" | "getMinutes" | "getSeconds" | "getMilliseconds" |
             "int" => KInt
        case "double" => KDouble
        case "string" | "lowerAscii" | "upperAscii" | "substring" | "replace" |
             "trim" | "charAt" | "join" | "format" if recv.isDefined => KStr
        case "string" => KStr
        case "reverse" => // shared by strings and lists: follow the receiver
          recv.map(kindOf(_, env)).getOrElse(KUnknown)
        case "bool" | "matches" | "contains" | "startsWith" | "endsWith" |
             "exists" | "all" | "exists_one" | "hasValue" => KBool
        case "bytes" | "sliceBytes" | "decode" => KBytes
        case "encode" => KStr
        case "timestamp" => KTs
        case "duration" => KDur
        case "split" | "flatten" | "distinct" | "sort" | "slice" | "filter" |
             "map" | "range" => KList
        case _ => KUnknown
      }
    }

    def emit(n: Node, env: Map[String, Binding]): String = n match {
      case NInt(v, _) => v.toString
      case NDouble(t, _) =>
        // CEL doubles must stay DOUBLE in SQL — a bare `10.5` parses as
        // DECIMAL(3,1) in Spark (different arithmetic); 'D' pins the type
        s"${t}D"
      case NStr(s, _) => sqlStr(s)
      case NBytes(b, _) => s"X'${b.map(x => f"$x%02X").mkString}'"
      case NBool(v, _) => if (v) "true" else "false"
      case NNull(_) => "NULL"
      case NId(name, _) =>
        env.get(name).map(_.sql).getOrElse {
          name match {
            case "now" => "current_timestamp()"
            // reverse of the reference's CEL-reserved-word rename (cel.go:127)
            case "_type" => "`type`"
            case _ => ident(name)
          }
        }
      case NList(items, _) =>
        s"array(${items.map(emit(_, env)).mkString(", ")})"
      case NMapLit(entries, _) =>
        s"map(${entries.flatMap { case (k, v) => Seq(emit(k, env), emit(v, env)) }.mkString(", ")})"
      case NIndex(recv, idx, _) =>
        val rk = kindOf(recv, env)
        val ik = kindOf(idx, env)
        if (rk == KMap || ik == KStr)
          s"element_at(${emit(recv, env)}, ${emit(idx, env)})"
        else
          s"element_at(${emit(recv, env)}, ${plus1(idx, env)})"
      case NSelect(recv, field, _) =>
        err(s"field access '.$field' is not part of the flat row env " +
          "(nested message fields are not supported)", n)
      case NTernary(c, t, f, _) =>
        s"if(${emit(c, env)}, ${emit(t, env)}, ${emit(f, env)})"
      case NUnary("!", e, _) => s"(NOT ${emit(e, env)})"
      case NUnary("-", e, _) => s"(- ${emit(e, env)})"
      case NUnary(op, _, _) => err(s"unsupported unary '$op'", n)
      case b: NBin => emitBin(b, env)
      case c: NCall => emitCall(c, env)
    }

    private def emitBin(b: NBin, env: Map[String, Binding]): String = {
      val NBin(op, l, r, _) = b
      def el = emit(l, env)
      def er = emit(r, env)
      op match {
        case "&&" => s"($el AND $er)"
        case "||" => s"($el OR $er)"
        // CEL null equality is a real test (x == null is true/false), but
        // SQL `= NULL` is always NULL — must emit IS [NOT] NULL or the
        // predicate silently drops every row
        case "==" => (l, r) match {
          case (_: NNull, _: NNull) => "(TRUE)"
          case (_: NNull, _) => s"($er IS NULL)"
          case (_, _: NNull) => s"($el IS NULL)"
          case _ => s"($el = $er)"
        }
        case "!=" => (l, r) match {
          case (_: NNull, _: NNull) => "(FALSE)"
          case (_: NNull, _) => s"($er IS NOT NULL)"
          case (_, _: NNull) => s"($el IS NOT NULL)"
          case _ => s"($el <> $er)"
        }
        case "<" | "<=" | ">" | ">=" => s"($el $op $er)"
        case "in" =>
          (r, kindOf(r, env)) match {
            // `x in []` is valid CEL (false); `IN ()` is invalid SQL
            case (NList(Nil, _), _) => "(FALSE)"
            case (NList(items, _), _) =>
              s"($el IN (${items.map(emit(_, env)).mkString(", ")}))"
            case (_, KMap) => s"map_contains_key($er, $el)"
            case _ => s"array_contains($er, $el)"
          }
        case "+" =>
          (kindOf(l, env), kindOf(r, env)) match {
            case (KStr, _) | (_, KStr) => s"concat($el, $er)"
            case (KList, _) | (_, KList) => s"concat($el, $er)"
            case _ => s"($el + $er)"
          }
        case "-" => s"($el - $er)"
        case "*" => s"($el * $er)"
        case "%" => s"($el % $er)"
        case "/" =>
          (kindOf(l, env), kindOf(r, env)) match {
            // CEL int/int truncates; Spark '/' is always DOUBLE
            case (KInt, KInt) => s"($el div $er)"
            case _ => s"($el / $er)"
          }
        case other => err(s"unsupported operator '$other'", b)
      }
    }

    private def lambda1(fn: String, args: Seq[Node], n: Node,
                        env: Map[String, Binding]): (String, String) = {
      args match {
        case Seq(NId(v, _), body) =>
          (v, emit(body, env + (v -> LambdaVar(v, KUnknown))))
        case _ => err(s"$fn expects (var, expr)", n)
      }
    }

    private def emitCall(c: NCall, env: Map[String, Binding]): String = {
      val NCall(recvOpt, fn, args, _) = c
      def a(i: Int): String = emit(args(i), env)
      def recv: Node = recvOpt.get
      def r: String = emit(recv, env)

      // namespaced globals parse as member calls on a bare namespace ident
      val ns = recvOpt.collect { case NId(name, _) if !env.contains(name) => name }
      ns match {
        case Some("math") => return emitMath(c, env)
        case Some("sets") =>
          val (x, y) = (a(0), a(1))
          return fn match {
            case "contains" => s"(size(array_except($y, $x)) = 0)"
            case "intersects" => s"arrays_overlap($x, $y)"
            case "equivalent" =>
              s"(array_sort(array_distinct($x)) = array_sort(array_distinct($y)))"
            case other => err(s"unsupported sets.$other", c)
          }
        case Some("regex") =>
          return fn match {
            // CEL returns an optional (absent on no match); SQL's optional
            // is NULL — nullif folds regexp_extract's no-match '' to NULL
            // so orValue/coalesce composes. Caveat: an EMPTY real match
            // also maps to NULL. Group: first capture group when the
            // literal pattern has one (CEL semantics), whole match else.
            case "extract" => s"nullif(regexp_extract(${a(0)}, ${a(1)}, ${groupOf(args(1))}), '')"
            case "extractAll" => s"regexp_extract_all(${a(0)}, ${a(1)}, ${groupOf(args(1))})"
            case "replace" =>
              if (args.length > 3) err("regex.replace with a count limit has no Spark equivalent", c)
              else s"regexp_replace(${a(0)}, ${a(1)}, ${a(2)})"
            case other => err(s"unsupported regex.$other", c)
          }
        case Some("base64") =>
          return fn match {
            case "encode" => s"base64(${a(0)})"
            case "decode" => s"unbase64(${a(0)})"
            case other => err(s"unsupported base64.$other", c)
          }
        case Some("lists") =>
          return fn match {
            case "range" =>
              // empty when n <= 0; sequence alone would count DOWN, and a
              // runtime-negative slice length is a Spark error — clamp it
              val x = a(0)
              s"slice(sequence(0, greatest($x, 1) - 1), 1, greatest($x, 0))"
            case other => err(s"unsupported lists.$other", c)
          }
        case Some("cel") if fn == "bind" =>
          return args match {
            case Seq(NId(v, _), init, body) =>
              val sql = s"(${emit(init, env)})"
              emit(body, env + (v -> Bound(sql, kindOf(init, env))))
            case _ => err("cel.bind expects (var, init, result)", c)
          }
        case Some("optional") =>
          return fn match {
            case "of" => a(0)
            case "ofNonZeroValue" => err("optional.ofNonZeroValue has no SQL analog", c)
            case "none" => "NULL"
            case other => err(s"unsupported optional.$other", c)
          }
        case _ => ()
      }

      recvOpt match {
        case None =>
          fn match {
            case "size" =>
              kindOf(args(0), env) match {
                case KList | KMap => s"size(${a(0)})"
                case _ => s"length(${a(0)})" // strings/bytes; Unknown defaults here
              }
            case "string" => s"cast(${a(0)} AS STRING)"
            case "int" => s"cast(${a(0)} AS BIGINT)"
            case "uint" => s"cast(${a(0)} AS BIGINT)"
            case "double" => s"cast(${a(0)} AS DOUBLE)"
            case "bool" => s"cast(${a(0)} AS BOOLEAN)"
            case "bytes" => s"cast(${a(0)} AS BINARY)"
            case "timestamp" => s"to_timestamp(${a(0)})"
            case "duration" => args(0) match {
              case NStr(s, _) => durationSql(s, c)
              case _ => err("duration() requires a literal argument", c)
            }
            case "matches" => s"(${a(0)} rlike ${a(1)})"
            case "has" => err("has() over the flat row env: use `col IS NOT NULL`", c)
            case other => err(s"unsupported function '$other'", c)
          }
        case Some(_) =>
          fn match {
            // ---- strings (built-ins + ext.Strings, cel.go:77)
            case "lowerAscii" => s"lower($r)"
            case "upperAscii" => s"upper($r)"
            case "contains" => s"contains($r, ${a(0)})"
            case "startsWith" => s"startswith($r, ${a(0)})"
            case "endsWith" => s"endswith($r, ${a(0)})"
            case "matches" => s"($r rlike ${a(0)})"
            case "trim" => s"trim($r)"
            case "replace" =>
              if (args.length > 2) err("replace with a count limit has no Spark equivalent", c)
              else s"replace($r, ${a(0)}, ${a(1)})"
            case "charAt" => s"substr($r, ${plus1(args(0), env)}, 1)"
            case "substring" =>
              if (kindOf(recv, env) == KList)
                err("use list.slice for lists", c)
              else if (args.length == 1) s"substring($r, ${plus1(args(0), env)})"
              else s"substring($r, ${plus1(args(0), env)}, ${lenOf(args(0), args(1), env)})"
            case "sliceBytes" => // custom ext, cel.go:80-87; 0-based end-exclusive
              s"substring($r, ${plus1(args(0), env)}, ${lenOf(args(0), args(1), env)})"
            case "indexOf" =>
              // instr is 1-based with 0 = absent, so instr - 1 IS CEL indexOf
              if (args.length == 1) s"(instr($r, ${a(0)}) - 1)"
              else s"(locate(${a(0)}, $r, ${plus1(args(1), env)}) - 1)"
            case "lastIndexOf" =>
              // the optional-offset form must FAIL, not silently search the
              // whole string (the file's no-silent-mistranslation policy)
              if (args.length > 1)
                err("lastIndexOf with an offset is not supported " +
                  "(the offset-free form searches the whole string)", c)
              val sub = a(0)
              val loc = s"locate(reverse($sub), reverse($r))"
              s"(if($loc = 0, -1, length($r) - $loc + 2 - length($sub) - 1))"
            case "split" =>
              val sep = args(0) match {
                case NStr(s, _) => sqlStr(regexQuote(s)) // CEL split is LITERAL
                case _ => err("split requires a literal separator (Spark split is regex)", c)
              }
              if (args.length == 1) s"split($r, $sep)"
              else s"split($r, $sep, ${a(1)})"
            case "format" => args(0) match {
              case NList(items, _) =>
                s"format_string($r, ${items.map(emit(_, env)).mkString(", ")})"
              case _ => err("format requires a literal list argument", c)
            }
            case "join" =>
              if (args.isEmpty) s"array_join($r, '')"
              else s"array_join($r, ${a(0)})"
            case "reverse" =>
              s"reverse($r)" // string AND list reverse share the SQL name
            case "size" =>
              kindOf(recv, env) match {
                case KList | KMap => s"size($r)"
                case _ => s"length($r)"
              }
            // ---- lists (ext.Lists, cel.go:73) + comprehension macros
            case "flatten" => s"flatten($r)"
            case "distinct" => s"array_distinct($r)"
            case "sort" => s"array_sort($r)"
            case "slice" =>
              s"slice($r, ${plus1(args(0), env)}, ${lenOf(args(0), args(1), env)})"
            case "exists" =>
              val (v, body) = lambda1("exists", args, c, env)
              s"exists($r, $v -> $body)"
            case "all" =>
              val (v, body) = lambda1("all", args, c, env)
              s"forall($r, $v -> $body)"
            case "filter" =>
              val (v, body) = lambda1("filter", args, c, env)
              s"filter($r, $v -> $body)"
            case "map" =>
              if (args.length == 2) {
                val (v, body) = lambda1("map", args, c, env)
                s"transform($r, $v -> $body)"
              } else args match { // map(x, predicate, transform)
                case Seq(NId(v, _), p, f) =>
                  val e2 = env + (v -> LambdaVar(v, KUnknown))
                  s"transform(filter($r, $v -> ${emit(p, e2)}), $v -> ${emit(f, e2)})"
                case _ => err("map expects (var, expr) or (var, pred, expr)", c)
              }
            case "exists_one" =>
              val (v, body) = lambda1("exists_one", args, c, env)
              s"(size(filter($r, $v -> $body)) = 1)"
            // ---- optionals (cel.OptionalTypes, cel.go:70)
            case "orValue" => s"coalesce($r, ${a(0)})"
            case "hasValue" => s"($r IS NOT NULL)"
            case "value" => r
            case "optMap" => args match {
              case Seq(NId(v, _), body) =>
                val e2 = env + (v -> Bound(s"($r)", kindOf(recv, env)))
                s"if($r IS NOT NULL, ${emit(body, e2)}, NULL)"
              case _ => err("optMap expects (var, expr)", c)
            }
            // ---- timestamps (CEL built-in accessors; CEL is 0-based where
            // noted — the +/-1 matches the spec, not a Spark quirk)
            case "getFullYear" => s"year(${tzAdj(r, args, env)})"
            case "getMonth" => s"(month(${tzAdj(r, args, env)}) - 1)" // CEL 0-11
            case "getDate" => s"day(${tzAdj(r, args, env)})" // 1-based
            case "getDayOfMonth" => s"(day(${tzAdj(r, args, env)}) - 1)" // 0-based
            case "getDayOfYear" => s"(dayofyear(${tzAdj(r, args, env)}) - 1)" // 0-based
            case "getDayOfWeek" => s"(dayofweek(${tzAdj(r, args, env)}) - 1)" // CEL 0=Sun
            case "getHours" => s"hour(${tzAdj(r, args, env)})"
            case "getMinutes" => s"minute(${tzAdj(r, args, env)})"
            case "getSeconds" => s"second(${tzAdj(r, args, env)})"
            case "getMilliseconds" => s"(unix_millis(${tzAdj(r, args, env)}) % 1000)"
            case other => err(s"unsupported method '.$other'", c)
          }
      }
    }

    /** Timestamp accessors take an optional tz-name argument in CEL. */
    private def tzAdj(r: String, args: Seq[Node], env: Map[String, Binding]): String =
      if (args.isEmpty) r
      else s"from_utc_timestamp($r, ${emit(args.head, env)})"

    private def emitMath(c: NCall, env: Map[String, Binding]): String = {
      val args = c.args
      def a(i: Int): String = emit(args(i), env)
      c.fn match {
        case "greatest" => s"greatest(${args.map(emit(_, env)).mkString(", ")})"
        case "least" => s"least(${args.map(emit(_, env)).mkString(", ")})"
        case "abs" => s"abs(${a(0)})"
        case "ceil" => s"ceiling(${a(0)})"
        case "floor" => s"floor(${a(0)})"
        case "round" => s"round(${a(0)})"
        case "sign" => s"sign(${a(0)})"
        case "sqrt" => s"sqrt(${a(0)})"
        case "trunc" => s"cast(cast(${a(0)} AS BIGINT) AS DOUBLE)"
        case "isNaN" => s"isnan(${a(0)})"
        case "isFinite" => s"(NOT (isnan(${a(0)}) OR abs(${a(0)}) = double('Infinity')))"
        case "isInf" => s"(abs(${a(0)}) = double('Infinity'))"
        case "bitAnd" => s"(${a(0)} & ${a(1)})"
        case "bitOr" => s"(${a(0)} | ${a(1)})"
        case "bitXor" => s"(${a(0)} ^ ${a(1)})"
        case "bitNot" => s"(~ ${a(0)})"
        case "bitShiftLeft" => s"shiftleft(${a(0)}, ${a(1)})"
        case "bitShiftRight" => s"shiftrightunsigned(${a(0)}, ${a(1)})" // CEL: logical
        case other => err(s"unsupported math.$other", c)
      }
    }

    /** regexp_extract group: 1 when the literal pattern has a capture
      * group (CEL extract returns the group), else 0 (whole match). */
    private def groupOf(pattern: Node): String = pattern match {
      case NStr(s, _) =>
        var i = 0; var groups = 0; var inClass = false
        while (i < s.length) {
          if (s.charAt(i) == '\\') i += 2
          else {
            val c = s.charAt(i)
            // '(' inside a character class is a literal, not a group
            if (c == '[' && !inClass) inClass = true
            else if (c == ']' && inClass) inClass = false
            else if (c == '(' && !inClass &&
                !(i + 1 < s.length && s.charAt(i + 1) == '?')) groups += 1
            i += 1
          }
        }
        if (groups >= 1) "1" else "0"
      case _ => "0"
    }

    /** CEL duration literal ("1h30m10s500ms", also us/ns) → make_interval.
      * Sub-millisecond precision is rejected rather than rounded. */
    private def durationSql(s: String, at: Node): String = {
      val re = """(-?\d+(?:\.\d+)?)(h|m|s|ms|us|ns)""".r
      var h = 0.0; var m = 0.0; var sec = 0.0
      val matched = re.findAllMatchIn(s).map { g =>
        val v = g.group(1).toDouble
        g.group(2) match {
          case "h" => h += v
          case "m" => m += v
          case "s" => sec += v
          case "ms" => sec += v / 1000.0
          case "us" | "ns" =>
            throw new CelError("sub-millisecond durations are not supported", at.pos)
        }
        g.matched.length
      }.sum
      if (matched != s.length || s.isEmpty)
        throw new CelError(s"cannot parse duration '$s'", at.pos)
      // everything folds into the SECS argument: make_interval's hour/min
      // parameters are INT, so a fractional "1.5h" passed there would be
      // silently truncated (ANSI off) or fail at runtime (ANSI on); secs
      // is DECIMAL and carries the full value exactly
      s"make_interval(0, 0, 0, 0, 0, 0, ${fmt(h * 3600.0 + m * 60.0 + sec)})"
    }
    private def fmt(d: Double): String =
      if (d == d.floor && !d.isInfinite) d.toLong.toString else d.toString
  }
}
