package graft.slt

import scala.util.matching.Regex

/** Session-statement emulation helpers for the SLT runner: prepared
  * statements (PREPARE / EXECUTE / DEALLOCATE), single-session transactions
  * (BEGIN / COMMIT / ROLLBACK), and session variables (SET / RESET / SHOW).
  *
  * The reference serves these through per-connection portals
  * (`src/adapter/src/client.rs:628`) and Coordinator transaction sequencing
  * (`src/adapter/src/coord.rs:1992`); the SLT corpus is single-session and
  * sequential, so a text-substitution portal emulation and a
  * snapshot/restore transaction emulation reproduce the observable
  * semantics exactly. State lives per-file in the runner; this object holds
  * the pure parsing/substitution pieces.
  */
private[slt] object SltSession {

  final case class Prepared(paramTypes: List[String], body: String)

  /** `PREPARE name [(t1, ...)] AS body` (pg-parser shape; the reference
    * accepts the same grammar through `src/sql-parser`). */
  val Prepare: Regex =
    """(?is)^\s*PREPARE\s+("?[\w$]+"?)\s*(?:\(\s*([^)]*)\)\s*)?AS\s+(.*?)\s*;?\s*$""".r
  /** `EXECUTE name [(args...)]` — args may nest parens/quotes. */
  val Execute: Regex =
    """(?is)^\s*EXECUTE\s+("?[\w$]+"?)\s*(?:\((.*)\)\s*)?;?\s*$""".r
  val Deallocate: Regex =
    """(?is)^\s*DEALLOCATE\s+(?:PREPARE\s+)?(ALL|"?[\w$]+"?)\s*;?\s*$""".r

  val Begin: Regex =
    """(?is)^\s*(?:BEGIN|START\s+TRANSACTION)\b.*$""".r
  val Commit: Regex = """(?is)^\s*(?:COMMIT|END)(?:\s+(?:TRANSACTION|WORK))?\s*;?\s*$""".r
  val Rollback: Regex = """(?is)^\s*(?:ROLLBACK|ABORT)(?:\s+(?:TRANSACTION|WORK))?\s*;?\s*$""".r
  /** `ROLLBACK TO [SAVEPOINT] x` — partial rollback, NOT emulated (the
    * snapshot restore is all-or-nothing); must stay unsupported. */
  val RollbackTo: Regex = """(?is)^\s*ROLLBACK\s+TO\b.*$""".r

  def normName(n: String): String =
    n.trim.stripPrefix("\"").stripSuffix("\"").toLowerCase

  // ---- session variables (reference src/sql/src/session/vars/definitions.rs) ----

  /** `SET [LOCAL|SESSION] <name> TO|= <value>` — the operator is mandatory
    * except in the dedicated `SET TIME ZONE v` spelling, so crdb forms like
    * `SET CLUSTER SETTING a = b` can never half-match a known var name. */
  val SetVar: Regex =
    """(?is)^\s*SET\s+(?:LOCAL\s+|SESSION\s+)?(?:(TIME\s+ZONE)\s+|([A-Za-z_][\w.]*)\s*(?:TO\s+|=\s*))(.+?)\s*;?\s*$""".r
  /** `SET [SESSION CHARACTERISTICS AS] TRANSACTION ISOLATION LEVEL <x>`:
    * with SESSION CHARACTERISTICS it sets the session var; without, it
    * scopes to the current transaction only (a no-op for the corpus). */
  val SetSessionIsolation: Regex =
    """(?is)^\s*SET\s+SESSION\s+CHARACTERISTICS\s+AS\s+TRANSACTION\s+ISOLATION\s+LEVEL\s+(.+?)\s*;?\s*$""".r
  val SetTxnScoped: Regex =
    """(?is)^\s*SET\s+TRANSACTION\s+.*$""".r
  val SetUnsupportedForm: Regex =
    """(?is)^\s*SET\s+(?:CLUSTER\s+SETTING|ROLE\b|SESSION\s+AUTHORIZATION)\b.*$""".r
  val ResetVar: Regex =
    """(?is)^\s*RESET\s+(ALL|TIME\s+ZONE|[A-Za-z_][\w.]*)\s*;?\s*$""".r
  val ShowVar: Regex =
    // SHOW OBJECTS stays on the variable path (its engine command lists
    // internal catalog temp views and lacks type/source/secret kinds —
    // an honest skip beats a divergent listing)
    ("""(?is)^\s*SHOW\s+(?!(?:TABLES|VIEWS|SOURCES|SINKS|TYPES|""" +
      """CONNECTIONS|COLUMNS|CLUSTERS|INDEXES|SCHEMAS|DATABASES|ROLES|""" +
      """SECRETS|MATERIALIZED)\s*;?\s*$)""" +
      """(TIME\s+ZONE|TRANSACTION\s+ISOLATION\s+LEVEL|[A-Za-z_][\w.]*)\s*;?\s*$""").r

  def normVar(n: String): String = n.trim.toLowerCase.replaceAll("\\s+", " ") match {
    case "time zone" | "time" => "timezone"
    case "transaction isolation level" => "transaction_isolation"
    case v => v
  }

  /** Defaults from the reference's VarDefinitions; value text as `SHOW`
    * renders it. Only vars whose default we can faithfully report. */
  val varDefaults: Map[String, String] = Map(
    "application_name" -> "",
    "client_encoding" -> "UTF8",
    "client_min_messages" -> "notice",
    "cluster" -> "quickstart",
    "cluster_replica" -> "",
    "database" -> "materialize",
    "datestyle" -> "ISO, MDY",
    "extra_float_digits" -> "1",
    "integer_datetimes" -> "on",
    "intervalstyle" -> "postgres",
    "search_path" -> "public",
    "sql_safe_updates" -> "off",
    "standard_conforming_strings" -> "on",
    "statement_timeout" -> "1 min",
    "is_superuser" -> "off",
    "server_version" -> "9.5.0",
    "server_version_num" -> "90500",
    "max_identifier_length" -> "255",
    "timezone" -> "UTC",
    "transaction_isolation" -> "strict serializable",
    "current_object_missing_warnings" -> "on",
    "emit_timestamp_notice" -> "off",
    "emit_trace_id_notice" -> "off",
    "auto_route_catalog_queries" -> "on",
    "real_time_recency" -> "off",
    "enable_session_rbac_checks" -> "off")

  private val boolVars = Set(
    "integer_datetimes", "standard_conforming_strings", "sql_safe_updates",
    "is_superuser", "current_object_missing_warnings", "emit_timestamp_notice",
    "emit_trace_id_notice", "auto_route_catalog_queries", "real_time_recency",
    "enable_session_rbac_checks")

  /** Strip quotes and render pg-style (`on`/`off` for boolean vars). */
  def normVarValue(name: String, raw0: String): String = {
    val raw = raw0.trim
    val v =
      if (raw.length >= 2 && raw.head == '\'' && raw.last == '\'')
        raw.substring(1, raw.length - 1).replace("''", "'")
      else raw
    if (boolVars.contains(name)) v.toLowerCase match {
      case "true" | "t" | "on" | "1" | "yes" => "on"
      case "false" | "f" | "off" | "0" | "no" => "off"
      case other => other
    } else if (name == "statement_timeout" ||
        name == "idle_in_transaction_session_timeout") {
      // mz renders Duration vars with a space ("10 s"); a bare number is
      // milliseconds
      val t = v.trim
      if (t.matches("\\d+")) {
        val ms = t.toLong
        if (ms == 0L) "0 s"
        else if (ms % 1000 == 0) s"${ms / 1000} s"
        else s"$ms ms"
      } else t.replaceAll("(?i)^(\\d+)\\s*(ms|s|min|h)$", "$1 $2")
    } else v
  }

  sealed trait SetOutcome
  /** The value is honored: track it (SHOW reports `value`). */
  final case class Accepted(value: String) extends SetOutcome
  /** A valid value whose semantics we do not emulate: skip AND taint. */
  case object Unhonored extends SetOutcome
  /** The reference rejects this value — an error, exactly like pg. */
  case object Invalid extends SetOutcome

  /** mz upgrades isolation levels below serializable to serializable
    * (`src/adapter/src/session.rs` isolation handling; vars.slt:226-231). */
  def isolationValue(raw: String): SetOutcome = raw.trim.toLowerCase match {
    case "serializable" => Accepted("serializable")
    case "strict serializable" => Accepted("strict serializable")
    case "strong session serializable" => Accepted("strong session serializable")
    case "read committed" | "read uncommitted" | "repeatable read" =>
      Accepted("serializable")
    case v if v.startsWith("bounded staleness") =>
      // the staleness bound is a humantime duration, must be >= 1ms
      // (reference test/sqllogictest/bounded_staleness.slt: bare, garbage,
      // zero, and sub-millisecond durations are invalid values), and SHOW
      // re-renders it with spaces between unit groups ("1m30s" -> "1m 30s")
      val durStr = v.stripPrefix("bounded staleness").trim
      // humantime also accepts long unit spellings ('1 minute', '2 hours');
      // longest-first alternation so 'ms' wins over 'm'+stray 's'
      val comp = ("""(\d+)\s*(nsec|ns|usec|us|msec|ms|seconds|second|secs|sec|s|""" +
        """minutes|minute|mins|min|m|hours|hour|hrs|hr|h|days|day|d|weeks|week|w)\b""").r
      val parts = comp.findAllMatchIn(durStr).toList
      val residue = comp.replaceAllIn(durStr, "").replaceAll("\\s+", "")
      if (parts.isEmpty || residue.nonEmpty) Invalid
      else {
        def compact(u: String): String = u match {
          case "nsec" | "ns" => "ns"
          case "usec" | "us" => "us"
          case "msec" | "ms" => "ms"
          case u if u.startsWith("s") => "s"
          case u if u.startsWith("m") => "m"
          case u if u.startsWith("h") => "h"
          case u if u.startsWith("d") => "d"
          case _ => "w"
        }
        val ns = parts.map(m => m.group(1).toLong * (compact(m.group(2)) match {
          case "ns" => 1L; case "us" => 1000L; case "ms" => 1000000L
          case "s" => 1000000000L; case "m" => 60000000000L
          case "h" => 3600000000000L; case "d" => 86400000000000L
          case _ => 604800000000000L
        })).sum
        if (ns < 1000000L) Invalid
        else Accepted(
          "bounded staleness " + parts.map { m =>
            val u = compact(m.group(2))
            if (u == "w") (m.group(1).toLong * 7) + "d" else m.group(1) + u
          }.mkString(" "))
      }
    case _ => Invalid
  }

  val Discard: Regex =
    """(?is)^\s*DISCARD\s+(ALL|PLANS|SEQUENCES|TEMP|TEMPORARY)\s*;?\s*$""".r

  // ---- index DDL (semantic no-ops for a logic test: an index never
  // changes query RESULTS in the reference — arrangements are a
  // performance structure; the engine's real CREATE INDEX path is
  // sql/GraftCommands.CreateIndexCommand) ----
  // cursor emulation (pg DECLARE/FETCH/CLOSE; reference portals)
  val DeclareCursor: Regex =
    ("""(?is)^\s*DECLARE\s+["`]?(\w+)["`]?\s+(?:BINARY\s+)?(?:INSENSITIVE\s+)?""" +
      """(?:NO\s+SCROLL\s+|SCROLL\s+)?CURSOR\s+(WITH\s+HOLD\s+|WITHOUT\s+HOLD\s+)?FOR\s+(.*?);?\s*$""").r
  val FetchCursor: Regex =
    ("""(?is)^\s*FETCH\s+(?:FORWARD\s+)?(ALL\s+|\d+\s+)?(?:FROM\s+)?["`]?(\w+)["`]?""" +
      """\s*(?:WITH\s*\(\s*TIMEOUT\s*=?\s*('[^']*')\s*\))?\s*;?\s*$""").r
  val CloseCursor: Regex =
    """(?is)^\s*CLOSE\s+(?:(ALL)|["`]?(\w+)["`]?)\s*;?\s*$""".r

  // cluster DDL (semantic no-ops — clusters place dataflows, never change
  // results; the registry feeds SHOW CLUSTERS and comment validation)
  val CreateClusterReplicaStmt: Regex =
    """(?is)^\s*CREATE\s+CLUSTER\s+REPLICA\s+["`]?(\w+)["`]?\s*\.\s*["`]?(\w+)["`]?\b.*?;?\s*$""".r
  val DropClusterReplicaStmt: Regex =
    """(?is)^\s*DROP\s+CLUSTER\s+REPLICA\s+(?:IF\s+EXISTS\s+)?["`]?(\w+)["`]?\s*\.\s*["`]?(\w+)["`]?\s*;?\s*$""".r
  val CreateClusterStmt: Regex =
    """(?is)^\s*CREATE\s+CLUSTER\s+["`]?(\w+)["`]?\s*(\(.*\)|REPLICAS\s*\(.*\)|SIZE\b.*?)?\s*;?\s*$""".r
  val DropClusterStmt: Regex =
    """(?is)^\s*DROP\s+CLUSTER\s+(IF\s+EXISTS\s+)?["`]?(\w+)["`]?\s*(?:CASCADE|RESTRICT)?\s*;?\s*$""".r
  val ShowClustersStmt: Regex =
    """(?is)^\s*(?:SELECT\s+(.*?)\s+FROM\s*\(\s*)?SHOW\s+CLUSTERS\s*\)?\s*;?\s*$""".r

  val CreateIndexStmt: Regex =
    ("""(?is)^\s*CREATE\s+(?:UNIQUE\s+)?INDEX\s+(?:IF\s+NOT\s+EXISTS\s+)?""" +
      """(?:("?[\w]+"?)\s+)?ON\s+["`]?(\w+)["`]?\b.*$""").r
  val CreateDefaultIndexStmt: Regex =
    ("""(?is)^\s*CREATE\s+DEFAULT\s+INDEX\s+(?:IF\s+NOT\s+EXISTS\s+)?""" +
      """(?:("?[\w]+"?)\s+)?(?:ON|IN\s+CLUSTER\s+\w+\s+ON)\s+["`]?(\w+)["`]?\s*;?\s*$""").r
  val DropIndexStmt: Regex =
    ("""(?is)^\s*DROP\s+INDEX\s+(IF\s+EXISTS\s+)?(?:[\w"]+\s*@\s*)?["`]?(\w+)["`]?""" +
      """(?:\s+(?:CASCADE|RESTRICT))?\s*;?\s*$""").r

  def acceptSet(name: String, value: String): SetOutcome = {
    val v = normVarValue(name, value)
    name match {
      case _ if v.equalsIgnoreCase("DEFAULT") =>
        varDefaults.get(name).map(Accepted(_)).getOrElse(Unhonored)
      // the reference's TimeZone var accepts ONLY UTC/GMT/+00:00 (uncased)
      // and REJECTS every other offset/POSIX/IANA value with 'invalid value
      // for parameter "TimeZone"' (src/sql/src/session/vars/value.rs:841,
      // corpus cockroach/set_time_zone.slt) — so non-UTC is Invalid (an
      // expected error), not merely unhonored
      case "timezone" =>
        // each accepted spelling formats back as itself (TimeZone::as_str)
        if (v.equalsIgnoreCase("UTC")) Accepted("UTC")
        else if (v.equalsIgnoreCase("GMT")) Accepted("GMT")
        else if (v == "+00:00") Accepted("+00:00")
        else Invalid
      case "datestyle" =>
        if (v.toUpperCase.replaceAll("\\s+", "").matches("ISO|ISO,MDY|MDY,ISO")) Accepted("ISO, MDY")
        else Unhonored
      case "intervalstyle" => if (v.equalsIgnoreCase("postgres")) Accepted("postgres") else Unhonored
      case "database" =>
        // simple word names are honored end-to-end (SchemaEmulation's
        // parse-time database layer re-scopes bare-name resolution); only
        // spellings that layer cannot capture stay unhonored
        if (v.matches("\\w+")) Accepted(v) else Unhonored
      case "search_path" =>
        // honored: SchemaEmulation consumes the path at parse time (bare
        // names resolve through it); pg accepts unknown schemas silently.
        // SHOW renders pg identifier style: bare when lowercase-simple,
        // double-quoted otherwise.
        Accepted(splitQuoted(v).map { e0 =>
          val e = e0.trim
          val bare =
            if ((e.startsWith("'") && e.endsWith("'")) ||
                (e.startsWith("\"") && e.endsWith("\"")))
              e.substring(1, e.length - 1)
            else e
          if (bare.matches("[a-z_][a-z0-9_$]*")) bare else "\"" + bare + "\""
        }.mkString(", "))
      case "client_encoding" =>
        if (v.replace("-", "").equalsIgnoreCase("UTF8")) Accepted("UTF8") else Unhonored
      case "standard_conforming_strings" => if (v == "on") Accepted(v) else Unhonored
      case "sql_safe_updates" => if (v == "off") Accepted(v) else Unhonored
      case "integer_datetimes" => if (v == "on") Accepted(v) else Invalid // pg: read-only
      case "transaction_isolation" => isolationValue(v)
      case "extra_float_digits" =>
        if (v.matches("-?\\d+")) Accepted(v) else Invalid
      case "application_name" | "client_min_messages" |
           "statement_timeout" | "idle_in_transaction_session_timeout" |
           "cluster" | "cluster_replica" | "max_query_result_size" |
           "emit_timestamp_notice" | "emit_trace_id_notice" |
           "current_object_missing_warnings" | "real_time_recency" |
           "welcome_message" | "failpoints" => Accepted(v)
      case _ => Unhonored
    }
  }

  /** Split on commas outside SINGLE- and DOUBLE-quoted runs (search_path
    * element lists quote either way). */
  def splitQuoted(s: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    val cur = new StringBuilder
    var q: Char = 0
    s.foreach { c =>
      if (q != 0) { if (c == q) q = 0; cur += c }
      else c match {
        case '\'' | '"' => q = c; cur += c
        case ',' => out += cur.toString; cur.clear()
        case _ => cur += c
      }
    }
    out += cur.toString
    out.toList.filter(_.trim.nonEmpty)
  }

  /** Split a comma-separated list at top level (outside quotes/parens). */
  def splitTop(s: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var inQ = false
    s.foreach { c =>
      if (inQ) { cur.append(c); if (c == '\'') inQ = false }
      else c match {
        case '\'' => inQ = true; cur.append(c)
        case '(' | '[' => depth += 1; cur.append(c)
        case ')' | ']' => depth -= 1; cur.append(c)
        case ',' if depth == 0 => out += cur.toString; cur.clear()
        case _ => cur.append(c)
      }
    }
    if (cur.nonEmpty || out.nonEmpty) out += cur.toString
    out.toList.map(_.trim).filter(_.nonEmpty)
  }

  // ---- custom types (reference Plan::CreateType, src/sql/src/plan.rs:134;
  // resolution budget src/sql/src/plan/query.rs:6105-6216) ----

  sealed trait CustomType
  final case class ListType(elem: String) extends CustomType
  final case class MapType(key: String, value: String) extends CustomType
  final case class RecordType(fields: List[(String, String)]) extends CustomType

  val CreateTypeList: Regex =
    """(?is)^\s*CREATE\s+TYPE\s+("?[\w.]+"?)\s+AS\s+LIST\s*\(\s*ELEMENT\s+TYPE\s*=?\s*("?[\w ]+"?)\s*\)\s*;?\s*$""".r
  val CreateTypeMap: Regex =
    ("""(?is)^\s*CREATE\s+TYPE\s+("?[\w.]+"?)\s+AS\s+MAP\s*\(\s*KEY\s+TYPE\s*=?\s*("?[\w ]+"?)\s*,""" +
      """\s*VALUE\s+TYPE\s*=?\s*("?[\w ]+"?)\s*\)\s*;?\s*$""").r
  val CreateTypeRecord: Regex =
    """(?is)^\s*CREATE\s+TYPE\s+("?[\w.]+"?)\s+AS\s*\((.*)\)\s*;?\s*$""".r
  val DropType: Regex =
    """(?is)^\s*DROP\s+TYPE\s+(?:IF\s+EXISTS\s+)?("?[\w.]+"?)\s*;?\s*$""".r

  /** Built-in scalar type names resolvable as a list/map element or record
    * field (pg + mz spellings). */
  val builtinTypes: Set[String] = Set(
    "bool", "boolean", "int2", "smallint", "int4", "int", "integer", "int8",
    "bigint", "float4", "real", "float8", "double", "double precision",
    "float", "numeric", "decimal", "text", "string", "varchar", "char",
    "date", "time", "timestamp", "timestamptz", "interval", "uuid", "bytea",
    "jsonb", "json", "oid", "uint2", "uint4", "uint8", "mz_timestamp",
    "int4range", "int8range", "numrange", "daterange", "tsrange", "tstzrange")

  val typeDepthLimit = 128
  val typeNodeBudget = 100000L

  /** Resolution cost of one root type: (node count, max depth), with nodes
    * capped just past the budget so the doubled-record chains never
    * overflow. Mirrors `scalar_type_from_catalog_inner`: every node (named
    * or builtin leaf) costs one; depth counts nesting below the root. */
  def typeCost(name: String, registry: collection.Map[String, CustomType],
      depth: Int = 0): Either[String, (Long, Int)] = {
    val n = normName(name)
    if (depth > typeDepthLimit) Left(s"custom type nesting depth exceeds limit of $typeDepthLimit")
    else if (builtinTypes.contains(n)) Right((1L, depth))
    else registry.get(n) match {
      case None => Left(s"""type "$n" does not exist""")
      case Some(ListType(e)) =>
        typeCost(e, registry, depth + 1).map { case (c, d) => (cap(c + 1), d) }
      case Some(MapType(k, v)) =>
        for { kc <- typeCost(k, registry, depth + 1)
              vc <- typeCost(v, registry, depth + 1) }
          yield (cap(kc._1 + vc._1 + 1), math.max(kc._2, vc._2))
      case Some(RecordType(fs)) =>
        fs.foldLeft[Either[String, (Long, Int)]](Right((1L, depth))) {
          case (acc, (_, ft)) => for {
            a <- acc
            fc <- typeCost(ft, registry, depth + 1)
          } yield (cap(a._1 + fc._1), math.max(a._2, fc._2))
        }
    }
  }
  private def cap(n: Long): Long = math.min(n, typeNodeBudget * 2)

  /** Validate a new type definition against the registry: Right(()) when it
    * registers, Left(error text) when the reference rejects it. */
  def validateType(ct: CustomType, registry: collection.Map[String, CustomType]): Either[String, Unit] = {
    val members = ct match {
      case ListType(e) => List(e)
      case MapType(k, v) => List(k, v)
      case RecordType(fs) => fs.map(_._2)
    }
    // one shared budget across the whole root (the root costs one node)
    members.foldLeft[Either[String, Long]](Right(1L)) { (acc, m) =>
      for { a <- acc; c <- typeCost(m, registry, 1) } yield cap(a + c._1)
    } match {
      case Left(e) => Left(e)
      case Right(nodes) if nodes > typeNodeBudget => Left("custom type is too complex to resolve")
      case Right(_) =>
        // depth re-check from the root
        members.foldLeft[Either[String, Unit]](Right(())) { (acc, m) =>
          acc.flatMap(_ => typeCost(m, registry, 1).map(_ => ()))
        }
    }
  }

  /** Substitute `$1..$n` (outside string literals) with the EXECUTE
    * arguments, cast to the declared parameter types when present — the
    * portal bind step as a text rewrite. Returns Left(reason) when the body
    * references a parameter with no argument. */
  def bind(body: String, args: List[String], types: List[String]): Either[String, String] = {
    var missing: Option[String] = None
    val out = new StringBuilder
    val n = body.length
    var i = 0
    var inQ = false
    var inDq = false
    while (i < n) {
      val c = body.charAt(i)
      if (inQ) { out.append(c); if (c == '\'') inQ = false; i += 1 }
      else if (inDq) { out.append(c); if (c == '"') inDq = false; i += 1 }
      else if (c == '\'') { inQ = true; out.append(c); i += 1 }
      else if (c == '"') { inDq = true; out.append(c); i += 1 }
      else if (c == '$' && i + 1 < n && body.charAt(i + 1).isDigit) {
        var j = i + 1
        while (j < n && body.charAt(j).isDigit) j += 1
        val idx = body.substring(i + 1, j).toInt
        if (idx < 1 || idx > args.length) missing = Some(s"$$$idx")
        else {
          val arg = args(idx - 1)
          val cast = types.lift(idx - 1) match {
            case Some(t) if t.nonEmpty => s"(CAST(${arg} AS $t))"
            case _ => s"($arg)"
          }
          out.append(cast)
        }
        i = j
      } else { out.append(c); i += 1 }
    }
    missing match {
      case Some(p) => Left(s"EXECUTE argument count mismatch: body references $p")
      case None => Right(out.toString)
    }
  }
}
