package graft.slt

import scala.collection.mutable

/** User-schema emulation for the SLT layer.
  *
  * The reference supports `CREATE SCHEMA` and schema-qualified relations
  * (`b1.t`) inside one database (reference
  * `src/sql/src/plan/statement/ddl.rs` plan_create_schema;
  * `src/catalog/src/memory/objects.rs` Schema). Spark temp views cannot be
  * schema-qualified, so the runner flattens: every user schema gets a
  * canonical prefix and `b1.t` parses as the flat name `gfts<N>_b1__t`.
  * `ALTER SCHEMA ... RENAME` only re-points the visible name at the same
  * canonical prefix — existing flat relations keep working with zero
  * catalog churn, exactly because the canonical id, not the visible name,
  * is baked into the member names.
  *
  * State is per-corpus-file (reset with the other shim registries) and is
  * populated at PARSE time (classify), in record order — the same contract
  * as the other shim registries: by the time a later record is shimmed,
  * every earlier schema DDL has been applied here.
  *
  * Validation results are encoded into a marker statement
  * (`GRAFT_SCHEMA_DDL|<ok|err:msg>|<drop1;drop2>`) that the runner executes:
  * ok → pass (after running the member drops), err → the reference's
  * rejection.
  */
object SchemaEmulation {

  /** visible schema name -> canonical prefix */
  private val canon = mutable.Map.empty[String, String]
  /** canonical prefix -> flat member names (for DROP ... CASCADE) */
  private val members = mutable.Map.empty[String, mutable.Set[String]]
  private var counter = 0
  /** `SET search_path` state (pg resolution order; default public only).
    * Parse-time like every other registry. */
  private var searchPath: Seq[String] = Seq("public")
  /** bare names of relations created in the public schema this file
    * (parse-time; lets bare-name resolution walk the path pg-style) */
  private val publicRels = mutable.Set.empty[String]

  /** Ambient schemas — not creatable/droppable/renamable-to. */
  private val ambient = Set("public", "mz_catalog", "pg_catalog", "mz_internal",
    "information_schema", "mz_unsafe", "mz_catalog_unstable", "mz_introspection",
    "mz_temp")

  // ---------------- database layer ----------------
  // crdb logictests switch databases (`SET DATABASE = otherdb`); each
  // database carries its own schema namespace. Same flattening treatment
  // as schemas: a non-default current database maps every schema name to
  // the registry key `<db>/<schema>` (the '/' can never appear in SQL
  // identifiers here, so the keys are collision-free), and `<db>/public`
  // registers as an ordinary canonical-prefixed schema on first use.
  private val defaultDbs = Set("test", "materialize", "defaultdb")
  private var currentDb = "test"
  private def dbDefault: Boolean = defaultDbs.contains(currentDb)
  private def dbKey(s: String): String =
    if (dbDefault || (ambient.contains(s) && s != "public")) s
    else s"$currentDb/$s"

  def setDatabase(raw: String): Unit = {
    currentDb = norm(raw)
    if (!dbDefault) ensureSchemaKey(dbKey("public"))
  }
  def currentDatabase: String = currentDb
  def resetDatabase(): Unit = currentDb = "test"

  /** DROP DATABASE: evict every schema under it; returns the member-drop
    * statements (the marker path executes them). */
  def dropDatabase(raw: String): Seq[String] = {
    val db = norm(raw)
    val keys = canon.keys.filter(_.startsWith(s"$db/")).toSeq
    val drops = keys.flatMap(k =>
      members.getOrElse(canon(k), mutable.Set.empty).toSeq.sorted)
      .map(f => s"DROP TABLE IF EXISTS $f")
    keys.foreach { k => members.remove(canon(k)); canon.remove(k); () }
    if (currentDb == db) currentDb = "test"
    drops
  }

  private def ensureSchemaKey(key: String): Unit =
    if (!canon.contains(key)) {
      counter += 1
      canon(key) = s"gfts${counter}_" + key.replaceAll("\\W", "_")
      members.getOrElseUpdate(canon(key), mutable.Set.empty)
      ()
    }

  def reset(): Unit = {
    canon.clear(); members.clear(); counter = 0
    searchPath = Seq("public"); publicRels.clear(); typesBySchema.clear()
    currentDb = "test"
  }

  /** Parse-time `SET search_path = a, b` hook (pg: schemas need not
    * exist; resolution simply skips unknown ones). */
  def setSearchPath(raw: String): Unit = {
    val parts = raw.split(",").map(norm).filter(_.nonEmpty).toSeq
    searchPath = if (parts.isEmpty) Seq("public") else parts
  }
  def resetSearchPath(): Unit = searchPath = Seq("public")
  def currentSearchPath: Seq[String] = searchPath

  /** First schema on the path that CONTAINS a relation with this bare
    * name: Some(flatName). `None` when it resolves to public (or nowhere —
    * leave the bare spelling for Spark to resolve/reject). */
  def resolveBare(bare: String): Option[String] = {
    val n = norm(bare)
    searchPath.iterator.map(dbKey).flatMap {
      case "public" => if (publicRels.contains(n)) Some(Left(n)) else None
      case s => canon.get(s).flatMap { c =>
        val flat = s"${c}__$n"
        if (members.get(c).exists(_.contains(flat))) Some(Right(flat)) else None
      }
    }.nextOption().flatMap { case Right(f) => Some(f); case Left(_) => None }
  }

  /** The schema a bare CREATE lands in: the first path entry that exists
    * (pg's first valid creation schema); None = public. */
  def creationPrefix: Option[String] =
    searchPath.iterator.map(dbKey).flatMap {
      case "public" => Some(None)
      case s => canon.get(s).map(Some(_))
    }.nextOption().flatten

  /** Resolve a possibly-qualified relation spelling to its flat name:
    * Right(flat) or Left(pg error text). */
  def resolveRelation(spelling: String): Either[String, String] = {
    val parts = spelling.replace("\"", "").split("\\.").map(_.trim).toSeq
      .filter(_.nonEmpty)
    def strip(p: Seq[String]) =
      if (p.length > 2 && defaultDbs.contains(norm(p.head))) p.tail else p
    def bySchemaKey(key: String, n: String): Either[String, String] =
      if (key == "public") {
        if (publicRels.contains(n)) Right(n)
        else Left(s"""relation "$spelling" does not exist""")
      } else canon.get(key) match {
        case Some(c) if members.get(c).exists(_.contains(s"${c}__$n")) =>
          Right(s"${c}__$n")
        case Some(_) => Left(s"""relation "$spelling" does not exist""")
        case None => Left(s"""unknown schema '${key.split('/').last}'""")
      }
    strip(parts) match {
      case Seq(bare) =>
        val n = norm(bare)
        resolveBare(n) match {
          case Some(flat) => Right(flat)
          case None =>
            if (dbDefault && searchPath.contains("public") && publicRels.contains(n))
              Right(n)
            else Left(s"""relation "$spelling" does not exist""")
        }
      case Seq(schema, rel) =>
        bySchemaKey(dbKey(norm(schema)), norm(rel))
      case Seq(db, schema, rel) =>
        // explicit database qualification: default dbs were stripped above
        bySchemaKey(s"${norm(db)}/${norm(schema)}", norm(rel))
      case _ => Left(s"""relation "$spelling" does not exist""")
    }
  }

  /** pg regclass::text rendering: the bare name when the path resolves it
    * to the same relation, else the qualified spelling. */
  def visibleName(spelling: String, flat: String): String = {
    val bare = norm(spelling.replace("\"", "").split("\\.").last)
    val bareFlat = resolveBare(bare) match {
      case Some(f) => Some(f)
      case None if dbDefault && searchPath.contains("public") &&
          publicRels.contains(bare) =>
        Some(bare)
      case None => None
    }
    if (bareFlat.contains(flat)) bare
    else {
      // qualify with the owning schema's visible name (db part dropped —
      // pg renders the schema qualification only)
      val i = flat.indexOf("__")
      if (i > 0) {
        val prefix = flat.substring(0, i)
        canon.collectFirst { case (vis, c) if c == prefix =>
          s"${vis.split('/').last}.$bare" }
          .getOrElse(spelling)
      } else s"public.$bare"
    }
  }

  /** Record a public (unprefixed) relation created this file. */
  def notePublic(bare: String): Unit = publicRels += norm(bare)

  /** visible schema -> bare custom-type names (CREATE TYPE registry view,
    * for regtype::text's search_path-sensitive rendering). */
  private val typesBySchema = mutable.Map.empty[String, mutable.Set[String]]

  def noteType(spelling: String): Unit = {
    val parts = spelling.replace("\"", "").split("\\.").filter(_.trim.nonEmpty)
    val sch = if (parts.length >= 2) norm(parts(parts.length - 2)) else "public"
    typesBySchema.getOrElseUpdate(sch, mutable.Set.empty) += norm(parts.last)
  }

  /** pg regtype::text: bare when the path resolves the bare spelling to
    * the same type, else the qualified input spelling. */
  def visibleTypeName(spelling: String): String = {
    val parts = spelling.replace("\"", "").split("\\.").filter(_.trim.nonEmpty).toSeq
    if (parts.length != 2) return spelling.replace("\"", "")
    val sch = norm(parts.head); val n = norm(parts.last)
    val first = searchPath.find(s => typesBySchema.get(s).exists(_.contains(n)))
    if (first.contains(sch)) n else spelling.replace("\"", "")
  }

  /** pg current_schema(): the first schema on the path that exists. */
  def currentSchemaVisible: Option[String] =
    searchPath.find(s =>
      (s == "public" && dbDefault) || ambient.contains(s) ||
        canon.contains(dbKey(s)))

  /** pg current_schemas(include_implicit). */
  def currentSchemasVisible(implicitToo: Boolean): Seq[String] = {
    val existing = searchPath.filter(s =>
      (s == "public" && dbDefault) || ambient.contains(s) ||
        canon.contains(dbKey(s)))
    (if (implicitToo) Seq("mz_catalog", "pg_catalog") ++ existing
     else existing).distinct
  }

  def isEmpty: Boolean = canon.isEmpty

  private def norm(name: String): String = {
    val t = name.trim
    if (t.startsWith("\"") && t.endsWith("\"")) t.substring(1, t.length - 1)
    else t.toLowerCase
  }

  private val CreateRe =
    """(?is)^\s*CREATE\s+SCHEMA\s+(IF\s+NOT\s+EXISTS\s+)?("[^"]+"|[\w.]+)\s*;?\s*$""".r
  private val DropRe =
    """(?is)^\s*DROP\s+SCHEMA\s+(IF\s+EXISTS\s+)?("[^"]+"|[\w.]+)\s*(CASCADE|RESTRICT)?\s*;?\s*$""".r
  private val AlterRe =
    """(?is)^\s*ALTER\s+SCHEMA\s+("[^"]+"|[\w.]+)\s+RENAME\s+TO\s+("[^"]+"|\w+)\s*;?\s*$""".r

  /** Marker SQL handled by the runner's exec loop. */
  private def ok(drops: Seq[String] = Nil): String =
    "GRAFT_SCHEMA_DDL|ok|" + drops.mkString(";")
  private def err(msg: String): String = s"GRAFT_SCHEMA_DDL|err:$msg|"

  /** Classify-time hook: Some(markerSql) when `sql` is a schema DDL this
    * emulation owns; None otherwise. Mutates the registry. */
  def classify(sql: String): Option[String] = sql match {
    case CreateRe(ifNot, rawName) =>
      val name = norm(rawName.split("\\.").last)
      val dbPrefix = if (rawName.contains(".")) Some(norm(rawName.split("\\.").head)) else None
      Some {
        if (name.getBytes("UTF-8").length > 255)
          // reference catalog identifier limit (id_length.slt)
          err("identifier length exceeds 255 bytes")
        else if (dbPrefix.exists(p => p != "materialize" && p != currentDb))
          err(s"unknown database '${dbPrefix.get}'")
        else if (ambient.contains(name) || name.startsWith("mz_") || name.startsWith("pg_"))
          err(s"unacceptable schema name '$name'")
        else if (canon.contains(dbKey(name))) {
          if (ifNot != null) ok() else err(s"schema '$name' already exists")
        } else {
          counter += 1
          canon(dbKey(name)) = s"gfts${counter}_$name"
          ok()
        }
      }
    case DropRe(ifEx, rawName, cascade) =>
      val name = norm(rawName.split("\\.").last)
      Some {
        canon.get(dbKey(name)) match {
          case None =>
            // system/temporary schemas can never be dropped (reference
            // plan_drop_schema rejections), IF EXISTS notwithstanding
            if (name == "mz_temp")
              err("cannot drop schema mz_temp because it is a temporary schema")
            else if (name.startsWith("mz_") || name.startsWith("pg_") ||
                name == "information_schema")
              err(s"cannot drop schema $name because it is required by the database system")
            else if (ifEx != null || ambient.contains(name)) ok()
            else err(s"unknown schema '$name'")
          case Some(c) =>
            val ms = members.getOrElse(c, mutable.Set.empty).toSeq.sorted
            // TYPES count as contained objects too (they live in their own
            // registry — the emptiness check must see both)
            val hasTypes = typesBySchema.get(name).exists(_.nonEmpty)
            if ((ms.nonEmpty || hasTypes) &&
                (cascade == null || !cascade.equalsIgnoreCase("CASCADE")))
              err(s"schema '$name' cannot be dropped without CASCADE while it contains objects")
            else {
              canon.remove(dbKey(name)); members.remove(c)
              typesBySchema.remove(name)
              ok(ms.map(m => s"DROP TABLE IF EXISTS $m"))
            }
        }
      }
    case AlterRe(rawFrom, rawTo) =>
      val from = norm(rawFrom.split("\\.").last); val to = norm(rawTo)
      Some {
        if (!canon.contains(dbKey(from)))
          err(s"unknown schema '$from'")
        else if (ambient.contains(to) || to.startsWith("mz_") || to.startsWith("pg_"))
          err(s"unacceptable schema name '$to'")
        else if (canon.contains(dbKey(to)))
          err(s"schema '$to' already exists")
        else { canon(dbKey(to)) = canon.remove(dbKey(from)).get; ok() }
      }
    case _ => None
  }

  /** Parse-time name mangling: rewrites `[materialize.]<schema>.<rel>` to
    * the flat canonical name, outside string literals (the caller passes a
    * literal-free segment). Also records CREATE-d members for CASCADE. */
  def mangle(seg: String): String = {
    if (canon.isEmpty) return seg
    // visible schema spellings: the tail of each registry key, plus
    // `public` when a non-default database scopes it
    val visible = canon.keys.map(_.split('/').last).toSet ++
      (if (dbDefault) Set.empty[String] else Set("public"))
    val names = visible.map(java.util.regex.Pattern.quote).mkString("|")
    val re = s"""(?i)\\b(?:materialize\\s*\\.\\s*)?($names)\\s*\\.\\s*(?=[\\w"])""".r
    val qualified = re.replaceAllIn(seg, m =>
      canon.get(dbKey(norm(m.group(1)))) match {
        case Some(c) => scala.util.matching.Regex.quoteReplacement(c + "__")
        case None =>
          scala.util.matching.Regex.quoteReplacement(m.matched)
      })
    bareMangle(qualified)
  }

  /** search_path-aware bare-name pass: when a user schema PRECEDES public
    * on the path, a bare relation reference resolves into it (pg
    * resolution order). CREATE targets land in the path's first schema.
    * No-op on the default path. */
  private def bareMangle(seg: String): String = {
    if (searchPath == Seq("public") && dbDefault) return seg
    var out = seg
    // CREATE lands in the first (existing) path schema
    creationPrefix.foreach { prefix =>
      val CreateRe2 =
        """(?is)\b(CREATE\s+(?:TEMP(?:ORARY)?\s+)?(?:TABLE|MATERIALIZED\s+VIEW|VIEW)\s+(?:IF\s+NOT\s+EXISTS\s+)?)([A-Za-z_]\w*)\b(?!\s*\.)""".r
      out = CreateRe2.replaceAllIn(out, m =>
        scala.util.matching.Regex.quoteReplacement(
          m.group(1) + prefix + "__" + norm(m.group(2))))
    }
    // bare references that the path resolves into a user schema
    val renames: Map[String, String] = (for {
      (vis, c) <- canon.toSeq
      if searchPath.map(dbKey).contains(vis)
      flat <- members.getOrElse(c, mutable.Set.empty)
      bare = flat.substring(flat.indexOf("__") + 2)
      resolved <- resolveBare(bare)
    } yield bare -> resolved).toMap
    if (renames.isEmpty) return out
    val nameAlt = renames.keys.map(java.util.regex.Pattern.quote).mkString("|")
    val bareRe = s"""(?i)(?<![\\w".])($nameAlt)(?![\\w".(])""".r
    bareRe.replaceAllIn(out, m =>
      scala.util.matching.Regex.quoteReplacement(renames(norm(m.group(1)))))
  }

  /** Record a created member (called by the runner after mangling, from the
    * CREATE TABLE/VIEW statement text). */
  def noteCreate(mangled: String): Unit = {
    val i = mangled.indexOf("__")
    if (i > 0) {
      val prefix = mangled.substring(0, i)
      if (canon.values.exists(_ == prefix))
        members.getOrElseUpdate(prefix, mutable.Set.empty) += mangled
      else publicRels += norm(mangled)
    } else publicRels += norm(mangled)
  }

  /** Parsed marker: (isOk, errMsg, memberDrops). */
  def parseMarker(sql: String): Option[(Boolean, String, Seq[String])] =
    if (!sql.startsWith("GRAFT_SCHEMA_DDL|")) None
    else {
      val rest = sql.stripPrefix("GRAFT_SCHEMA_DDL|")
      val bar = rest.lastIndexOf('|')
      val (head, drops) = (rest.substring(0, bar), rest.substring(bar + 1))
      val dropSeq = if (drops.isEmpty) Nil else drops.split(";").toSeq
      if (head == "ok") Some((true, "", dropSeq))
      else Some((false, head.stripPrefix("err:"), dropSeq))
    }
}
