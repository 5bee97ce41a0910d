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

  /** Ambient schemas — not creatable/droppable/renamable-to. */
  private val ambient = Set("public", "mz_catalog", "pg_catalog", "mz_internal",
    "information_schema", "mz_unsafe", "mz_catalog_unstable", "mz_introspection",
    "mz_temp")

  def reset(): Unit = { canon.clear(); members.clear(); counter = 0 }

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
        if (dbPrefix.exists(_ != "materialize"))
          err(s"unknown database '${dbPrefix.get}'")
        else if (ambient.contains(name) || name.startsWith("mz_") || name.startsWith("pg_"))
          err(s"unacceptable schema name '$name'")
        else if (canon.contains(name)) {
          if (ifNot != null) ok() else err(s"schema '$name' already exists")
        } else {
          counter += 1
          canon(name) = s"gfts${counter}_$name"
          ok()
        }
      }
    case DropRe(ifEx, rawName, cascade) =>
      val name = norm(rawName.split("\\.").last)
      Some {
        canon.get(name) match {
          case None =>
            if (ifEx != null || ambient.contains(name)) ok()
            else err(s"unknown schema '$name'")
          case Some(c) =>
            val ms = members.getOrElse(c, mutable.Set.empty).toSeq.sorted
            if (ms.nonEmpty && (cascade == null || !cascade.equalsIgnoreCase("CASCADE")))
              err(s"schema '$name' cannot be dropped without CASCADE while it contains objects")
            else {
              canon.remove(name); members.remove(c)
              ok(ms.map(m => s"DROP TABLE IF EXISTS $m"))
            }
        }
      }
    case AlterRe(rawFrom, rawTo) =>
      val from = norm(rawFrom.split("\\.").last); val to = norm(rawTo)
      Some {
        if (!canon.contains(from))
          err(s"unknown schema '$from'")
        else if (ambient.contains(to) || to.startsWith("mz_") || to.startsWith("pg_"))
          err(s"unacceptable schema name '$to'")
        else if (canon.contains(to))
          err(s"schema '$to' already exists")
        else { canon(to) = canon.remove(from).get; ok() }
      }
    case _ => None
  }

  /** Parse-time name mangling: rewrites `[materialize.]<schema>.<rel>` to
    * the flat canonical name, outside string literals (the caller passes a
    * literal-free segment). Also records CREATE-d members for CASCADE. */
  def mangle(seg: String): String = {
    if (canon.isEmpty) return seg
    val names = canon.keys.map(java.util.regex.Pattern.quote).mkString("|")
    val re = s"""(?i)\\b(?:materialize\\s*\\.\\s*)?($names)\\s*\\.\\s*(?=[\\w"])""".r
    re.replaceAllIn(seg, m =>
      scala.util.matching.Regex.quoteReplacement(canon(norm(m.group(1))) + "__"))
  }

  /** Record a created member (called by the runner after mangling, from the
    * CREATE TABLE/VIEW statement text). */
  def noteCreate(mangled: String): Unit = {
    val i = mangled.indexOf("__")
    if (i > 0) {
      val prefix = mangled.substring(0, i)
      if (canon.values.exists(_ == prefix))
        members.getOrElseUpdate(prefix, mutable.Set.empty) += mangled
    }
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
