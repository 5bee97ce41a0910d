package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PgEncodingImpl
import graft.sql.CanonicalSql

/** pg encode/decode codec semantics (reference
  * src/expr/src/scalar/func/encoding.rs; test/sqllogictest/encode.slt) and
  * the canonical SHOW CREATE TABLE rendering. Pure row-level logic — no
  * SparkSession needed. */
class PgEncodingSpec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("hex encode/decode round trip") {
    assert(PgEncodingImpl.encode(bytes(0, 255, 254, 101), "hex") == "00fffe65")
    assert(PgEncodingImpl.decode("00fffe65", "hex").toSeq == bytes(0, 255, 254, 101).toSeq)
    // whitespace between encoded bytes is legal; inside a byte is not
    assert(PgEncodingImpl.decode("41 42\t43", "hex").toSeq == "ABC".getBytes.toSeq)
    val e1 = intercept[IllegalArgumentException](PgEncodingImpl.decode("a a", "hex"))
    assert(e1.getMessage.contains("invalid hexadecimal digit: \" \""))
    val e2 = intercept[IllegalArgumentException](PgEncodingImpl.decode("0", "hex"))
    assert(e2.getMessage.contains("odd number of digits"))
  }

  test("base64 mime encode wraps at 76 chars and decode ignores whitespace") {
    assert(PgEncodingImpl.encode("abc".getBytes, "base64") == "YWJj")
    assert(PgEncodingImpl.encode("ab".getBytes, "base64") == "YWI=")
    assert(PgEncodingImpl.encode("a".getBytes, "base64") == "YQ==")
    assert(PgEncodingImpl.encode(bytes(0, 255, 254, 101), "base64") == "AP/+ZQ==")
    val long = PgEncodingImpl.encode(("abcdefghijklmnopqrstuvwxyz" * 6).getBytes, "base64")
    val lines = long.split("\n")
    assert(lines.head.length == 76 && lines.forall(_.length <= 76))
    assert(PgEncodingImpl.decode(long, "base64").toSeq ==
      ("abcdefghijklmnopqrstuvwxyz" * 6).getBytes.toSeq)
    assert(intercept[IllegalArgumentException](
      PgEncodingImpl.decode("a", "base64")).getMessage.contains("end sequence"))
    assert(intercept[IllegalArgumentException](
      PgEncodingImpl.decode("=", "base64")).getMessage.contains("unexpected \"=\""))
    assert(intercept[IllegalArgumentException](
      PgEncodingImpl.decode("aaa@", "base64")).getMessage
      .contains("invalid symbol \"@\""))
  }

  test("escape format: NUL and high bytes octal, backslash doubled") {
    assert(PgEncodingImpl.encode(bytes(0, 255, 254, 101), "escape") == "\\000\\377\\376e")
    assert(PgEncodingImpl.decode("\\000\\377\\376e", "escape").toSeq ==
      bytes(0, 255, 254, 101).toSeq)
    assert(PgEncodingImpl.encode("a\\b".getBytes, "escape") == "a\\\\b")
    assert(intercept[IllegalArgumentException](
      PgEncodingImpl.decode("\\9", "escape")).getMessage
      .contains("invalid input syntax for type bytea"))
  }

  test("unknown format raises the reference's error text") {
    assert(intercept[IllegalArgumentException](
      PgEncodingImpl.encode(Array[Byte](1), "hex2")).getMessage ==
      "invalid encoding name 'hex2'")
  }

  test("bytea input conversion: \\x hex prefix or traditional escapes") {
    assert(PgEncodingImpl.parseBytes("\\x00fffe65").toSeq == bytes(0, 255, 254, 101).toSeq)
    assert(PgEncodingImpl.parseBytes("abc").toSeq == "abc".getBytes.toSeq)
  }

  test("canonical SHOW CREATE TABLE rendering") {
    assert(CanonicalSql.canonicalTable("CREATE TABLE t (a int)") ==
      Some("CREATE TABLE materialize.public.t (a pg_catalog.int4);"))
    assert(CanonicalSql.canonicalTable(
      "CREATE TABLE t (a int) WITH (RETAIN HISTORY FOR '1000 hours')") ==
      Some("CREATE TABLE materialize.public.t (a pg_catalog.int4) " +
        "WITH (RETAIN HISTORY = FOR '1000 hours');"))
    assert(CanonicalSql.canonicalTable("CREATE TABLE s.t (x int4, y text)") ==
      Some("CREATE TABLE materialize.s.t (x pg_catalog.int4, y pg_catalog.text);"))
    assert(CanonicalSql.canonicalTable(
      "CREATE TABLE t (a int NOT NULL, b varchar(10))") ==
      Some("CREATE TABLE materialize.public.t (a pg_catalog.int4 NOT NULL, " +
        "b pg_catalog.varchar(10));"))
    // table-level constraints leave the canonical single-line regime
    assert(CanonicalSql.canonicalTable(
      "CREATE TABLE t (a int, PRIMARY KEY (a))").isEmpty)
  }
}
