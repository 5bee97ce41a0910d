package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** pg-specific function surface the reference provides beyond ANSI SQL
  * (reference `src/expr/src/scalar/func/binary.rs:323-430`,
  * `variadic.rs:1705-1749`), composed from codegen'd Spark built-ins —
  * no UDFs.
  */
object PgFunctions {

  /** `date_bin(width, ts, origin)` — bucket `ts` into `width`-second bins
    * anchored at `origin` (reference binary.rs DateBin; pg 14 semantics:
    * floor division, so timestamps before the origin land in earlier bins).
    * Computed in epoch MICROSECONDS (pg's native timestamp resolution) with
    * pure integer arithmetic — sub-second inputs bin exactly, no truncation
    * and no double rounding. For sub-second widths use [[dateBinMicros]]. */
  def dateBin(widthSec: Long, ts: Column, origin: Column): Column =
    dateBinMicros(Math.multiplyExact(widthSec, 1000000L), ts, origin)

  /** [[dateBin]] with the width in microseconds. The bin start is
    * `ts - ((ts - origin) mod width)` with a floor (always-non-negative)
    * modulus, all in long µs — matching pg 14 `date_bin` to the µs. */
  def dateBinMicros(widthUs: Long, ts: Column, origin: Column): Column = {
    require(widthUs > 0, s"date_bin width must be positive, got ${widthUs}us")
    val w = lit(widthUs)
    val delta = unix_micros(ts) - unix_micros(origin)
    val behind = ((delta % w) + w) % w
    timestamp_micros(unix_micros(ts) - behind)
  }

  /** `uuid_generate_v5(namespace_uuid_hex, name)` — RFC 4122 §4.3
    * name-based UUID: SHA-1 over namespace bytes ++ name bytes, version
    * nibble forced to 5, variant bits to 10xx (reference binary.rs
    * UuidGenerateV5). Pure built-in composition: sha1/concat/unhex/conv —
    * whole-stage-codegen friendly. */
  def uuidV5(namespaceHex: String, name: Column): Column = {
    val h = sha1(concat(unhex(lit(namespaceHex)), encode(name, "UTF-8")))
    val variantDigit = lower(conv(
      (conv(substring(h, 17, 1), 16, 10).cast("int") % 4 + 8).cast("string"), 10, 16))
    concat_ws("-",
      substring(h, 1, 8),
      substring(h, 9, 4),
      concat(lit("5"), substring(h, 14, 3)),
      concat(variantDigit, substring(h, 18, 3)),
      substring(h, 21, 12))
  }

  // ---- Range type as struct (reference SqlScalarType::Range,
  // `src/repr/src/scalar.rs:1753-1755`; ops binary.rs:401-421). Canonical
  // form: half-open [lower, upper) over discrete types; `empty` normalizes
  // lower >= upper, matching pg's int4range canonicalization.

  /** Construct an int range `[lower, upper)` as a struct. */
  def intRange(lower: Column, upper: Column): Column =
    struct(
      lower.as("lower"),
      upper.as("upper"),
      (lower >= upper).as("empty"))

  /** `range @> point` (binary.rs RangeContainsElem). */
  def rangeContains(r: Column, point: Column): Column =
    !r.getField("empty") && point >= r.getField("lower") && point < r.getField("upper")

  /** `r1 && r2` — overlap (binary.rs RangeOverlaps). */
  def rangeOverlaps(r1: Column, r2: Column): Column =
    !r1.getField("empty") && !r2.getField("empty") &&
      r1.getField("lower") < r2.getField("upper") &&
      r2.getField("lower") < r1.getField("upper")

  /** `r1 @> r2` — range contains range (binary.rs RangeContainsRange). */
  def rangeContainsRange(r1: Column, r2: Column): Column =
    r2.getField("empty") ||
      (!r1.getField("empty") &&
        r1.getField("lower") <= r2.getField("lower") &&
        r2.getField("upper") <= r1.getField("upper"))

  /** `r1 << r2` — strictly left of (binary.rs RangeBefore). */
  def rangeStrictlyLeft(r1: Column, r2: Column): Column =
    !r1.getField("empty") && !r2.getField("empty") &&
      r1.getField("upper") <= r2.getField("lower")
}
