package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** pg-specific functions (reference binary.rs:323-430, variadic.rs:1705-1749):
  * date_bin with origin, digest/encode/decode, HMAC (custom Catalyst
  * expression), uuid_generate_v5, and range-type operators. hmac/uuid5 have
  * no DuckDB equivalents, so their oracle is a literal table generated with
  * an independent implementation (python hashlib/hmac/uuid over the same
  * rows) — the strongest cross-check available for those.
  */
object PgFunctionQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** RFC 4122 DNS namespace 6ba7b810-9dad-11d1-80b4-00c04fd430c8. */
  private val NsDns = "6ba7b8109dad11d180b400c04fd430c8"

  val defs: Seq[Q] = Seq(

    // date_bin(width, ts, origin) — pg 14 semantics (floor division, bins
    // anchored at an arbitrary origin; reference binary.rs DateBin* and
    // variadic DateBin with origin).
    Q("fn_pg_datebin",
      """SELECT strftime(time_bucket(INTERVAL 15 MINUTE, ts, TIMESTAMP '2024-01-01 00:07:00'),
        |         '%Y-%m-%d %H:%M:%S') AS bin_start,
        |  count(*) AS n
        |FROM events GROUP BY bin_start""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy(date_format(
          PgFunctions.dateBin(900L, col("ts"), lit("2024-01-01 00:07:00").cast("timestamp")),
          "yyyy-MM-dd HH:mm:ss").as("bin_start"))
        .agg(count(lit(1)).as("n"))
    },

    // digest / encode / decode (reference binary.rs:363-393): md5, sha256,
    // base64 round-trip, hex — all DuckDB-checkable directly.
    Q("fn_pg_digest",
      """SELECT n_name,
        |  md5(n_name) AS d_md5,
        |  sha256(n_name) AS d_sha256,
        |  base64(n_name::BLOB) AS b64,
        |  decode(from_base64(base64(n_name::BLOB))) AS roundtrip,
        |  lower(hex(n_name)) AS hexed
        |FROM nation""".stripMargin) { (s, dir) =>
      t(s, dir, "nation").select(
        col("n_name"),
        md5(col("n_name").cast("binary")).as("d_md5"),
        sha2(col("n_name").cast("binary"), 256).as("d_sha256"),
        base64(encode(col("n_name"), "UTF-8")).as("b64"),
        decode(unbase64(base64(encode(col("n_name"), "UTF-8"))), "UTF-8").as("roundtrip"),
        lower(hex(col("n_name"))).as("hexed"))
    },

    // hmac (custom Catalyst Expression, whole-stage-codegen'd) and
    // uuid_generate_v5 (pure built-in composition) against an independent
    // python-hashlib oracle table over the same nation rows.
    Q("fn_pg_hmac_uuid",
      """SELECT * FROM (VALUES
        |  ('NATION_0', '448cf030c7da8e1581d0fafa609d7549b474d6187d7bf3cdc94dbfc61e21a9ab', 'eca51a0d-3ccf-5412-ad05-6f18cce37151'),
        |  ('NATION_1', '6b7178cd96d69deabc644dc48dac78c496dd3aa48d814292c2ebf68d35f7f786', 'fb64fdf1-8117-5655-b63f-5924c22d9909'),
        |  ('NATION_10', '585b386f7dd782b31f0b88c93735671bdc99f2cd549b1495041dcd65a15d6422', 'bd55af78-598f-5e1a-8b76-dd42143ba89f'),
        |  ('NATION_11', '6f500bcca7e3de1ecead49a91448d240105f19df8b2e74f06c0261e0c545545b', '4d3488b4-4c44-5305-b714-2e54f2fe0397'),
        |  ('NATION_12', 'babe66a1f8f68d665a543a998f0bb8633415649d98e1dc5cb3401d8a9b8a807d', 'bcda4f32-f7b4-5145-b210-c81d8886d7b5'),
        |  ('NATION_13', '0f4beca6894bda58898238ded154349683dc19c6eddbd28f78f5fc531c32d581', '95273278-1d57-572c-a8bc-da8c81365e09'),
        |  ('NATION_14', '90fb3b61a1f60355c20aef4de4701eb45cd00eb1e0ec9fb9b92c1b9ae3b8d7ff', '231b372e-949d-5550-bbe3-cc9716436f9d'),
        |  ('NATION_15', 'be17a0149b9ffde74149442a6989c8e054518f9615504d13061bbc9c30fce9d3', 'a070391b-43ac-52bf-b945-8a71cf3316e8'),
        |  ('NATION_16', '1b4624abe7f115f5199d1f50e1bbb16632721027cf3a90a1b16e5d23b4a2ddad', 'b6bf5532-af85-512c-a4fc-d2138d6722e2'),
        |  ('NATION_17', '1f9be289385c0bfd214a5ce990c8775872c6311187f828dc85629f9282838c7b', 'e136b322-6d08-549e-acea-b37278cd1a2c'),
        |  ('NATION_18', 'dd15f138dfc72f57c160c1d5618c8c498760b5ab5ba34a34d5a7f2ab69fb35e7', '7a93bc64-0e22-55ce-ad16-1e3e83161859'),
        |  ('NATION_19', '9909c555bdb7d9c41ec86f99c90fd3454d56db45bd8ed9de7a4e843ef6f2680f', 'bb9d566f-f040-5164-9c36-56350a96e2f0'),
        |  ('NATION_2', '666f36002b7ba48f0c4c5c70ff39aa981188f327de9679a546ae1226f5785aeb', '08ae2c1e-da8e-5996-83e5-12499e500f23'),
        |  ('NATION_20', 'b6e3d4a61a15c94b5de5ade3e4627c6d4844b9cd620798e0bcb2412e90484217', 'd0a0e6a8-1813-56fa-8826-60db4ae16ffb'),
        |  ('NATION_21', '29df8db1acd706798f5250c9ff131e3ba367924d10073c26a3ca254c7e3af76f', '99f02306-b641-538b-a9be-7997b33a7034'),
        |  ('NATION_22', '00e5a974805850bce2cffaf5cfb4dca5816dce7fdc17b756fbf288dc4df65a87', '49f08618-bc73-5aba-8a11-c8dd092a0758'),
        |  ('NATION_23', '8b7debb30cf2eb9792a05de6ca3e32d2ade841e963ac1521e6c3b165ee266703', 'c1ebfb67-5f6a-54ae-92c9-813868b597da'),
        |  ('NATION_24', 'cd3d76788776a39cfbc9fc9bcc553c96f955d376d4a0c1d803a5faa480d17ae9', '42c9a6a5-5507-5607-be51-913616e8fb57'),
        |  ('NATION_3', '555f9ea68246a36e9a344dcd5c51f37c6ef74ceec20f9dc3e346448ed091bb01', '187d4d60-fa1b-5a66-af61-0b26ba5503e8'),
        |  ('NATION_4', '47240a61b834acc08680d9dd0b5baf2b151867cc1fbe8d2bb3a72cd118a52e50', '942ecb3b-87b0-547e-af5b-f53c39739cc1'),
        |  ('NATION_5', 'e9708ffe103e4b93b72039c2f6c25959cb6ae8c1eb500fe61010ac72c7514ab7', '2aa6005f-35d9-5d53-b154-29c425182de5'),
        |  ('NATION_6', '44a4d75052836e198f9df0f7f1b0d0e6e3fdea657f6780573deda3ef9eae586c', 'fc111dfb-2d36-5862-8c5d-1a85090b677c'),
        |  ('NATION_7', '6cc14fcc2be90ab745acc03e46488042a8f3bfabf7753f885864265aea2ce434', '6e30cff6-caa1-5ae8-8241-7f2562f9f2fb'),
        |  ('NATION_8', 'fbc1d4bb05760520effcc88df029ab958ef67bca9ced8bfc7c139146e28195e1', '11a8551b-326c-5174-a512-83ddc3dcb9c6'),
        |  ('NATION_9', '7a176c550a321ace68c0f7d1b7efd9b3c88daa487f8303f73de3686f46c8c406', 'bd214624-651e-5f46-b9ef-62230a7e1690'))
        |  t(n_name, hmac_hex, uuid_v5)""".stripMargin) { (s, dir) =>
      GraftFunctions.register(s)
      t(s, dir, "nation").select(
        col("n_name"),
        expr("hmac_sha256('graft-secret-key', n_name)").as("hmac_hex"),
        PgFunctions.uuidV5(NsDns, col("n_name")).as("uuid_v5"))
    },

    // Range type ops over struct-encoded int ranges (reference
    // binary.rs:401-421): emptiness normalization, @> point, && overlap,
    // range-in-range, strictly-left — against a fixed range [50, 80).
    Q("fn_pg_range",
      """SELECT o_orderkey,
        |  (l1 >= u1) AS is_empty,
        |  ((NOT l1 >= u1) AND p >= l1 AND p < u1) AS contains_pt,
        |  ((NOT l1 >= u1) AND l1 < 80 AND 50 < u1) AS overlaps_fixed,
        |  ((l1 >= u1) OR (l1 >= 50 AND u1 <= 80)) AS within_fixed,
        |  ((NOT l1 >= u1) AND u1 <= 50) AS left_of_fixed
        |FROM (SELECT o_orderkey, o_orderkey % 100 AS l1,
        |        o_orderkey % 100 + o_custkey % 20 - 5 AS u1,
        |        o_custkey % 120 AS p
        |      FROM orders)""".stripMargin) { (s, dir) =>
      import PgFunctions._
      val base = t(s, dir, "orders").select(
        col("o_orderkey"),
        (col("o_orderkey") % 100).as("l1"),
        (col("o_orderkey") % 100 + col("o_custkey") % 20 - 5).as("u1"),
        (col("o_custkey") % 120).as("p"))
      val fixed = intRange(lit(50L), lit(80L))
      base
        .withColumn("r", intRange(col("l1"), col("u1")))
        .select(
          col("o_orderkey"),
          col("r").getField("empty").as("is_empty"),
          rangeContains(col("r"), col("p")).as("contains_pt"),
          rangeOverlaps(col("r"), fixed).as("overlaps_fixed"),
          rangeContainsRange(fixed, col("r")).as("within_fixed"),
          rangeStrictlyLeft(col("r"), fixed).as("left_of_fixed"))
    }
  )
}
