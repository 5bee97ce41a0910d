package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Scalar-function library coverage — the reference's three macro-generated
  * enums (~334 unary / ~230 binary / ~45 variadic variants, reference
  * `src/expr/src/scalar/func/{unary,binary,variadic}.rs`) map ~95% onto
  * `org.apache.spark.sql.functions` built-ins (SURVEY §2.5); these queries
  * pin the exact cross-engine semantics (return types, 1-based indexing,
  * null behavior, truncation-vs-rounding casts).
  *
  * All functions here are codegen'd Catalyst expressions — no UDFs — so every
  * query stays inside WholeStageCodegen at any scale.
  *
  * Determinism conventions vs the DuckDB oracle:
  *  - transcendental results are rounded to 10 dp (libm vs JDK may differ in
  *    the final ulp);
  *  - integer-returning functions are cast to the Spark return type in the
  *    oracle SQL (DuckDB widens to BIGINT/HUGEINT);
  *  - double→int casts go through floor/trunc (Spark truncates, DuckDB
  *    rounds).
  */
object FunctionQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val defs: Seq[Q] = Seq(

    Q("fn_string",
      """SELECT p_partkey,
        |  upper(p_name) AS up,
        |  lower(p_brand) AS lo,
        |  CAST(length(p_name) AS INT) AS len,
        |  substr(p_name, 3, 5) AS sub,
        |  trim(p_name) AS trimmed,
        |  lpad(p_name, 20, '*') AS lpadded,
        |  rpad(p_brand, 12, '.') AS rpadded,
        |  replace(p_name, 'a', 'X') AS repl,
        |  reverse(p_name) AS rev,
        |  split_part(p_name, ' ', 2) AS second_word,
        |  CAST(strpos(p_name, 'a') AS INT) AS pos_a,
        |  repeat(substr(p_brand, 1, 2), 3) AS rep,
        |  left(p_name, 4) AS lft,
        |  right(p_name, 4) AS rgt,
        |  CAST(ascii(p_name) AS INT) AS asc_first,
        |  chr(65 + CAST(p_partkey % 26 AS INT)) AS chr_mod,
        |  translate(p_name, 'abc', 'xyz') AS transl,
        |  concat_ws('-', p_brand, p_type) AS cw,
        |  p_name LIKE '%a%' AS has_a,
        |  md5(p_name) AS md5_hex,
        |  sha256(p_name) AS sha_hex
        |FROM part WHERE p_partkey < 500""".stripMargin) { (s, dir) =>
      t(s, dir, "part").filter(col("p_partkey") < 500)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("up"),
          lower(col("p_brand")).as("lo"),
          length(col("p_name")).as("len"),
          substring(col("p_name"), 3, 5).as("sub"),
          trim(col("p_name")).as("trimmed"),
          lpad(col("p_name"), 20, "*").as("lpadded"),
          rpad(col("p_brand"), 12, ".").as("rpadded"),
          regexp_replace(col("p_name"), lit("a"), lit("X")).as("repl"),
          reverse(col("p_name")).as("rev"),
          split_part(col("p_name"), lit(" "), lit(2)).as("second_word"),
          instr(col("p_name"), "a").as("pos_a"),
          repeat(substring(col("p_brand"), 1, 2), 3).as("rep"),
          substring(col("p_name"), 1, 4).as("lft"),
          col("p_name").substr(length(col("p_name")) - 3, lit(4)).as("rgt"),
          ascii(col("p_name")).as("asc_first"),
          chr(lit(65) + (col("p_partkey") % 26).cast("int")).as("chr_mod"),
          translate(col("p_name"), "abc", "xyz").as("transl"),
          concat_ws("-", col("p_brand"), col("p_type")).as("cw"),
          col("p_name").like("%a%").as("has_a"),
          md5(col("p_name")).as("md5_hex"),
          sha2(col("p_name"), 256).as("sha_hex"))
    },

    Q("fn_math",
      """SELECT n,
        |  abs(-n) AS abs_n,
        |  CAST(ceil(n / 7.0) AS BIGINT) AS ceil_x,
        |  CAST(floor(n / 7.0) AS BIGINT) AS floor_x,
        |  round(n / 7.0, 3) AS round_x,
        |  sqrt(n) AS sqrt_n,
        |  round(exp(n / 400.0), 10) AS exp_x,
        |  round(ln(n), 10) AS ln_n,
        |  round(log10(n), 10) AS log10_n,
        |  round(log2(n), 10) AS log2_n,
        |  n * n AS pow2,
        |  n % 7 AS mod7,
        |  CAST(sign(n - 200) AS INT) AS sgn,
        |  pi() AS pi_const,
        |  round(sin(n / 100.0), 10) AS sin_x,
        |  round(cos(n / 100.0), 10) AS cos_x,
        |  round(atan(n / 100.0), 10) AS atan_x,
        |  round(degrees(n / 100.0), 10) AS deg_x,
        |  round(radians(n), 10) AS rad_n
        |FROM (SELECT unnest(generate_series(1, 400)) AS n)""".stripMargin) { (s, _) =>
      s.range(1, 401).select(col("id").as("n"))
        .select(
          col("n"),
          abs(-col("n")).as("abs_n"),
          ceil(col("n") / 7.0).as("ceil_x"),
          floor(col("n") / 7.0).as("floor_x"),
          round(col("n") / 7.0, 3).as("round_x"),
          sqrt(col("n")).as("sqrt_n"),
          round(exp(col("n") / 400.0), 10).as("exp_x"),
          round(log(col("n")), 10).as("ln_n"),
          round(log10(col("n")), 10).as("log10_n"),
          round(log2(col("n")), 10).as("log2_n"),
          (col("n") * col("n")).as("pow2"),
          (col("n") % 7).as("mod7"),
          signum(col("n") - 200).cast("int").as("sgn"),
          lit(math.Pi).as("pi_const"),
          round(sin(col("n") / 100.0), 10).as("sin_x"),
          round(cos(col("n") / 100.0), 10).as("cos_x"),
          round(atan(col("n") / 100.0), 10).as("atan_x"),
          round(degrees(col("n") / 100.0), 10).as("deg_x"),
          round(radians(col("n")), 10).as("rad_n"))
    },

    Q("fn_datetime",
      """SELECT event_id,
        |  CAST(year(ts) AS INT) AS y,
        |  CAST(month(ts) AS INT) AS mo,
        |  CAST(day(ts) AS INT) AS d,
        |  CAST(hour(ts) AS INT) AS hh,
        |  CAST(minute(ts) AS INT) AS mi,
        |  CAST(quarter(ts) AS INT) AS q,
        |  CAST(dayofyear(ts) AS INT) AS doy,
        |  CAST(isodow(ts) - 1 AS INT) AS dow_mon0,
        |  strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS trunc_day,
        |  strftime(date_trunc('month', ts), '%Y-%m-%d') AS trunc_month,
        |  strftime(ts + INTERVAL 3 DAY, '%Y-%m-%d %H:%M:%S') AS plus_3d,
        |  CAST(date_diff('day', TIMESTAMP '2024-01-01', ts) AS INT) AS days_since,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
        |  strftime(last_day(ts), '%Y-%m-%d') AS month_end,
        |  strftime(ts, '%Y-%m-%d') AS ds
        |FROM events WHERE user_id < 50""".stripMargin) { (s, dir) =>
      t(s, dir, "events").filter(col("user_id") < 50)
        .select(
          col("event_id"),
          year(col("ts")).as("y"),
          month(col("ts")).as("mo"),
          dayofmonth(col("ts")).as("d"),
          hour(col("ts")).as("hh"),
          minute(col("ts")).as("mi"),
          quarter(col("ts")).as("q"),
          dayofyear(col("ts")).as("doy"),
          weekday(col("ts")).as("dow_mon0"),
          date_format(date_trunc("day", col("ts")), "yyyy-MM-dd HH:mm:ss").as("trunc_day"),
          date_format(date_trunc("month", col("ts")), "yyyy-MM-dd").as("trunc_month"),
          date_format(col("ts") + expr("INTERVAL 3 DAYS"), "yyyy-MM-dd HH:mm:ss").as("plus_3d"),
          datediff(col("ts"), lit("2024-01-01").cast("timestamp")).as("days_since"),
          unix_timestamp(col("ts")).as("epoch_s"),
          date_format(last_day(col("ts")), "yyyy-MM-dd").as("month_end"),
          date_format(col("ts"), "yyyy-MM-dd").as("ds"))
    },

    Q("fn_conditional",
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice < 100000 THEN 'low'
        |       WHEN o_totalprice < 300000 THEN 'mid'
        |       ELSE 'high' END AS bucket,
        |  coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open,
        |  greatest(o_totalprice, 250000.0) AS at_least,
        |  least(o_totalprice, 250000.0) AS at_most,
        |  CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END AS is_urgent
        |FROM orders WHERE o_orderkey < 2000""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").filter(col("o_orderkey") < 2000)
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") < 100000, "low")
            .when(col("o_totalprice") < 300000, "mid")
            .otherwise("high").as("bucket"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status_or_open"),
          greatest(col("o_totalprice"), lit(250000.0)).as("at_least"),
          least(col("o_totalprice"), lit(250000.0)).as("at_most"),
          when(col("o_orderpriority").like("1%"), 1).otherwise(0).as("is_urgent"))
    },

    Q("fn_cast",
      """SELECT o_orderkey,
        |  CAST(trunc(o_totalprice) AS BIGINT) AS price_int,
        |  CAST(o_orderkey AS VARCHAR) AS key_str,
        |  CAST('123' AS INT) AS s2i,
        |  CAST('12.5' AS DOUBLE) AS s2d,
        |  TRY_CAST('abc' AS INT) AS bad_int,
        |  TRY_CAST('2024-03-05' AS DATE) IS NOT NULL AS good_date,
        |  CAST(o_totalprice > 250000 AS INT) AS flag_int
        |FROM orders WHERE o_orderkey < 2000""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").filter(col("o_orderkey") < 2000)
        .select(
          col("o_orderkey"),
          col("o_totalprice").cast("long").as("price_int"),
          col("o_orderkey").cast("string").as("key_str"),
          lit("123").cast("int").as("s2i"),
          lit("12.5").cast("double").as("s2d"),
          expr("try_cast('abc' AS INT)").as("bad_int"),
          expr("try_cast('2024-03-05' AS DATE) IS NOT NULL").as("good_date"),
          (col("o_totalprice") > 250000).cast("int").as("flag_int"))
    },

    // Jsonb ops (reference scalar.rs:1694-1705, binary.rs:346-357) over the
    // events.props JSON column — Spark JSON path functions.
    Q("fn_json",
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
        |  CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS missing,
        |  json_extract_string(props, '$.k') IS NOT NULL AS has_k
        |FROM events WHERE user_id < 50""".stripMargin) { (s, dir) =>
      t(s, dir, "events").filter(col("user_id") < 50)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.k").cast("int").as("k_int"),
          get_json_object(col("props"), "$.missing").as("missing"),
          get_json_object(col("props"), "$.k").isNotNull.as("has_k"))
    },

    Q("fn_regex",
      """SELECT doc_id,
        |  regexp_extract(text, '([a-z]{6,})', 1) AS long_word,
        |  regexp_replace(text, ' +', '_', 'g') AS underscored,
        |  regexp_matches(text, 'data.*spark') AS has_pat,
        |  CAST(len(regexp_extract_all(text, 'the', 0)) AS INT) AS cnt_the
        |FROM documents WHERE doc_id < 100""".stripMargin) { (s, dir) =>
      t(s, dir, "documents").filter(col("doc_id") < 100)
        .select(
          col("doc_id"),
          regexp_extract(col("text"), "([a-z]{6,})", 1).as("long_word"),
          regexp_replace(col("text"), " +", "_").as("underscored"),
          col("text").rlike("data.*spark").as("has_pat"),
          size(expr("regexp_extract_all(text, 'the', 0)")).as("cnt_the"))
    },

    // Array/list ops (reference binary.rs:374-387, variadic.rs ArrayCreate
    // etc.) — Spark higher-order functions, all codegen-friendly. Array-typed
    // outputs are projected through array_to_string so the driver's
    // comparator (which can't hash raw array cells) sees canonical strings;
    // the array-native computation stays internal.
    Q("fn_array",
      """SELECT n,
        |  array_to_string([n, n + 1, n + 2], ',') AS arr_s,
        |  CAST(len([n, n + 1, n + 2]) AS INT) AS sz,
        |  list_contains([n, n + 1, n + 2], 2) AS has2,
        |  [n, n + 1, n + 2][2] AS elem2,
        |  array_to_string([n, n + 1, n + 2][2:3], ',') AS sliced_s,
        |  CAST(list_sum([n, n + 1, n + 2]) AS BIGINT) AS summed,
        |  array_to_string(list_sort([n + 2, n, n + 1]), ',') AS sorted_s,
        |  array_to_string([n, n + 1, n + 2], ',') AS joined,
        |  array_to_string(list_transform([n, n + 1, n + 2], x -> x * 10), ',') AS times10_s,
        |  array_to_string(list_filter([n, n + 1, n + 2], x -> x % 2 = 0), ',') AS evens_s
        |FROM (SELECT unnest(generate_series(1, 100)) AS n)""".stripMargin) { (s, _) =>
      def str(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        array_join(transform(c, _.cast("string")), ",")
      s.range(1, 101).select(col("id").as("n"))
        .withColumn("arr", array(col("n"), col("n") + 1, col("n") + 2))
        .select(
          col("n"),
          str(col("arr")).as("arr_s"),
          size(col("arr")).as("sz"),
          array_contains(col("arr"), 2).as("has2"),
          element_at(col("arr"), 2).as("elem2"),
          str(slice(col("arr"), 2, 2)).as("sliced_s"),
          aggregate(col("arr"), lit(0L), (acc, x) => acc + x).as("summed"),
          str(sort_array(array(col("n") + 2, col("n"), col("n") + 1))).as("sorted_s"),
          array_join(transform(col("arr"), _.cast("string")), ",").as("joined"),
          str(transform(col("arr"), _ * 10)).as("times10_s"),
          str(filter(col("arr"), x => x % 2 === 0)).as("evens_s"))
    },

    // Bit ops (reference binary.rs:234-263): Spark `^` == DuckDB `xor()`,
    // Spark shiftleft/shiftright == DuckDB `<<`/`>>`.
    Q("fn_bitwise",
      """SELECT n,
        |  n & 12 AS band,
        |  n | 5 AS bor,
        |  xor(n, 3) AS bxor,
        |  ~n AS bnot,
        |  n << 2 AS shl,
        |  n >> 1 AS shr,
        |  CAST(bit_count(n) AS INT) AS popcount
        |FROM (SELECT unnest(generate_series(1, 200)) AS n)""".stripMargin) { (s, _) =>
      s.range(1, 201).select(col("id").as("n"))
        .select(
          col("n"),
          col("n").bitwiseAND(12).as("band"),
          col("n").bitwiseOR(5).as("bor"),
          col("n").bitwiseXOR(3).as("bxor"),
          expr("~n").as("bnot"),
          shiftleft(col("n"), 2).as("shl"),
          shiftright(col("n"), 1).as("shr"),
          bit_count(col("n")).as("popcount"))
    }
  )
}
