package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import Det._

/** Scalar-function surface (SURVEY §2.7) + the generator/UDTF surface
  * (§2.9 udtf_explode_tokens).
  *
  * All built-in `org.apache.spark.sql.functions` — codegen'd, no UDFs on
  * the scored path. Cross-engine notes live next to each oracle string
  * (DuckDB's dayofweek is 0-based, regexp_replace is first-match-only, …).
  */
object Functions {

  private def fnString(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "part")
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("up_name"),
        lower(col("p_brand")).as("lo_brand"),
        substring(col("p_name"), 1, 8).as("name8"),
        length(col("p_name")).as("name_len"),
        regexp_replace(col("p_name"), lit(" "), lit("_")).as("snake_name"),
        regexp_extract(col("p_type"), "^(\\w+)", 1).as("type_head"),
        concat_ws("|", split(col("p_name"), " ")).as("piped"),
        trim(concat(lit("  "), col("p_brand"), lit("  "))).as("trimmed"))
      .orderBy("p_partkey")

  private def fnDate(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        quarter(col("o_orderdate")).as("q"),
        dayofweek(col("o_orderdate")).as("dow"),
        to_date(date_trunc("month", col("o_orderdate"))).as("month_start"),
        date_add(to_date(col("o_orderdate")), 30).as("due_date"),
        datediff(to_date(lit("2002-01-01")), to_date(col("o_orderdate"))).as("age_days"))
      .orderBy("o_orderkey")

  private def fnMath(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        dround(sqrt(col("l_extendedprice")), 6).as("sqrt_price"),
        dround(log(col("l_extendedprice")), 6).as("ln_price"),
        dround(exp(col("l_discount")), 6).as("exp_disc"),
        pow(col("l_quantity"), 2).as("qty_sq"),
        abs(col("l_discount") - lit(0.05)).as("disc_dev"),
        ceil(col("l_quantity") / 7).as("qty_ceil7"),
        floor(col("l_quantity") / 7).as("qty_floor7"),
        pmod(col("l_partkey"), lit(97)).as("pk_mod"))
      // total order: (l_orderkey, l_linenumber) is NOT unique in the
      // fixtures (118k dup pairs at sf0.1 — ×100 gate finding, round
      // 10), so the tiebreak extends over every output column; rows
      // equal on all of them are interchangeable, which is all a
      // hash-exact compare needs
      .orderBy("l_orderkey", "l_linenumber", "sqrt_price", "ln_price",
        "exp_disc", "qty_sq", "disc_dev", "qty_ceil7", "qty_floor7", "pk_mod")

  private def fnConditional(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "orders")
      .select(
        col("o_orderkey"),
        when(col("o_totalprice") < 50000, lit("small"))
          .when(col("o_totalprice") < 150000, lit("mid"))
          .otherwise(lit("big")).as("size_class"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status_or_open"),
        least(col("o_totalprice"), lit(100000.0)).as("capped"),
        greatest(col("o_totalprice"), lit(100000.0)).as("floored"))
      .orderBy("o_orderkey")

  private def fnJson(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "events")
      .select(
        col("event_id"),
        from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
          .getField("k").as("k_typed"),
        get_json_object(col("props"), "$.k").cast("int").as("k_str"))
      .orderBy("event_id")

  /** Array ops over the 64-dim embedding. Scalar outputs only (list
    * hashing is engine-specific); float→double widening is exact. */
  private def fnArray(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "embeddings")
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).cast("double").as("e_first"),
        element_at(col("embedding"), 64).cast("double").as("e_last"),
        array_max(col("embedding")).cast("double").as("e_max"),
        array_min(col("embedding")).cast("double").as("e_min"),
        (element_at(col("embedding"), 1).cast("double") +
          element_at(col("embedding"), 2).cast("double") +
          element_at(col("embedding"), 3).cast("double")).as("head3_sum"))
      .orderBy("vec_id")

  private def fnMap(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "events")
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg(map_from_entries(collect_list(struct(col("event_type"), col("n")))).as("m"))
      .select(col("user_id"),
        coalesce(element_at(col("m"), lit("click")), lit(0L)).as("clicks"),
        coalesce(element_at(col("m"), lit("purchase")), lit(0L)).as("purchases"))
      .orderBy("user_id")

  /** Struct (nested) types: build a named struct, project fields back out
    * as scalars (struct columns themselves are engine-layout-specific). */
  private def fnStruct(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "customer")
      .select(col("c_custkey"),
        struct(col("c_name").as("name"), col("c_acctbal").as("bal"),
          col("c_nationkey").as("nk")).as("info"))
      .select(col("c_custkey"),
        col("info.name").as("name"),
        col("info.bal").as("bal"),
        (col("info.nk") + 100).as("nk_off"))
      .orderBy("c_custkey")

  /** DataFrameNaFunctions surface: synthesize nulls (fixtures have none),
    * flag them, then na.fill — COALESCE-equivalent for the oracle. */
  private def fnNullHandling(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "orders")
      .select(col("o_orderkey"),
        nullif(col("o_orderstatus"), lit("O")).as("status_n"),
        when(col("o_totalprice") < 100000, col("o_totalprice")).as("price_n"))
      .withColumn("price_was_null", col("price_n").isNull)
      .na.fill(Map("status_n" -> "OPEN", "price_n" -> 0.0))
      .orderBy("o_orderkey")

  private def fnBitwise(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "part")
      .select(
        col("p_partkey"),
        col("p_partkey").bitwiseAND(lit(255L)).as("band"),
        col("p_partkey").bitwiseOR(lit(4096L)).as("bor"),
        col("p_partkey").bitwiseXOR(lit(0x5AL)).as("bxor"),
        shiftleft(col("p_partkey"), 3).as("shl"),
        shiftright(col("p_partkey"), 2).as("shr"),
        bit_count(col("p_partkey")).as("popcount"))
      .orderBy("p_partkey")

  /** Unpivot via stack(): wide → long (the inverse of agg_pivot). */
  private def fnUnpivot(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "customer")
      .select(col("c_custkey"),
        expr("stack(2, 'acctbal', c_acctbal, 'custkey_as_double', CAST(c_custkey AS DOUBLE))")
          .as(Seq("metric", "value")))
      .orderBy("c_custkey", "metric")

  /** Generator surface: posexplode ≡ UNNEST WITH ORDINALITY (SURVEY §2.9:
    * built-in Generator covers the UDTF extension point). */
  private def udtfExplodeTokens(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents")
      .where(col("doc_id") < 20)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
      .orderBy("doc_id", "pos")

  /** Hash + formatting function family: md5/sha256 digests (cross-engine
    * stable — the fingerprint workhorses), printf-style formatting, and
    * the pad/reverse/translate string tools. */
  private def fnHashFormat(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "supplier")
      .select(col("s_suppkey"),
        md5(encode(col("s_name"), "UTF-8")).as("name_md5"),
        sha2(encode(col("s_name"), "UTF-8"), 256).as("name_sha256"),
        format_string("%05d|%s", col("s_suppkey"), col("s_name")).as("tag"),
        lpad(col("s_suppkey").cast("string"), 8, "0").as("padded"),
        reverse(col("s_name")).as("rev"),
        translate(col("s_name"), "aeiou", "AEIOU").as("caps_vowels"))
      .orderBy("s_suppkey")

  /** Spark 4 VARIANT type: serialize row fields to JSON, parse_json →
    * VARIANT, extract typed values back out with variant_get paths —
    * the open-schema semi-structured column shape. The oracle just
    * reproduces the extracted values from the source columns. */
  private def fnVariant(s: SparkSession, dir: String): DataFrame = {
    T(s, dir, "supplier")
      .select(col("s_suppkey"),
        to_json(struct(col("s_suppkey").as("id"),
          struct(col("s_nationkey").as("n"), col("s_name").as("nm")).as("geo"))).as("js"))
      .select(col("s_suppkey"),
        expr("variant_get(parse_json(js), '$.geo.n', 'int')").as("geo_n"),
        expr("variant_get(parse_json(js), '$.geo.nm', 'string')").as("geo_name"),
        expr("variant_get(parse_json(js), '$.id', 'bigint')").as("id_back"))
      .orderBy("s_suppkey")
  }

  /** Higher-order array functions (transform/filter/aggregate/exists/
    * forall) against DuckDB's list lambdas — the declarative per-row
    * collection processing surface. Fine here (small arrays, cold path);
    * the hot shingle/SimHash loops use compiled expressions instead
    * because Spark evaluates HOF lambdas interpreted (SURVEY §4.3). */
  private def fnHigherOrder(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "supplier")
      .select(col("s_suppkey"),
        sequence(lit(1L), pmod(col("s_suppkey"), lit(5L)) + 1).as("xs"))
      .select(col("s_suppkey"),
        // HOFs are the point of this key; array_join serializes the
        // array results so the cross-engine byte-hash check can run.
        array_join(transform(col("xs"), x => x * x), ",").as("squares"),
        array_join(filter(col("xs"), x => x % 2 === 0), ",").as("evens"),
        aggregate(col("xs"), lit(0L), (a, x) => a + x).as("total"),
        exists(col("xs"), _ > 3).as("has_big"),
        forall(col("xs"), _ > 0).as("all_pos"))
      .orderBy("s_suppkey")

  /** ANSI-safe `try_*` arithmetic (Spark 4 runs ANSI mode by default, so
    * overflow/÷0 THROW unless guarded): division by zero, long-overflow
    * add/multiply and malformed-number parsing all collapse to NULL
    * instead of failing the job — the production guard for dirty data.
    * The oracle spells each case as its explicit CASE-WHEN guard. */
  private def fnTryArithmetic(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "supplier")
      .select(col("s_suppkey"),
        expr("try_divide(100L, s_suppkey % 3)").as("div3"),
        expr("try_add(9223372036854775807L, s_suppkey % 2)").as("add_ovf"),
        // 3037000500² = 9223372037000250000 > Long.MaxValue (3037000499²
        // would still fit — ⌊√MaxValue⌋ = 3037000499)
        expr("try_multiply(3037000500L, CASE WHEN s_suppkey % 4 = 0 " +
          "THEN 3037000500L ELSE 1L END)").as("mul_ovf"),
        // 18-nine mask: a '999999' mask silently failed 7-digit replica
        // ids at ×10 (parse → NULL while the oracle models success) —
        // the mask must cover the full key domain, not the base SF's
        expr("CAST(try_to_number(CASE WHEN s_suppkey % 5 = 0 THEN 'xx' " +
          "ELSE CAST(s_suppkey AS STRING) END, '999999999999999999') AS BIGINT)")
          .as("parsed"))
      .orderBy("s_suppkey")

  /** Regex function family over the documents corpus: match counting
    * (`regexp_count`), all-match extraction (`regexp_extract_all`,
    * array_join'd to CSV so the cross-engine byte-hash check can run —
    * the driver comparator cannot sort array columns), boolean match
    * (`rlike`), and global replace (md5-digested
    * so the wide rewritten text never ships to the output). Patterns
    * stay inside the character-class/quantifier/word-boundary subset
    * where Java regex (Spark) and RE2 (DuckDB oracle) agree exactly.
    * 100-TB note: pure per-row projection — zero shuffles before the
    * output sort; all four functions are codegen'd builtins, no UDF. */
  private def fnRegexp(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents")
      .select(
        col("doc_id"),
        regexp_count(col("text"), lit("[aeiou]{2}")).cast("long").as("n_double_vowel"),
        array_join(regexp_extract_all(col("text"), lit("\\b[st][a-z]+"), lit(0)), ",")
          .as("st_words"),
        col("text").rlike("spark").as("has_spark"),
        md5(regexp_replace(col("text"), "[aeiou]", "#")).as("devowel_md5"))
      .orderBy("doc_id")

  /** Spark 4 collations: grouping under `UTF8_LCASE` merges case
    * variants that a binary grouping keeps apart. Case variants are
    * derived deterministically (even keys upper-case the segment, odd
    * keys lower-case it); the collated grouping must fold both
    * spellings into one group — `n_case_variants = 2` (a binary
    * countDistinct inside the group) proves the fold happened, and the
    * output key is `lower(...)` of the group's representative so the
    * row is deterministic even though Spark keeps an arbitrary-case
    * representative for a collated key. Oracle: GROUP BY lower(seg).
    * 100-TB note: collation-aware grouping hashes the collation key —
    * same single-shuffle hash aggregate as any groupBy. */
  private def fnCollation(s: SparkSession, dir: String): DataFrame = {
    val seg = when(col("c_custkey") % 2 === 0, upper(col("c_mktsegment")))
      .otherwise(lower(col("c_mktsegment")))
    T(s, dir, "customer")
      .select(seg.as("seg"))
      .groupBy(collate(col("seg"), "UTF8_LCASE").as("seg_ci"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(collate(col("seg"), "UTF8_BINARY")).as("n_case_variants"))
      .select(lower(col("seg_ci")).as("seg_lc"), col("n_rows"), col("n_case_variants"))
      .orderBy("seg_lc")
  }

  /** ANSI interval arithmetic — the calendar-aware shifts fn_date's
    * day-granular helpers don't cover: month addition with day-of-month
    * clamping (Jan 31 + 1 month = Feb 28 in BOTH engines — the parity
    * the oracle proves), sub-day INTERVAL subtraction on timestamps,
    * and add_months on dates. Outputs stay timestamp/date typed
    * (interval VALUES don't round-trip parquet portably). */
  private def fnInterval(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "orders")
      .select(
        col("o_orderkey"),
        (col("o_orderdate") + expr("INTERVAL '1' MONTH")).as("plus_month"),
        (col("o_orderdate") - expr("INTERVAL '36' HOUR")).as("minus_36h"),
        add_months(to_date(col("o_orderdate")), 14).as("plus_14m"))
      .orderBy("o_orderkey")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fn_interval" -> (fnInterval _),
    "fn_collation" -> (fnCollation _),
    "fn_regexp" -> (fnRegexp _),
    "fn_try_arithmetic" -> (fnTryArithmetic _),
    "fn_higher_order" -> (fnHigherOrder _),
    "fn_variant" -> (fnVariant _),
    "fn_hash_format" -> (fnHashFormat _),
    "fn_string" -> (fnString _),
    "fn_date" -> (fnDate _),
    "fn_math" -> (fnMath _),
    "fn_conditional" -> (fnConditional _),
    "fn_json" -> (fnJson _),
    "fn_array" -> (fnArray _),
    "fn_map" -> (fnMap _),
    "fn_bitwise" -> (fnBitwise _),
    "fn_null_handling" -> (fnNullHandling _),
    "fn_struct" -> (fnStruct _),
    "fn_unpivot" -> (fnUnpivot _),
    "udtf_explode_tokens" -> (udtfExplodeTokens _),
  )

  val oracle: Map[String, String] = Map(
    "fn_interval" ->
      """SELECT o_orderkey,
        | o_orderdate + INTERVAL 1 MONTH AS plus_month,
        | o_orderdate - INTERVAL 36 HOUR AS minus_36h,
        | CAST(CAST(o_orderdate AS DATE) + INTERVAL 14 MONTH AS DATE) AS plus_14m
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_collation" ->
      """SELECT lower(seg) AS seg_lc, CAST(COUNT(*) AS BIGINT) AS n_rows,
        | CAST(COUNT(DISTINCT seg) AS BIGINT) AS n_case_variants
        |FROM (SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
        |             ELSE lower(c_mktsegment) END AS seg FROM customer)
        |GROUP BY lower(seg) ORDER BY seg_lc""".stripMargin,
    "fn_regexp" ->
      """SELECT doc_id,
        | len(regexp_extract_all(text, '[aeiou]{2}')) AS n_double_vowel,
        | COALESCE(array_to_string(regexp_extract_all(text, '\b[st][a-z]+'), ','), '') AS st_words,
        | regexp_matches(text, 'spark') AS has_spark,
        | md5(regexp_replace(text, '[aeiou]', '#', 'g')) AS devowel_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_try_arithmetic" ->
      """SELECT s_suppkey,
        | CASE WHEN s_suppkey % 3 = 0 THEN NULL
        |      ELSE 100 / (s_suppkey % 3) END AS div3,
        | CASE WHEN s_suppkey % 2 = 1 THEN NULL
        |      ELSE 9223372036854775807 END AS add_ovf,
        | CASE WHEN s_suppkey % 4 = 0 THEN NULL
        |      ELSE 3037000500 END AS mul_ovf,
        | CASE WHEN s_suppkey % 5 = 0 THEN NULL ELSE s_suppkey END AS parsed
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "fn_higher_order" ->
      """SELECT s_suppkey,
        | array_to_string(list_transform(xs, x -> x * x), ',') AS squares,
        | COALESCE(array_to_string(list_filter(xs, x -> x % 2 = 0), ','), '') AS evens,
        | CAST(list_sum(xs) AS BIGINT) AS total,
        | length(list_filter(xs, x -> x > 3)) > 0 AS has_big,
        | length(list_filter(xs, x -> x <= 0)) = 0 AS all_pos
        |FROM (SELECT s_suppkey, range(1, s_suppkey % 5 + 2) AS xs FROM supplier)
        |ORDER BY s_suppkey""".stripMargin,
    "fn_variant" ->
      """SELECT s_suppkey, CAST(s_nationkey AS INT) AS geo_n,
        | s_name AS geo_name, CAST(s_suppkey AS BIGINT) AS id_back
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "fn_hash_format" ->
      """SELECT s_suppkey,
        | MD5(s_name) AS name_md5,
        | SHA256(s_name) AS name_sha256,
        | PRINTF('%05d|%s', s_suppkey, s_name) AS tag,
        | LPAD(CAST(s_suppkey AS VARCHAR), 8, '0') AS padded,
        | REVERSE(s_name) AS rev,
        | TRANSLATE(s_name, 'aeiou', 'AEIOU') AS caps_vowels
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "fn_string" ->
      """SELECT p_partkey,
        | UPPER(p_name) AS up_name,
        | LOWER(p_brand) AS lo_brand,
        | SUBSTRING(p_name, 1, 8) AS name8,
        | CAST(LENGTH(p_name) AS INT) AS name_len,
        | REPLACE(p_name, ' ', '_') AS snake_name,
        | REGEXP_EXTRACT(p_type, '^(\w+)', 1) AS type_head,
        | ARRAY_TO_STRING(STRING_SPLIT(p_name, ' '), '|') AS piped,
        | TRIM('  ' || p_brand || '  ') AS trimmed
        |FROM part ORDER BY p_partkey""".stripMargin,
    "fn_date" ->
      """SELECT o_orderkey,
        | CAST(YEAR(o_orderdate) AS INT) AS y,
        | CAST(MONTH(o_orderdate) AS INT) AS m,
        | CAST(QUARTER(o_orderdate) AS INT) AS q,
        | CAST(DAYOFWEEK(o_orderdate) + 1 AS INT) AS dow,
        | CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
        | CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
        | CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS age_days
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_math" ->
      s"""SELECT l_orderkey, l_linenumber,
         | ${sqlRound("SQRT(l_extendedprice)", 6)} AS sqrt_price,
         | ${sqlRound("LN(l_extendedprice)", 6)} AS ln_price,
         | ${sqlRound("EXP(l_discount)", 6)} AS exp_disc,
         | POW(l_quantity, 2) AS qty_sq,
         | ABS(l_discount - 0.05) AS disc_dev,
         | CAST(CEIL(l_quantity / 7) AS BIGINT) AS qty_ceil7,
         | CAST(FLOOR(l_quantity / 7) AS BIGINT) AS qty_floor7,
         | l_partkey % 97 AS pk_mod
         |FROM lineitem ORDER BY l_orderkey, l_linenumber, sqrt_price,
         | ln_price, exp_disc, qty_sq, disc_dev, qty_ceil7, qty_floor7,
         | pk_mod""".stripMargin,
    "fn_conditional" ->
      """SELECT o_orderkey,
        | CASE WHEN o_totalprice < 50000 THEN 'small'
        |      WHEN o_totalprice < 150000 THEN 'mid'
        |      ELSE 'big' END AS size_class,
        | COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_or_open,
        | LEAST(o_totalprice, 100000.0) AS capped,
        | GREATEST(o_totalprice, 100000.0) AS floored
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_json" ->
      """SELECT event_id,
        | CAST(json_extract(props, '$.k') AS INT) AS k_typed,
        | CAST(json_extract(props, '$.k') AS INT) AS k_str
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_array" ->
      """SELECT vec_id,
        | CAST(LEN(embedding) AS INT) AS dim,
        | CAST(embedding[1] AS DOUBLE) AS e_first,
        | CAST(embedding[64] AS DOUBLE) AS e_last,
        | CAST(LIST_MAX(embedding) AS DOUBLE) AS e_max,
        | CAST(LIST_MIN(embedding) AS DOUBLE) AS e_min,
        | CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE)
        |   + CAST(embedding[3] AS DOUBLE) AS head3_sum
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "fn_map" ->
      """SELECT user_id,
        | CAST(COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 END), 0) AS BIGINT) AS clicks,
        | CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS BIGINT) AS purchases
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "fn_bitwise" ->
      """SELECT p_partkey,
        | p_partkey & 255 AS band,
        | p_partkey | 4096 AS bor,
        | xor(p_partkey, 90) AS bxor,
        | p_partkey << 3 AS shl,
        | p_partkey >> 2 AS shr,
        | CAST(bit_count(p_partkey) AS INT) AS popcount
        |FROM part ORDER BY p_partkey""".stripMargin,
    "fn_struct" ->
      """SELECT c_custkey, info.name AS name, info.bal AS bal,
        | info.nk + 100 AS nk_off
        |FROM (SELECT c_custkey,
        |  {'name': c_name, 'bal': c_acctbal, 'nk': c_nationkey} AS info
        | FROM customer)
        |ORDER BY c_custkey""".stripMargin,
    "fn_null_handling" ->
      """SELECT o_orderkey,
        | COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_n,
        | COALESCE(CASE WHEN o_totalprice < 100000 THEN o_totalprice END, 0.0) AS price_n,
        | (CASE WHEN o_totalprice < 100000 THEN o_totalprice END) IS NULL AS price_was_null
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_unpivot" ->
      """SELECT c_custkey, metric, value FROM (
        | SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS value FROM customer
        | UNION ALL
        | SELECT c_custkey, 'custkey_as_double' AS metric, CAST(c_custkey AS DOUBLE) AS value FROM customer)
        |ORDER BY c_custkey, metric""".stripMargin,
    "udtf_explode_tokens" ->
      """SELECT doc_id,
        | CAST(UNNEST(RANGE(0, LEN(STRING_SPLIT(text, ' ')))) AS INT) AS pos,
        | UNNEST(STRING_SPLIT(text, ' ')) AS token
        |FROM documents WHERE doc_id < 20
        |ORDER BY doc_id, pos""".stripMargin,
  )
}
