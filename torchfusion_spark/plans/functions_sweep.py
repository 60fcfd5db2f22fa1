"""Scalar-function families (SURVEY §2-C): string, math, date/time,
conditional, array (incl. higher-order), JSON, struct/map — each family
witnessed by a query with a DuckDB oracle.

Dialect notes live next to each query: Spark and DuckDB sometimes name a
function differently (instr/strpos, sequence/range, get_json_object/->>);
the *values* and output column names are identical, which is what the
oracle hash checks.

Transcendental math (exp/ln/pow/trig) is rounded on both sides: JVM
StrictMath and C libm may legitimately differ in the last ulp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from torchfusion_spark.plans.registry import query


@query(
    "fn_string_basics",
    """
    SELECT c_custkey,
           UPPER(c_name) AS up, LOWER(c_mktsegment) AS lo,
           LENGTH(c_name) AS len,
           SUBSTR(c_name, 10, 5) AS sub,
           REPLACE(c_name, 'Customer', 'Cust') AS repl,
           CONCAT(c_name, ':', c_mktsegment) AS joined,
           LPAD(CAST(c_custkey AS VARCHAR), 6, '0') AS padded,
           TRIM('  x  ') AS trimmed,
           REVERSE(c_mktsegment) AS rev,
           STRPOS(c_name, '#') AS pos,
           SPLIT_PART(c_name, '#', 2) AS num_part,
           LEFT(c_name, 8) AS l8, RIGHT(c_name, 3) AS r3,
           REPEAT(c_mktsegment, 2) AS rep2,
           STARTS_WITH(c_name, 'Customer') AS is_cust
    FROM customer ORDER BY c_custkey LIMIT 100
    """,
    doc="string family: case/len/substr/replace/concat/pad/trim/reverse/locate/split_part",
)
def fn_string_basics(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = spark.table("customer")
    return (
        c.select(
            "c_custkey",
            F.upper("c_name").alias("up"),
            F.lower("c_mktsegment").alias("lo"),
            F.length("c_name").cast("bigint").alias("len"),
            F.substring("c_name", 10, 5).alias("sub"),
            F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("repl"),
            F.concat("c_name", F.lit(":"), "c_mktsegment").alias("joined"),
            F.lpad(F.col("c_custkey").cast("string"), 6, "0").alias("padded"),
            F.trim(F.lit("  x  ")).alias("trimmed"),
            F.reverse("c_mktsegment").alias("rev"),
            F.instr("c_name", "#").cast("bigint").alias("pos"),
            F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("num_part"),
            F.left(F.col("c_name"), F.lit(8)).alias("l8"),
            F.right(F.col("c_name"), F.lit(3)).alias("r3"),
            F.repeat("c_mktsegment", 2).alias("rep2"),
            F.startswith("c_name", F.lit("Customer")).alias("is_cust"),
        )
        .orderBy("c_custkey")
        .limit(100)
    )


@query(
    "fn_string_regex_hash",
    """
    SELECT doc_id,
           REGEXP_REPLACE(text, '[aeiou]', '_', 'g') AS devoweled,
           REGEXP_MATCHES(text, 'join.*scan') AS has_join_scan,
           REGEXP_EXTRACT(text, '([a-z]+)', 1) AS first_word,
           MD5(text) AS text_md5,
           LEVENSHTEIN(lang, 'en') AS lang_dist,
           TRANSLATE(lang, 'aeiou', 'AEIOU') AS lang_t
    FROM documents ORDER BY doc_id LIMIT 200
    """,
    doc="regex + hash family; Spark regexp dialect (Java) matches duckdb (RE2) on these patterns",
)
def fn_string_regex_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.table("documents")
    return (
        d.select(
            "doc_id",
            F.regexp_replace("text", "[aeiou]", "_").alias("devoweled"),
            F.col("text").rlike("join.*scan").alias("has_join_scan"),
            F.regexp_extract("text", "([a-z]+)", 1).alias("first_word"),
            F.md5("text").alias("text_md5"),
            F.levenshtein("lang", F.lit("en")).cast("bigint").alias("lang_dist"),
            F.translate("lang", "aeiou", "AEIOU").alias("lang_t"),
        )
        .orderBy("doc_id")
        .limit(200)
    )


@query(
    "fn_math",
    """
    SELECT l_orderkey, l_linenumber,
           ABS(l_quantity - 25) AS dist25,
           CAST(CEIL(l_discount * 100) AS BIGINT) AS ceil_disc,
           CAST(FLOOR(l_tax * 100) AS BIGINT) AS floor_tax,
           ROUND(l_extendedprice / 1000, 2) AS price_k,
           CAST(SQRT(l_quantity) AS DOUBLE) AS sqrt_qty,
           ROUND(EXP(l_discount), 8) AS exp_disc,
           ROUND(LN(l_extendedprice), 8) AS ln_price,
           ROUND(LOG10(l_extendedprice), 8) AS log10_price,
           ROUND(POWER(l_quantity, 2), 4) AS qty_sq,
           MOD(CAST(l_orderkey AS BIGINT), 7) AS mod7,
           CAST(SIGN(l_quantity - 25) AS DOUBLE) AS sgn,
           GREATEST(l_discount, l_tax) AS worse_rate,
           LEAST(l_discount, l_tax) AS better_rate,
           ROUND(SIN(l_discount), 8) AS sin_d,
           ROUND(ATAN2(l_discount, l_tax), 8) AS atan2_dt,
           DEGREES(PI()) AS halfturn
    FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 500
    """,
    doc="math family; transcendentals rounded (libm vs StrictMath last-ulp)",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = spark.table("lineitem")
    return (
        l.select(
            "l_orderkey",
            "l_linenumber",
            F.abs(F.col("l_quantity") - 25).alias("dist25"),
            F.ceil(F.col("l_discount") * 100).alias("ceil_disc"),
            F.floor(F.col("l_tax") * 100).alias("floor_tax"),
            F.round(F.col("l_extendedprice") / 1000, 2).alias("price_k"),
            F.sqrt("l_quantity").alias("sqrt_qty"),
            F.round(F.exp("l_discount"), 8).alias("exp_disc"),
            F.round(F.log("l_extendedprice"), 8).alias("ln_price"),
            F.round(F.log10("l_extendedprice"), 8).alias("log10_price"),
            F.round(F.pow("l_quantity", F.lit(2)), 4).alias("qty_sq"),
            (F.col("l_orderkey").cast("bigint") % 7).alias("mod7"),
            F.signum(F.col("l_quantity") - 25).alias("sgn"),
            F.greatest("l_discount", "l_tax").alias("worse_rate"),
            F.least("l_discount", "l_tax").alias("better_rate"),
            F.round(F.sin("l_discount"), 8).alias("sin_d"),
            F.round(F.atan2("l_discount", "l_tax"), 8).alias("atan2_dt"),
            F.degrees(F.lit(3.141592653589793)).alias("halfturn"),
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(500)
    )


@query(
    "fn_datetime",
    """
    SELECT event_id,
           ts,
           DATE_TRUNC('day', ts) AS day_ts,
           DATE_TRUNC('month', ts) AS month_ts,
           EXTRACT(year FROM ts) AS y,
           EXTRACT(month FROM ts) AS m,
           EXTRACT(day FROM ts) AS d,
           EXTRACT(hour FROM ts) AS h,
           CAST(EXTRACT(dow FROM ts) AS BIGINT) AS dow,
           ts + INTERVAL 1 DAY AS tomorrow,
           ts - INTERVAL 90 MINUTE AS earlier,
           CAST(ts AS DATE) AS just_date,
           DATE_DIFF('day', TIMESTAMP '2024-01-01', ts) AS days_since
    FROM events ORDER BY event_id LIMIT 300
    """,
    doc="date/time family: trunc/extract/interval arithmetic/datediff",
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spark.table("events")
    return (
        e.select(
            "event_id",
            "ts",
            F.date_trunc("day", "ts").alias("day_ts"),
            F.date_trunc("month", "ts").alias("month_ts"),
            F.year("ts").cast("bigint").alias("y"),
            F.month("ts").cast("bigint").alias("m"),
            F.dayofmonth("ts").cast("bigint").alias("d"),
            F.hour("ts").cast("bigint").alias("h"),
            (F.dayofweek("ts") - 1).cast("bigint").alias("dow"),  # Spark 1=Sun → 0=Sun like duckdb dow
            (F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("tomorrow"),
            (F.col("ts") - F.expr("INTERVAL 90 MINUTE")).alias("earlier"),
            F.col("ts").cast("date").alias("just_date"),
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
            .cast("bigint")
            .alias("days_since"),
        )
        .orderBy("event_id")
        .limit(300)
    )


@query(
    "fn_time_bucket",
    """
    SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000) AS bucket,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2 ORDER BY bucket, event_type
    """,
    doc="date_bin equivalent: 15-minute tumbling buckets via epoch arithmetic "
    "(DataFusion date_bin ↔ Spark window()/floor; SURVEY §2-C date/time)",
)
def fn_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spark.table("events")
    # F.floor, not cast(bigint): the oracle's // FLOORS while a cast
    # truncates toward zero — a pre-1970 timestamp would land one bucket
    # later on the truncating side (latent: fixtures start at 2024)
    bucket = F.timestamp_micros(F.floor(F.unix_micros("ts") / F.lit(900000000)) * 900000000)
    return (
        e.groupBy(bucket.alias("bucket"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .orderBy("bucket", "event_type")
    )


@query(
    "fn_conditional",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END AS size_class,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_or_pending,
           IFNULL(NULLIF(o_orderpriority, o_orderpriority), 'none') AS always_none,
           CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_orderstatus END AS maybe_status,
           CAST(o_totalprice BETWEEN 100000 AND 200000 AS BOOLEAN) AS in_band,
           o_orderpriority IN ('1-URGENT', '2-HIGH') AS is_urgent
    FROM orders ORDER BY o_orderkey LIMIT 400
    """,
    doc="CASE/COALESCE/NULLIF/IFNULL/BETWEEN/IN",
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.table("orders")
    return (
        o.select(
            "o_orderkey",
            F.when(F.col("o_totalprice") > 300000, "big")
            .when(F.col("o_totalprice") > 100000, "mid")
            .otherwise("small")
            .alias("size_class"),
            F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
                "status_or_pending"
            ),
            F.ifnull(F.nullif("o_orderpriority", "o_orderpriority"), F.lit("none")).alias(
                "always_none"
            ),
            F.when(F.col("o_orderstatus") == "O", F.lit(None)).otherwise(F.col("o_orderstatus")).alias("maybe_status"),
            F.col("o_totalprice").between(100000, 200000).alias("in_band"),
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("is_urgent"),
        )
        .orderBy("o_orderkey")
        .limit(400)
    )


@query(
    "fn_cast_try_cast",
    """
    SELECT doc_id,
           CAST(n_chars AS DOUBLE) AS chars_d,
           CAST(n_chars AS VARCHAR) AS chars_s,
           TRY_CAST(lang AS INTEGER) AS lang_as_int,
           TRY_CAST(CAST(n_chars AS VARCHAR) AS INTEGER) AS roundtrip
    FROM documents ORDER BY doc_id LIMIT 200
    """,
    doc="CAST + TRY_CAST (null on failure, no error)",
)
def fn_cast_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.table("documents")
    return (
        d.select(
            "doc_id",
            F.col("n_chars").cast("double").alias("chars_d"),
            F.col("n_chars").cast("string").alias("chars_s"),
            F.col("lang").try_cast("int").alias("lang_as_int"),
            F.col("n_chars").cast("string").try_cast("int").alias("roundtrip"),
        )
        .orderBy("doc_id")
        .limit(200)
    )


@query(
    "fn_array_ops",
    """
    SELECT vec_id,
           len(embedding) AS dim,
           embedding[1] AS first_val,
           embedding[64] AS last_val,
           list_aggregate(embedding, 'max') AS vmax,
           list_aggregate(embedding, 'min') AS vmin,
           embedding[1:3][2] AS head3_mid,
           embedding[1:3][3] AS head3_end,
           list_contains(embedding, embedding[3]) AS has_third,
           list_position(embedding, embedding[5]) AS pos5
    FROM embeddings ORDER BY vec_id LIMIT 200
    """,
    doc="array family: size/element_at/slice/min/max/contains/position "
    "(duckdb list_* ↔ Spark array_*; float restructuring is bitwise-safe; "
    "slice witnessed via its elements — list cells crash the driver canon)",
)
def fn_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spark.table("embeddings")
    return (
        e.select(
            "vec_id",
            F.size("embedding").cast("bigint").alias("dim"),
            F.element_at("embedding", 1).alias("first_val"),
            F.element_at("embedding", 64).alias("last_val"),
            F.array_max("embedding").alias("vmax"),
            F.array_min("embedding").alias("vmin"),
            F.element_at(F.slice("embedding", 1, 3), 2).alias("head3_mid"),
            F.element_at(F.slice("embedding", 1, 3), 3).alias("head3_end"),
            F.array_contains("embedding", F.element_at("embedding", 3)).alias("has_third"),
            F.array_position("embedding", F.element_at("embedding", 5))
            .cast("int")
            .alias("pos5"),
        )
        .orderBy("vec_id")
        .limit(200)
    )


@query(
    "fn_array_higher_order",
    """
    SELECT l_orderkey, l_linenumber,
           array_to_string(range(1, CAST(l_linenumber AS BIGINT) + 1), ',') AS seq,
           array_to_string(list_transform(range(1, CAST(l_linenumber AS BIGINT) + 1), x -> x * x), ',') AS squares,
           COALESCE(array_to_string(list_filter(range(1, CAST(l_linenumber AS BIGINT) + 1), x -> x % 2 = 0), ','), '') AS evens,
           list_reduce(list_prepend(CAST(0 AS BIGINT), range(1, CAST(l_linenumber AS BIGINT) + 1)), (acc, x) -> acc + x) AS total,
           array_to_string(list_reverse(range(1, CAST(l_linenumber AS BIGINT) + 1)), ',') AS rev,
           list_contains(range(1, CAST(l_linenumber AS BIGINT) + 1), 3) AS has3
    FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 300
    """,
    doc="higher-order functions: transform/filter/aggregate/reverse over sequence "
    "(Spark transform/filter/aggregate ↔ duckdb list_transform/list_filter/list_reduce); "
    "arrays serialized to csv strings — list cells crash the driver canonicalizer "
    "(DuckDB array_to_string(NULL-on-empty) needs the COALESCE; Spark array_join gives '')",
)
def fn_array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = spark.table("lineitem")
    seq = F.sequence(F.lit(1).cast("bigint"), F.col("l_linenumber").cast("bigint"))

    def joined(arr):
        return F.array_join(F.transform(arr, lambda x: x.cast("string")), ",")

    return (
        l.select(
            "l_orderkey",
            "l_linenumber",
            joined(seq).alias("seq"),
            joined(F.transform(seq, lambda x: x * x)).alias("squares"),
            joined(F.filter(seq, lambda x: x % 2 == 0)).alias("evens"),
            F.aggregate(seq, F.lit(0).cast("bigint"), lambda acc, x: acc + x).alias("total"),
            joined(F.reverse(seq)).alias("rev"),
            F.array_contains(seq, F.lit(3).cast("bigint")).alias("has3"),
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(300)
    )


@query(
    "fn_explode_unnest",
    """
    SELECT vec_id, COUNT(*) AS n_elems,
           MIN(v) AS vmin, MAX(v) AS vmax
    FROM (SELECT vec_id, UNNEST(embedding) AS v FROM embeddings)
    GROUP BY vec_id ORDER BY vec_id LIMIT 200
    """,
    doc="explode/unnest (lateral) + re-aggregate",
)
def fn_explode_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spark.table("embeddings")
    return (
        e.select("vec_id", F.explode("embedding").alias("v"))
        .groupBy("vec_id")
        .agg(
            F.count(F.lit(1)).alias("n_elems"),
            F.min("v").alias("vmin"),
            F.max("v").alias("vmax"),
        )
        .orderBy("vec_id")
        .limit(200)
    )


@query(
    "fn_json",
    """
    SELECT event_id, props,
           CAST(props->>'$.k' AS BIGINT) AS k_val
    FROM events ORDER BY event_id LIMIT 300
    """,
    doc="JSON extraction: get_json_object ↔ duckdb ->> operator",
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spark.table("events")
    return (
        e.select(
            "event_id",
            "props",
            F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
        )
        .orderBy("event_id")
        .limit(300)
    )


@query(
    "fn_struct_map",
    """
    SELECT o_orderkey,
           CAST(to_json({'status': o_orderstatus, 'priority': o_orderpriority}) AS VARCHAR) AS meta,
           {'status': o_orderstatus, 'priority': o_orderpriority}.status AS meta_status,
           MAP(['total'], [CAST(o_totalprice AS DOUBLE)])['total'][1] AS total_from_map
    FROM orders ORDER BY o_orderkey LIMIT 200
    """,
    doc="struct construction + field access + map construction/extraction; the "
    "struct itself is witnessed through to_json (compact {\"k\":\"v\"} form on "
    "both engines) — struct cells crash the driver canonicalizer",
)
def fn_struct_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.table("orders")
    meta = F.struct(
        F.col("o_orderstatus").alias("status"), F.col("o_orderpriority").alias("priority")
    )
    return (
        o.select(
            "o_orderkey",
            F.to_json(meta).alias("meta"),
            meta.getField("status").alias("meta_status"),
            F.element_at(
                F.create_map(F.lit("total"), F.col("o_totalprice").cast("double")), "total"
            ).alias("total_from_map"),
        )
        .orderBy("o_orderkey")
        .limit(200)
    )


@query(
    "fn_bitwise",
    """
    SELECT l_orderkey, l_linenumber,
           l_partkey & l_suppkey AS b_and,
           l_partkey | l_suppkey AS b_or,
           xor(l_partkey, l_suppkey) AS b_xor,
           ~l_partkey AS b_not,
           CAST(bit_count(l_partkey) AS INTEGER) AS pop,
           l_linenumber << 3 AS shl,
           l_partkey >> 2 AS shr
    FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 200
    """,
    doc="bitwise scalar family: & | ^(xor) ~ bit_count shiftleft/shiftright "
    "(dialect note: DuckDB spells xor as a function; shifts are operators "
    "there and shiftleft/shiftright functions in Spark)",
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.table("lineitem")
    pk, sk, ln = F.col("l_partkey"), F.col("l_suppkey"), F.col("l_linenumber")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            pk.bitwiseAND(sk).alias("b_and"),
            pk.bitwiseOR(sk).alias("b_or"),
            pk.bitwiseXOR(sk).alias("b_xor"),
            F.expr("~l_partkey").alias("b_not"),
            F.bit_count(pk).alias("pop"),
            F.shiftleft(ln, 3).alias("shl"),
            F.shiftright(pk, 2).alias("shr"),
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(200)
    )


@query(
    "fn_string_extras",
    """
    SELECT c_custkey,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS trans,
           substr(c_name, 1, 1) || 'XX' || substr(c_name, 4) AS overlaid,
           array_to_string(list_transform(string_split(lower(c_mktsegment), ' '),
                w -> upper(substr(w, 1, 1)) || substr(w, 2)), ' ') AS capped,
           ascii(c_mktsegment) AS first_code,
           chr(CAST(65 + c_custkey % 26 AS INT)) AS letter,
           to_hex(c_custkey) AS hexkey,
           CAST(list_position(string_split('BUILDING,AUTOMOBILE,MACHINERY,HOUSEHOLD,FURNITURE', ','),
                c_mktsegment) AS INT) AS seg_pos,
           trim(c_name, 'Cr0123456789') AS trimmed_chars
    FROM customer ORDER BY c_custkey LIMIT 100
    """,
    doc="string extras: translate / overlay / initcap / ascii / chr / hex / "
    "find_in_set / btrim — DuckDB lacks overlay, initcap, find_in_set and "
    "btrim by those names, so the oracle uses composition equivalents "
    "(which is itself evidence the Spark names compute what they claim)",
)
def fn_string_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = spark.table("customer")
    return (
        c.select(
            "c_custkey",
            F.translate("c_mktsegment", "AEIOU", "aeiou").alias("trans"),
            F.overlay(F.col("c_name"), F.lit("XX"), F.lit(2)).alias("overlaid"),
            F.initcap(F.lower("c_mktsegment")).alias("capped"),
            F.ascii("c_mktsegment").alias("first_code"),
            F.chr((F.lit(65) + F.col("c_custkey") % 26).cast("bigint")).alias("letter"),
            F.hex("c_custkey").alias("hexkey"),
            F.expr(
                "find_in_set(c_mktsegment, 'BUILDING,AUTOMOBILE,MACHINERY,HOUSEHOLD,FURNITURE')"
            ).cast("int").alias("seg_pos"),
            F.btrim(F.col("c_name"), F.lit("Cr0123456789")).alias("trimmed_chars"),
        )
        .orderBy("c_custkey")
        .limit(100)
    )


@query(
    "fn_datetime_construct",
    """
    SELECT o_orderkey,
           make_date(2024, 1 + CAST(o_orderkey % 12 AS INT), 1 + CAST(o_orderkey % 28 AS INT)) AS made,
           make_timestamp(epoch_us(o_orderdate)) AS from_unix_us,
           CAST(epoch_us(o_orderdate) / 1000000 AS BIGINT) AS unix_sec,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(date_part('week', o_orderdate) AS INT) AS week_no
    FROM orders ORDER BY o_orderkey LIMIT 100
    """,
    doc="datetime construction family: make_date, epoch↔timestamp "
    "round-trip, unix seconds, last_day, ISO week",
)
def fn_datetime_construct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.table("orders")
    return (
        o.select(
            "o_orderkey",
            F.make_date(
                F.lit(2024),
                (F.lit(1) + F.col("o_orderkey") % 12).cast("int"),
                (F.lit(1) + F.col("o_orderkey") % 28).cast("int"),
            ).alias("made"),
            F.timestamp_micros(F.unix_micros(F.col("o_orderdate").cast("timestamp"))).alias("from_unix_us"),
            (F.unix_micros(F.col("o_orderdate").cast("timestamp")) / 1_000_000).cast("bigint").alias("unix_sec"),
            F.last_day("o_orderdate").alias("month_end"),
            F.weekofyear("o_orderdate").cast("int").alias("week_no"),
        )
        .orderBy("o_orderkey")
        .limit(100)
    )
