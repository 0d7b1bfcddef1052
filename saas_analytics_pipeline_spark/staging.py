"""Staging layer: casts, dedup, reject routing, tolerant parsing.

Implements the reference's staging contract: "staging, rejects"
(`/root/reference/README.md:36`), CAST-to-NUMERIC discipline
(`/root/reference/data_gen/generate_and_load_script.py:18`), duplicate
handling (`/root/reference/data_gen/pseudo_code_rules.txt:39-47`),
malformed-JSON tolerance (`:30-38`), multi-format date parsing (`:57-65`),
null profiling (`:48-56`) and the money HALF_UP quantize
(`/root/reference/data_gen/generate_and_load_script.py:55-56`).

Scale notes (100 TB): every query here is a single scan + narrow transforms
or one hash aggregate — filters sit directly on the parquet scan (pushdown),
projections prune columns, and the dedup window shuffles once on its key.
Reject routing shares one scan between the valid and reject branches by
construction (one filter each over the same source plan; Spark reuses the
scan under AQE or via explicit .persist when both sides are consumed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from saas_analytics_pipeline_spark import seeds
from saas_analytics_pipeline_spark.functions import EMAIL_RE, MONEY, money, money_sum
from saas_analytics_pipeline_spark.qcatalog import query
from saas_analytics_pipeline_spark.registry import REGISTRY, Materialization
from saas_analytics_pipeline_spark.sources import load_table


# --------------------------------------------------------------------------
# registry models (dbt-style staging views)
# --------------------------------------------------------------------------
@REGISTRY.model("stg_orders", layer="staging", description="typed orders")
def stg_orders(spark: SparkSession, ref) -> DataFrame:
    return ref("orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        money("o_totalprice").alias("o_totalprice"),
        F.to_date("o_orderdate").alias("o_orderdate"),
        "o_orderpriority",
    )


@REGISTRY.model("stg_lineitem", layer="staging", description="typed+validated lineitem")
def stg_lineitem(spark: SparkSession, ref) -> DataFrame:
    li = ref("lineitem")
    return li.select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        F.col("l_quantity").cast("int").alias("l_quantity"),
        money("l_extendedprice").alias("l_extendedprice"),
        F.col("l_discount").cast("decimal(6,4)").alias("l_discount"),
        F.col("l_tax").cast("decimal(6,4)").alias("l_tax"),
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    ).where(valid_lineitem_cond())


@REGISTRY.model("stg_events", layer="staging", description="events + parsed props")
def stg_events(spark: SparkSession, ref) -> DataFrame:
    ev = ref("events")
    return ev.withColumn(
        "prop_k", F.get_json_object("props", "$.k").cast("int")
    )


def valid_lineitem_cond() -> F.Column:
    """The reject rule: non-positive quantity / negative price / discount
    outside [0,1] are routed to rejects (pseudo_code_rules.txt:66-74)."""
    return (
        (F.col("l_quantity") > 0)
        & (F.col("l_extendedprice") >= 0)
        & F.col("l_discount").between(0, 1)
    )


VALID_LINEITEM_SQL = (
    "(l_quantity > 0 AND l_extendedprice >= 0 AND l_discount BETWEEN 0 AND 1)"
)


# --------------------------------------------------------------------------
# driver-facing queries
# --------------------------------------------------------------------------
@query(
    "q_filter_eq",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality filter pushed to the scan (ref: example/my_second_dbt_model.sql:4-6)."""
    return (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    )


@query(
    "q_filter_notnull",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_name IS NOT NULL AND c_acctbal IS NOT NULL
    """,
)
def q_filter_notnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-rejecting filter (ref: example/my_first_dbt_model.sql:27)."""
    c = load_table(spark, sf_dir, "customer")
    return c.where(
        F.col("c_name").isNotNull() & F.col("c_acctbal").isNotNull()
    ).select("c_custkey", "c_name", "c_mktsegment")


@query(
    "q_stg_cast",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_quantity AS INTEGER) AS qty,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price_2dp,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(6,4))) AS DOUBLE) AS net_price
    FROM lineitem
    """,
)
def q_stg_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staging CAST discipline: doubles -> exact decimals -> stable doubles
    (ref: data_gen/generate_and_load_script.py:18)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("int").alias("qty"),
        money("l_extendedprice").cast("double").alias("price_2dp"),
        (money("l_extendedprice") * (F.lit(1) - F.col("l_discount").cast("decimal(6,4)")))
        .cast("double")
        .alias("net_price"),
    )


@query(
    "q_soft_delete",
    oracle="""
    SELECT event_type, COUNT(*) AS n
    FROM events WHERE event_type <> 'error'
    GROUP BY event_type
    """,
)
def q_soft_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft-delete / flagged-row exclusion (ref: is_deleted flags,
    data_gen/generate_and_load_script.py:88,100)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.where(F.col("event_type") != "error")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )


@query(
    "q_reject_rows",
    oracle=f"""
    SELECT {VALID_LINEITEM_SQL} AS is_valid,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS gross
    FROM lineitem
    GROUP BY 1
    """,
)
def q_reject_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Valid/reject routing over ONE scan (ref: README.md:36 'staging,
    rejects'; bad rows injected data_gen/generate_and_load_script.py:112-113).
    Expressed as a group-by on the validity predicate so both branches are
    one pass — at 100 TB this is strictly better than two scans."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(valid_lineitem_cond().alias("is_valid")).agg(
        F.count("*").alias("n"),
        money_sum("l_extendedprice", "gross"),
    )


@query(
    "q_dedup_latest",
    oracle="""
    SELECT user_id, event_id, event_type, ts
    FROM (
        SELECT user_id, event_id, event_type, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def q_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest-per-key dedup (ref: dup rule pseudo_code_rules.txt:39-47;
    updated_at bumps). Deterministic tie-break on event_id. One shuffle on
    the key; at scale prefer partition-local pre-aggregation via max_by if
    only the payload is needed."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "ts")
    )


@query(
    "q_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER))
               AS BIGINT) AS sum_k,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS DOUBLE)
               / COUNT(*) AS avg_k
    FROM events
    GROUP BY event_type
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from string payloads (ref: raw_payload/context/
    properties, data_gen/generate_and_load_script.py:147,166-167)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        (F.sum(k).cast("double") / F.count("*")).alias("avg_k"),
    )


@query(
    "q_json_malformed",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(*) FILTER (WHERE props IS NOT NULL AND NOT json_valid(props))
               AS n_malformed,
           COUNT(*) FILTER (WHERE json_extract_string(props, '$.k') IS NULL)
               AS n_missing_k
    FROM events
    """,
)
def q_json_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerant JSON parse: malformed payloads must not kill the pipeline,
    they are counted/routed (ref: pseudo_code_rules.txt:30-38). Spark
    from_json yields NULL on malformed input — the counting is the contract."""
    ev = load_table(spark, sf_dir, "events")
    parsed = F.from_json("props", "k INT")
    return ev.agg(
        F.count("*").alias("n_rows"),
        F.count(
            F.when(F.col("props").isNotNull() & parsed.isNull(), 1)
        ).alias("n_malformed"),
        F.count(
            F.when(F.get_json_object("props", "$.k").isNull(), 1)
        ).alias("n_missing_k"),
    )


@query(
    "q_null_rate",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(*) - COUNT(c_name) AS nulls_name,
           COUNT(*) - COUNT(c_acctbal) AS nulls_acctbal,
           COUNT(*) - COUNT(c_mktsegment) AS nulls_mktsegment,
           CAST(COUNT(*) - COUNT(c_mktsegment) AS DOUBLE) / COUNT(*)
               AS null_rate_mktsegment
    FROM customer
    """,
)
def q_null_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-value profiling per column (ref: pseudo_code_rules.txt:48-56;
    2% null emails data_gen/generate_and_load_script.py:84)."""
    c = load_table(spark, sf_dir, "customer")
    n = F.count("*")
    return c.agg(
        n.alias("n_rows"),
        (n - F.count("c_name")).alias("nulls_name"),
        (n - F.count("c_acctbal")).alias("nulls_acctbal"),
        (n - F.count("c_mktsegment")).alias("nulls_mktsegment"),
        ((n - F.count("c_mktsegment")).cast("double") / n).alias(
            "null_rate_mktsegment"
        ),
    )


@query(
    "q_multiformat_date",
    oracle="""
    WITH raw AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 2 = 1
                    THEN strftime(o_orderdate, '%m/%d/%Y')
                    ELSE strftime(o_orderdate, '%d-%m-%Y') END AS date_str
        FROM orders
    ),
    parsed AS (
        SELECT o_orderkey,
               CAST(COALESCE(try_strptime(date_str, '%m/%d/%Y'),
                             try_strptime(date_str, '%d-%m-%Y')) AS DATE) AS dt
        FROM raw
    )
    SELECT EXTRACT(year FROM dt) AS yr, COUNT(*) AS n,
           COUNT(*) FILTER (WHERE dt IS NULL) AS n_unparsed
    FROM parsed GROUP BY 1
    """,
)
def q_multiformat_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse inconsistent date formats MM/DD/YYYY vs DD-MM-YYYY via
    try-parse coalesce (ref: pseudo_code_rules.txt:57-65). The string column
    is synthesized from o_orderdate (testdata has no dirty strings)."""
    o = load_table(spark, sf_dir, "orders")
    date_str = F.when(
        F.col("o_orderkey") % 2 == 1, F.date_format("o_orderdate", "MM/dd/yyyy")
    ).otherwise(F.date_format("o_orderdate", "dd-MM-yyyy"))
    parsed = F.coalesce(
        F.try_to_timestamp(F.col("date_str"), F.lit("MM/dd/yyyy")),
        F.try_to_timestamp(F.col("date_str"), F.lit("dd-MM-yyyy")),
    ).cast("date")
    return (
        o.select("o_orderkey", date_str.alias("date_str"))
        .select("o_orderkey", parsed.alias("dt"))
        .groupBy(F.year("dt").alias("yr"))
        .agg(
            F.count("*").alias("n"),
            F.count(F.when(F.col("dt").isNull(), 1)).alias("n_unparsed"),
        )
    )


@query(
    "q_money_round",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(ROUND(CAST(o_totalprice AS DECIMAL(18,2)) * 0.03, 2))
                AS DOUBLE) AS fee_total,
           CAST(SUM(ROUND(CAST(o_totalprice AS DECIMAL(18,2)) * 0.20, 2))
                AS DOUBLE) AS tax_total
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_money_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money quantize 2dp HALF_UP — fee=3%, tax=20% of charge (ref:
    data_gen/generate_and_load_script.py:55-56,144-145). Decimal domain end
    to end; only the final sum is surfaced as double."""
    o = load_table(spark, sf_dir, "orders")
    fee = F.round(money("o_totalprice") * F.lit(0.03).cast("decimal(4,2)"), 2)
    tax = F.round(money("o_totalprice") * F.lit(0.20).cast("decimal(4,2)"), 2)
    return o.groupBy("o_orderpriority").agg(
        F.sum(fee).cast("double").alias("fee_total"),
        F.sum(tax).cast("double").alias("tax_total"),
    )


@query(
    "q_negative_guard",
    oracle="""
    SELECT COUNT(*) FILTER (WHERE l_extendedprice < 0) AS n_negative_price,
           COUNT(*) FILTER (WHERE l_quantity <= 0) AS n_nonpositive_qty,
           MIN(l_quantity) AS min_qty
    FROM lineitem
    """,
)
def q_negative_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No-negative-price/qty DQ test (ref: README.md:55; injected
    data_gen/generate_and_load_script.py:112-113)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.when(F.col("l_extendedprice") < 0, 1)).alias("n_negative_price"),
        F.count(F.when(F.col("l_quantity") <= 0, 1)).alias("n_nonpositive_qty"),
        F.min("l_quantity").alias("min_qty"),
    )


@query(
    "q_pii_scan",
    oracle=f"""
    SELECT 'events' AS table_name,
           COUNT(*) FILTER (WHERE regexp_matches(props, '{EMAIL_RE}')) AS n_pii
    FROM events
    UNION ALL
    SELECT 'documents' AS table_name,
           COUNT(*) FILTER (WHERE regexp_matches(text, '{EMAIL_RE}')) AS n_pii
    FROM documents
    """,
)
def q_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII (email) leakage scan inside free-text/JSON columns (ref:
    README.md:59; leak injected data_gen/generate_and_load_script.py:158)."""
    ev = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")
    a = ev.agg(
        F.lit("events").alias("table_name"),
        F.count(F.when(F.col("props").rlike(EMAIL_RE), 1)).alias("n_pii"),
    )
    b = docs.agg(
        F.lit("documents").alias("table_name"),
        F.count(F.when(F.col("text").rlike(EMAIL_RE), 1)).alias("n_pii"),
    )
    return a.unionByName(b)


@query(
    "q_date_trunc",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders GROUP BY 1
    """,
)
def q_date_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day/month bucketing for partitions & marts (ref: raw partitions 'by
    source and date', README.md:24)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start")
    ).agg(
        F.count("*").alias("n_orders"),
        money_sum("o_totalprice", "revenue"),
    )


@query(
    "q_ts_diff",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(datediff('day', CAST(o.o_orderdate AS DATE),
                             CAST(l.l_shipdate AS DATE))) AS BIGINT)
               AS total_delay_days,
           CAST(SUM(datediff('day', CAST(o.o_orderdate AS DATE),
                             CAST(l.l_shipdate AS DATE))) AS DOUBLE)
               / COUNT(*) AS avg_delay_days
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def q_ts_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp deltas: ship latency per priority (ref: payment latency
    data_gen/generate_and_load_script.py:142; lateness :162)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    delay = F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(delay).alias("total_delay_days"),
            (F.sum(delay).cast("double") / F.count("*")).alias("avg_delay_days"),
        )
    )


ISO_COUNTRIES_SQL = seeds.oracle_read_csv("iso_countries") + " AS iso"


@query(
    "q_country_norm",
    oracle=f"""
    WITH dirty AS (
        SELECT c.c_custkey,
               CASE c.c_custkey % 3
                   WHEN 0 THEN lower(n.n_name)
                   WHEN 1 THEN upper(n.n_name)
                   ELSE '  ' || n.n_name || ' '
               END AS billing_country
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    ),
    normalized AS (
        SELECT c_custkey, upper(trim(billing_country)) AS country_norm
        FROM dirty
    )
    SELECT n.country_norm,
           COUNT(*) AS n_customers,
           COUNT(iso.country_name) AS n_iso_matched
    FROM normalized n
    LEFT JOIN {ISO_COUNTRIES_SQL} ON n.country_norm = iso.country_name
    GROUP BY n.country_norm
    """,
)
def q_country_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Free-text country normalization against a broadcast ISO seed (ref:
    billing_country free text data_gen/generate_and_load_script.py:74 vs
    country_code :87; iso_countries.csv seed README.md:22). Dirty variants
    are synthesized (case/whitespace noise), normalized upper+trim, then
    matched to the seed. Seed join is broadcast: no fact shuffle."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    iso = seeds.load_seed(spark, "iso_countries")
    dirty = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "c_custkey",
            F.when(F.col("c_custkey") % 3 == 0, F.lower("n_name"))
            .when(F.col("c_custkey") % 3 == 1, F.upper("n_name"))
            .otherwise(F.concat(F.lit("  "), F.col("n_name"), F.lit(" ")))
            .alias("billing_country"),
        )
    )
    normalized = dirty.select(
        "c_custkey", F.upper(F.trim("billing_country")).alias("country_norm")
    )
    return (
        normalized.join(
            F.broadcast(iso),
            normalized.country_norm == iso.country_name,
            "left",
        )
        .groupBy("country_norm")
        .agg(
            F.count("*").alias("n_customers"),
            F.count("country_name").alias("n_iso_matched"),
        )
    )


@query(
    "q_surrogate_key",
    oracle="""
    WITH sk AS (
        SELECT o_orderkey,
               sha256(concat_ws('||', CAST(o_orderkey AS VARCHAR),
                      CAST(o_custkey AS VARCHAR), o_orderstatus)) AS surrogate_key
        FROM orders
    )
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT surrogate_key) AS n_distinct_keys,
           MIN(surrogate_key) AS min_key
    FROM sk
    """,
)
def q_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic surrogate keys: sha256 over '||'-joined natural key
    (public dbt generate_surrogate_key pattern; ref uses uuid4 per row,
    data_gen/generate_and_load_script.py:69 — content hash is the
    deterministic, retry-safe variant an engine needs)."""
    o = load_table(spark, sf_dir, "orders")
    sk = o.select(
        F.sha2(
            F.concat_ws(
                "||",
                F.col("o_orderkey").cast("string"),
                F.col("o_custkey").cast("string"),
                F.col("o_orderstatus"),
            ),
            256,
        ).alias("surrogate_key")
    )
    return sk.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("surrogate_key").alias("n_distinct_keys"),
        F.min("surrogate_key").alias("min_key"),
    )


@query(
    "q_json_drift",
    oracle="""
    SELECT k AS key, COUNT(*) AS n
    FROM (
        SELECT unnest(json_keys(props)) AS k
        FROM events WHERE props IS NOT NULL AND json_valid(props)
    )
    GROUP BY k
    """,
)
def q_json_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift profiling: parse payloads as map<string,string> so
    UNKNOWN keys survive (ref: 5% of event properties gain new_key,
    data_gen/generate_and_load_script.py:157) and report key frequencies.
    A fixed-struct from_json would silently drop drifted keys; the map
    parse is the tolerant-staging contract for semi-structured columns."""
    ev = load_table(spark, sf_dir, "events")
    keys = ev.where(F.col("props").isNotNull()).select(
        F.explode(F.map_keys(F.from_json("props", "map<string,string>")))
        .alias("key")
    )
    return keys.groupBy("key").agg(F.count("*").alias("n"))


@query(
    "q_dedup_maxby",
    oracle="""
    SELECT user_id,
           arg_max(event_type,
                   epoch_ms(ts)::BIGINT * 1000000 + event_id) AS last_event_type,
           arg_max(event_id,
                   epoch_ms(ts)::BIGINT * 1000000 + event_id) AS last_event_id,
           COUNT(*) AS n_versions
    FROM events GROUP BY user_id
    """,
)
def q_dedup_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest via max_by — the partial-aggregable dedup. Unlike the
    row_number() form (q_dedup_latest) this combines MAP-SIDE: each input
    partition reduces to one candidate per key before the shuffle, so at
    100 TB the shuffle carries |keys| rows, not |rows|. Deterministic
    ordering key packs (epoch_ms, event_id) into one bigint."""
    ev = load_table(spark, sf_dir, "events")
    okey = F.unix_millis("ts") * F.lit(1000000) + F.col("event_id")
    return ev.groupBy("user_id").agg(
        F.max_by("event_type", okey).alias("last_event_type"),
        F.max_by("event_id", okey).alias("last_event_id"),
        F.count("*").alias("n_versions"),
    )


# deterministic per-stratum sample rates (percent of the 0..99 hash space)
SAMPLE_RATES = {"F": 50, "O": 10, "P": 100}


@query(
    "q_hash_sample",
    oracle=f"""
    WITH tagged AS (
        SELECT o_orderstatus,
               CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)
                    AS BIGINT) % 100 AS bucket
        FROM orders
    )
    SELECT o_orderstatus,
           COUNT(*) AS n_total,
           COUNT(*) FILTER (WHERE bucket <
               CASE o_orderstatus WHEN 'F' THEN {SAMPLE_RATES['F']}
                                  WHEN 'O' THEN {SAMPLE_RATES['O']}
                                  ELSE {SAMPLE_RATES['P']} END) AS n_sampled
    FROM tagged GROUP BY o_orderstatus
    """,
)
def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling by key hash — the reproducible
    alternative to rand()-based sampleBy for train/test splits and
    downsampling: membership depends only on the key, so re-runs, retries
    and different partitionings select the SAME rows (rand()-per-row does
    not survive re-execution; hash sampling does). Rates per stratum from
    SAMPLE_RATES; scan-local, no shuffle before the count."""
    from saas_analytics_pipeline_spark.functions import hash60

    o = load_table(spark, sf_dir, "orders")
    bucket = hash60(F.col("o_orderkey").cast("string")) % 100
    rate = (
        F.when(F.col("o_orderstatus") == "F", SAMPLE_RATES["F"])
        .when(F.col("o_orderstatus") == "O", SAMPLE_RATES["O"])
        .otherwise(SAMPLE_RATES["P"])
    )
    return o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_total"),
        F.count(F.when(bucket < rate, 1)).alias("n_sampled"),
    )


@query(
    "q_variant",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           COUNT(CASE WHEN json_valid(props) THEN 1 END) AS n_parsed,
           CAST(SUM(CASE WHEN json_valid(props)
                    THEN CAST(json_extract_string(props, '$.k') AS INTEGER)
               END) AS BIGINT) AS sum_k
    FROM events GROUP BY event_type
    """,
)
def q_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ingestion via the VARIANT type (Spark 4):
    try_parse_json keeps malformed payloads as NULL (tolerance contract),
    variant_get extracts typed paths without a declared schema — the
    modern replacement for schema-pinned from_json when payloads drift
    (ref: schema drift generate_and_load_script.py:157, malformed JSON
    pseudo_code_rules.txt:30-38). Variant stores a parsed binary form, so
    repeated path extraction skips re-tokenizing the JSON text."""
    ev = load_table(spark, sf_dir, "events")
    v = F.try_parse_json("props")
    return ev.select("event_type", v.alias("v")).groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.count("v").alias("n_parsed"),
        F.sum(F.try_variant_get(F.col("v"), "$.k", "int")).alias("sum_k"),
    )


@query(
    "q_union_by_name",
    oracle="""
    WITH a AS (
        SELECT o_orderkey AS id, o_totalprice AS amount, o_orderstatus AS status
        FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
    ),
    b AS (  -- later extract adds a column the old one lacks
        SELECT o_orderkey AS id, o_totalprice AS amount, o_orderstatus AS status,
               o_orderpriority AS priority
        FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
    ),
    unioned AS (
        SELECT id, amount, status, NULL AS priority FROM a
        UNION ALL
        SELECT id, amount, status, priority FROM b
    )
    SELECT status, COUNT(*) AS n,
           COUNT(priority) AS n_with_priority,
           CAST(SUM(CAST(amount AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM unioned GROUP BY status
    """,
)
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolving UNION: unionByName(allowMissingColumns=True) aligns
    extracts whose column sets drifted over time — position-based unionAll
    would silently mis-bind columns; name-based alignment is the staging
    contract for multi-vintage loads."""
    o = load_table(spark, sf_dir, "orders")
    a = o.where(F.year("o_orderdate") == 1995).select(
        F.col("o_orderkey").alias("id"),
        F.col("o_totalprice").alias("amount"),
        F.col("o_orderstatus").alias("status"),
    )
    b = o.where(F.year("o_orderdate") == 1996).select(
        F.col("o_orderkey").alias("id"),
        F.col("o_totalprice").alias("amount"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
    )
    unioned = a.unionByName(b, allowMissingColumns=True)
    return unioned.groupBy("status").agg(
        F.count("*").alias("n"),
        F.count("priority").alias("n_with_priority"),
        money_sum("amount", "total"),
    )


CSV_BAD_MOD = 7  # every 7th synthesized CSV line is unparsable


@query(
    "q_csv_malformed",
    oracle=f"""
    SELECT COUNT(*) AS n_rows,
           COUNT(*) FILTER (WHERE o_orderkey % {CSV_BAD_MOD} = 0)
               AS n_corrupt,
           COUNT(*) FILTER (WHERE o_orderkey % {CSV_BAD_MOD} <> 0)
               AS n_valid,
           CAST(SUM(o_orderkey)
                FILTER (WHERE o_orderkey % {CSV_BAD_MOD} <> 0) AS BIGINT)
               AS sum_k,
           CAST(SUM(o_custkey)
                FILTER (WHERE o_orderkey % {CSV_BAD_MOD} <> 0) AS BIGINT)
               AS sum_v,
           COUNT(*) FILTER (WHERE o_orderkey % {CSV_BAD_MOD} <> 0)
               AS n_dropmalformed
    FROM orders
    """,
)
def q_csv_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV malformed-row policy certificate — q_json_malformed's
    counterpart for the other schemaless interchange format: a CSV file
    is synthesized from orders (every {CSV_BAD_MOD}th line unparsable —
    text where the LONG schema expects numbers), then read back under
    BOTH error policies a production loader chooses between:
    PERMISSIVE + columnNameOfCorruptRecord (corrupt lines surface as a
    quarantine column, parsed fields null) and DROPMALFORMED (corrupt
    lines silently vanish — the count documents exactly how many). The
    oracle replays the synthesis arithmetic from the source table, so a
    reader that mis-classified a line, half-parsed a corrupt row, or
    dropped a valid one breaks the hash. (The reject-row QUARANTINE
    pattern for contract-valid-but-rule-breaking rows is q_reject_rows;
    this certifies the PARSER layer below it.)

    Scale: the synthesis write is one scan-local projection to text;
    both read-backs are schema-pinned CSV scans whose per-policy
    aggregates are 1-row partial-aggregable reduces. Error policy is
    per-task and needs no coordination — corrupt-line handling costs
    nothing at 100 TB.

    Ref: reference loads CSV with header skip + truncate
    (data_gen/generate_and_load_script.py:188); real feeds carry bad
    lines, and the policy choice is the loader's first contract."""
    from saas_analytics_pipeline_spark.scratch import scratch_path

    base = scratch_path("saas_csv_malformed", sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    line = F.when(
        F.col("o_orderkey") % CSV_BAD_MOD == 0,
        F.concat(F.lit("x"), F.col("o_orderkey").cast("string"), F.lit(",oops")),
    ).otherwise(
        F.concat(
            F.col("o_orderkey").cast("string"),
            F.lit(","),
            F.col("o_custkey").cast("string"),
        )
    )
    orders.select(line.alias("value")).write.mode("overwrite").text(base)
    schema = "k long, v long, _bad string"
    permissive = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .csv(base)
    )
    stats = permissive.agg(
        F.count("*").alias("n_rows"),
        F.count("_bad").cast("long").alias("n_corrupt"),
        F.count("k").cast("long").alias("n_valid"),
        F.sum("k").cast("long").alias("sum_k"),
        F.sum("v").cast("long").alias("sum_v"),
    )
    # count a PARSED column, not count(*): CSV column pruning skips
    # parsing entirely for count(*), so DROPMALFORMED would drop nothing
    dropped = (
        spark.read.schema("k long, v long")
        .option("mode", "DROPMALFORMED")
        .csv(base)
        .agg(F.count("k").cast("long").alias("n_dropmalformed"))
    )
    return stats.crossJoin(dropped)
