"""Scalar/collection function corpus (SURVEY.md §2.B function classes).

One query per function family: string, date/time, math, array, higher-order,
map, struct, JSON, explode/unnest.  All expressions are built-in
pyspark.sql.functions (JVM-side, whole-stage-codegen'd) — no Python UDFs.

Oracle caveats encoded here:
- DuckDB map extraction ``m['k']`` yields a LIST -> oracle uses ``m['k'][1]``.
- Only IEEE-exact math ops (abs/ceil/floor/round/sqrt/x*x) are oracled; libm
  transcendentals (ln/exp/pow) can differ in the last bit across engines.
- Both engines keep trailing empty strings when splitting; we filter empties.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kwack_spark.plans.registry import register
from kwack_spark.plans.relational import T


@register(
    "string_funcs",
    oracle="""
        SELECT c_custkey,
               lower(c_name) AS name_lc,
               upper(c_mktsegment) AS seg_uc,
               trim(concat('  ', c_name, ' ')) AS trimmed,
               substr(c_name, 1, 8) AS prefix,
               replace(c_name, '#', '-') AS replaced,
               length(c_name) AS name_len,
               concat(c_mktsegment, ':', c_name) AS tagged,
               contains(c_name, '1') AS has_one,
               lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
               regexp_extract(c_name, '([0-9]+)', 1) AS digits
        FROM customer
    """,
    tags=("functions", "string"),
)
def string_funcs(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("name_lc"),
        F.upper("c_mktsegment").alias("seg_uc"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit(" "))).alias("trimmed"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("replaced"),
        F.length("c_name").alias("name_len"),
        F.concat_ws(":", "c_mktsegment", "c_name").alias("tagged"),
        F.contains(F.col("c_name"), F.lit("1")).alias("has_one"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("digits"),
    )


@register(
    "date_funcs",
    oracle="""
        SELECT o_orderkey,
               year(o_orderdate) AS yr,
               month(o_orderdate) AS mo,
               day(o_orderdate) AS dy,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
               CAST(o_orderdate AS DATE) AS odate,
               date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-01') AS days_to_eoy,
               CAST(o_orderdate + INTERVAL 90 DAY AS DATE) AS due_date,
               strftime(o_orderdate, '%Y-%m') AS ym
        FROM orders
    """,
    tags=("functions", "date"),
)
def date_funcs(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.col("o_orderdate").cast("date").alias("odate"),
        F.datediff(F.lit("1998-12-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_eoy"
        ),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")).cast("date").alias("due_date"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


@register(
    "math_funcs",
    oracle="""
        SELECT c_custkey,
               abs(c_acctbal) AS abal,
               CAST(ceil(c_acctbal) AS BIGINT) AS cbal,
               CAST(floor(c_acctbal) AS BIGINT) AS fbal,
               round(c_acctbal, 1) AS rbal,
               sqrt(abs(c_acctbal)) AS sqbal,
               c_acctbal * c_acctbal AS bal2,
               CAST(sign(c_acctbal) AS INT) AS sg,
               c_custkey % 7 AS m7,
               greatest(c_acctbal, 0.0) AS pos,
               least(c_acctbal, 0.0) AS neg
        FROM customer
    """,
    tags=("functions", "math"),
)
def math_funcs(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    b = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.abs(b).alias("abal"),
        F.ceil(b).alias("cbal"),
        F.floor(b).alias("fbal"),
        F.round(b, 1).alias("rbal"),
        F.sqrt(F.abs(b)).alias("sqbal"),
        (b * b).alias("bal2"),
        F.signum(b).cast("int").alias("sg"),
        (F.col("c_custkey") % 7).alias("m7"),
        F.greatest(b, F.lit(0.0)).alias("pos"),
        F.least(b, F.lit(0.0)).alias("neg"),
    )


@register(
    "array_funcs",
    # Double-array outputs are projected to scalar elements (bit-exact on both
    # engines); int arrays to '|'-joined strings — the driver's hasher needs
    # hashable values, and float->string formatting is engine-specific.
    oracle="""
        SELECT vec_id,
               len(embedding) AS dim,
               embedding[1] AS first_val,
               embedding[64] AS last_val,
               embedding[1:4][2] AS head4_second,
               len(embedding[1:4]) AS head4_len,
               list_contains([1,2,3,5,8], label) AS label_fib,
               array_to_string(array_value(label, label * 2), '|') AS label_pair
        FROM embeddings
    """,
    tags=("functions", "array"),
)
def array_funcs(spark, sf_dir):
    e = T(spark, sf_dir, "embeddings")
    head4 = F.slice("embedding", 1, 4)
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).alias("first_val"),
        F.element_at("embedding", 64).alias("last_val"),
        F.element_at(head4, 2).alias("head4_second"),
        F.size(head4).alias("head4_len"),
        F.array_contains(F.array(*[F.lit(x) for x in (1, 2, 3, 5, 8)]), F.col("label")).alias(
            "label_fib"
        ),
        F.concat_ws("|", F.array(F.col("label"), F.col("label") * 2)).alias("label_pair"),
    )


@register(
    "higher_order_funcs",
    # transform/filter arrays are probed via scalar projections (first element,
    # lengths) — bit-exact doubles, hashable by the driver.
    oracle="""
        SELECT vec_id,
               list_transform(embedding[1:8]::DOUBLE[], x -> x * 2 + 1)[1] AS affine_first,
               list_transform(embedding[1:8]::DOUBLE[], x -> x * 2 + 1)[8] AS affine_last,
               list_filter(embedding[1:8]::DOUBLE[], x -> x > 0)[1] AS first_pos,
               len(list_filter(embedding[1:8]::DOUBLE[], x -> x > 0)) AS n_pos_head,
               len(list_filter(embedding::DOUBLE[], x -> x > 0)) AS n_pos,
               list_reduce(list_prepend(0.0, embedding[1:8]::DOUBLE[]), (acc, x) -> acc + x) AS head_sum
        FROM embeddings
    """,
    tags=("functions", "higher-order"),
)
def higher_order_funcs(spark, sf_dir):
    e = T(spark, sf_dir, "embeddings")
    head = F.slice("embedding", 1, 8).cast("array<double>")
    full = F.col("embedding").cast("array<double>")
    affine = F.transform(head, lambda x: x * 2 + 1)
    positives = F.filter(head, lambda x: x > 0)
    return e.select(
        "vec_id",
        F.element_at(affine, 1).alias("affine_first"),
        F.element_at(affine, 8).alias("affine_last"),
        F.try_element_at(positives, F.lit(1)).alias("first_pos"),
        F.size(positives).alias("n_pos_head"),
        F.size(F.filter(full, lambda x: x > 0)).alias("n_pos"),
        F.aggregate(head, F.lit(0.0), lambda acc, x: acc + x).alias("head_sum"),
    )


@register(
    "map_funcs",
    oracle="""
        SELECT n_nationkey,
               map(['name','region'], [n_name, CAST(n_regionkey AS VARCHAR)])['name'][1] AS m_name,
               map(['name','region'], [n_name, CAST(n_regionkey AS VARCHAR)])['region'][1] AS m_region,
               array_to_string(map_keys(map(['name','region'], [n_name, CAST(n_regionkey AS VARCHAR)])), '|') AS mkeys
        FROM nation
    """,
    tags=("functions", "map"),
)
def map_funcs(spark, sf_dir):
    n = T(spark, sf_dir, "nation")
    m = F.create_map(
        F.lit("name"),
        F.col("n_name"),
        F.lit("region"),
        F.col("n_regionkey").cast("string"),
    )
    return n.select(
        "n_nationkey",
        F.element_at(m, "name").alias("m_name"),
        F.element_at(m, "region").alias("m_region"),
        F.concat_ws("|", F.map_keys(m)).alias("mkeys"),
    )


@register(
    "struct_funcs",
    oracle="""
        SELECT s_suppkey,
               {'name': s_name, 'nation': s_nationkey}.name AS st_name,
               {'name': s_name, 'nation': s_nationkey}.nation AS st_nation
        FROM supplier
    """,
    tags=("functions", "struct"),
)
def struct_funcs(spark, sf_dir):
    s = T(spark, sf_dir, "supplier")
    st = F.struct(F.col("s_name").alias("name"), F.col("s_nationkey").alias("nation"))
    return s.select(
        "s_suppkey",
        st.getField("name").alias("st_name"),
        st.getField("nation").alias("st_nation"),
    )


@register(
    "json_funcs",
    oracle="""
        SELECT event_id,
               CAST(props->>'$.k' AS BIGINT) AS k_val,
               props->>'$.k' AS k_str,
               CASE WHEN json_valid(props) THEN 1 ELSE 0 END AS valid
        FROM events
    """,
    tags=("functions", "json"),
)
def json_funcs(spark, sf_dir):
    """Raw-JSON column access — the reference's schema-less `json` serde mode
    stores the value as a JSON column queried with JSON functions
    (KwackEngine.java:672-673); events.props is the equivalent here."""
    e = T(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
        F.get_json_object("props", "$.k").alias("k_str"),
        F.when(F.from_json("props", "k BIGINT").isNotNull(), 1).otherwise(0).alias("valid"),
    )


@register(
    "variant_json_funcs",
    # Spark 4 VARIANT: parse once, typed extraction via variant_get — the
    # shredded-JSON path a raw-json topic should use at scale (parse cost
    # paid once per row, extraction stays JVM-side)
    oracle="""
        SELECT event_id,
               CAST(props->>'$.k' AS BIGINT) AS k_val,
               props->>'$.k' AS k_str,
               CAST(props->>'$.k' AS BIGINT) % 7 = 0 AS k_div7
        FROM events
    """,
    tags=("functions", "json", "variant"),
)
def variant_json_funcs(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "bigint")
    return e.select(
        "event_id",
        k.alias("k_val"),
        F.variant_get(v, "$.k", "string").alias("k_str"),
        (k % 7 == 0).alias("k_div7"),
    )


@register(
    "explode_word_counts",
    oracle="""
        SELECT tok, COUNT(*) AS n
        FROM (
            SELECT unnest(string_split(regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' ')) AS tok
            FROM documents
        )
        WHERE length(tok) > 0
        GROUP BY tok
        ORDER BY n DESC, tok
        LIMIT 20
    """,
    tags=("functions", "explode"),
)
def explode_word_counts(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            # lower BEFORE stripping [^a-z ] (the _NORM convention) — the
            # reverse order would delete uppercase letters outright
            F.split(F.regexp_replace(F.lower(F.col("text")), "[^a-z ]", ""), " ")
        ).alias("tok")
    )
    return (
        toks.filter(F.length("tok") > 0)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(20)
    )


@register(
    "conditional_funcs",
    oracle="""
        SELECT c_custkey,
               coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
               greatest(c_acctbal, 0.0) AS bal_floor,
               least(CAST(c_custkey AS BIGINT), 1000) AS capped,
               CASE WHEN c_acctbal < 0 THEN 'neg'
                    WHEN c_acctbal = 0 THEN 'zero'
                    ELSE 'pos' END AS bal_sign,
               c_acctbal / nullif(c_custkey % 5, 0) AS safe_div,
               ifnull(nullif(c_mktsegment, c_mktsegment), 'was_null') AS always_filled
        FROM customer
    """,
    tags=("functions", "conditional"),
)
def conditional_funcs(spark, sf_dir):
    """Null-handling / conditional family: coalesce, nullif, greatest,
    least, CASE, division guarded by nullif (both engines agree NULL / x
    and x / NULL are NULL; x / 0 is an error neither side evaluates)."""
    c = T(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        F.greatest("c_acctbal", F.lit(0.0)).alias("bal_floor"),
        F.least(F.col("c_custkey"), F.lit(1000).cast("long")).alias("capped"),
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") == 0, "zero")
        .otherwise("pos")
        .alias("bal_sign"),
        (F.col("c_acctbal") / F.nullif(F.col("c_custkey") % 5, F.lit(0))).alias(
            "safe_div"
        ),
        F.ifnull(F.nullif("c_mktsegment", F.col("c_mktsegment")), F.lit("was_null")).alias(
            "always_filled"
        ),
    )


@register(
    "bitwise_funcs",
    oracle="""
        SELECT o_orderkey,
               o_orderkey & 255 AS and_low,
               o_orderkey | 4096 AS or_bit,
               xor(o_orderkey, 1023) AS xor_mask,
               o_orderkey << 3 AS shl3,
               o_orderkey >> 2 AS shr2,
               ~o_orderkey AS inv,
               bit_count(o_orderkey) AS popcount
        FROM orders
    """,
    tags=("functions", "bitwise"),
)
def bitwise_funcs(spark, sf_dir):
    """Bitwise family over BIGINT keys: and/or/xor, shifts, complement,
    popcount — all JVM-side integer ops, bit-identical across engines."""
    o = T(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("and_low"),
        k.bitwiseOR(F.lit(4096)).alias("or_bit"),
        k.bitwiseXOR(F.lit(1023)).alias("xor_mask"),
        F.shiftleft(k, 3).alias("shl3"),
        F.shiftright(k, 2).alias("shr2"),
        F.bitwise_not(k).alias("inv"),
        F.bit_count(k).alias("popcount"),
    )


@register(
    "regexp_funcs",
    oracle="""
        SELECT doc_id,
               len(regexp_extract_all(text, '[a-z]+')) AS n_word_matches,
               regexp_extract(text, '([a-z]+)', 1) AS first_word,
               regexp_replace(text, ' +', '_', 'g') AS underscored,
               regexp_matches(text, 'spark') AS has_spark
        FROM documents
    """,
    tags=("functions", "regexp"),
)
def regexp_funcs(spark, sf_dir):
    """Regex family: extract-all (counted — array outputs don't hash in the
    driver), first-match extract, global replace (Spark replaces all by
    default; DuckDB needs the 'g' flag), boolean match."""
    d = T(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+"), 0)).alias(
            "n_word_matches"
        ),
        F.regexp_extract("text", "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("text", " +", "_").alias("underscored"),
        F.col("text").rlike("spark").alias("has_spark"),
    )
