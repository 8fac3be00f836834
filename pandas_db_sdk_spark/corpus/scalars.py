"""Scalar function surface — SURVEY §2 C48–C54 (pandas .str/.dt/ufuncs/json).

All JVM-side built-ins (whole-stage codegen — no Python in the row path).
Regex patterns are kept to the dialect intersection of Java regex and RE2 so
the DuckDB oracle agrees. libm-backed functions (exp/ln/pow) are rounded to
6 dp: implementations may differ in the last ulp.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ._util import registry, tables

QUERIES, ORACLE, q = registry()


@q(
    "c48_string_fns",
    """SELECT c_custkey,
              upper(c_name) AS up,
              lower(c_mktsegment) AS lo,
              substring(c_name, 1, 8) AS sub8,
              length(c_name) AS len,
              concat_ws('|', c_mktsegment, c_name) AS joined,
              trim('  ' || c_name || ' ') AS trimmed,
              lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
              regexp_extract(c_name, '([0-9]+)', 1) AS digits,
              regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
              starts_with(c_name, 'Customer') AS is_cust,
              contains(c_mktsegment, 'MACH') AS has_mach,
              replace(c_mktsegment, 'A', '@') AS replaced,
              split_part(c_name, '#', 2) AS after_hash
       FROM customer""",
)
def c48(spark, sf_dir):
    """C48: string family — upper/lower/substr/length/concat/trim/pad/regex/
    predicates/split."""
    c = tables(spark, sf_dir)("customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up"),
        F.lower("c_mktsegment").alias("lo"),
        F.substring("c_name", 1, 8).alias("sub8"),
        F.length("c_name").alias("len"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("joined"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit(" "))).alias("trimmed"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        F.regexp_replace("c_name", "[0-9]", "#").alias("masked"),
        F.startswith("c_name", F.lit("Customer")).alias("is_cust"),
        F.contains("c_mktsegment", F.lit("MACH")).alias("has_mach"),
        F.replace("c_mktsegment", F.lit("A"), F.lit("@")).alias("replaced"),
        F.split_part("c_name", F.lit("#"), F.lit(2)).alias("after_hash"),
    )


@q(
    "c49_date_fns",
    """SELECT o_orderkey,
              year(o_orderdate) AS yr,
              month(o_orderdate) AS mo,
              day(o_orderdate) AS dy,
              CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
              dayofweek(o_orderdate) + 1 AS dow,
              strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
              strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
              date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
              strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
              strftime(o_orderdate, '%Y-%m-%d') AS iso
       FROM orders""",
)
def c49(spark, sf_dir):
    """C49: date/time family. Session TZ pinned to UTC so timestamp→date is
    engine-independent. Spark dayofweek is 1=Sunday; DuckDB's is 0=Sunday —
    oracle adds 1."""
    o = tables(spark, sf_dir)("orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("dy"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
        F.dayofweek("o_orderdate").cast("long").alias("dow"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("plus30"),
        F.datediff(F.lit("2002-01-01").cast("date"), d).cast("long").alias("days_to_2002"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso"),
    )


@q(
    "c50_math_fns",
    """SELECT l_orderkey, l_linenumber,
              abs(l_discount - 0.05) AS a,
              round(l_extendedprice, 1) AS r1,
              CAST(floor(l_quantity / 7) AS BIGINT) AS fl,
              CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS ce,
              round(sqrt(l_extendedprice), 6) AS sq,
              round(pow(l_quantity, 2), 6) AS p2,
              round(exp(l_discount), 6) AS ex,
              round(ln(l_extendedprice), 6) AS lg,
              CAST(sign(l_discount - 0.05) AS DOUBLE) AS sg,
              greatest(l_quantity, 25.0) AS gt,
              least(l_tax, 0.04) AS lt,
              l_linenumber % 3 AS md
       FROM lineitem""",
)
def c50(spark, sf_dir):
    """C50: math family (numpy-ufunc analogues)."""
    li = tables(spark, sf_dir)("lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("a"),
        F.round("l_extendedprice", 1).alias("r1"),
        F.floor(F.col("l_quantity") / 7).alias("fl"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("ce"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("sq"),
        F.round(F.pow("l_quantity", F.lit(2)), 6).alias("p2"),
        F.round(F.exp("l_discount"), 6).alias("ex"),
        F.round(F.log("l_extendedprice"), 6).alias("lg"),
        F.signum(F.col("l_discount") - 0.05).alias("sg"),
        F.greatest("l_quantity", F.lit(25.0)).alias("gt"),
        F.least("l_tax", F.lit(0.04)).alias("lt"),
        (F.col("l_linenumber") % 3).alias("md"),
    )


@q(
    "c51_array_fns",
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tokens FROM documents)
       SELECT doc_id,
              len(tokens) AS n_tokens,
              len(list_distinct(tokens)) AS n_unique,
              list_contains(tokens, 'data') AS has_data,
              array_to_string(tokens[1:3], ' ') AS first3,
              list_sort(tokens)[1] AS min_token,
              len(list_filter(tokens, t -> length(t) > 5)) AS n_long,
              CAST(len(list_filter(tokens, t -> t IS NOT NULL)) AS INTEGER) AS n_nonnull
       FROM tok""",
)
def c51(spark, sf_dir):
    """C51: array higher-order functions over tokenized text — size, distinct,
    contains, slice, sort, filter. All JVM-side HOFs (no UDF)."""
    d = tables(spark, sf_dir)("documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.array_contains(toks, "data").alias("has_data"),
        F.array_join(F.slice(toks, 1, 3), " ").alias("first3"),
        F.element_at(F.array_sort(toks), 1).alias("min_token"),
        F.size(F.filter(toks, lambda t: F.length(t) > 5)).alias("n_long"),
        F.aggregate(
            toks, F.lit(0), lambda acc, t: acc + F.when(t.isNotNull(), 1).otherwise(0)
        ).alias("n_nonnull"),
    )


@q(
    "c52_map_struct",
    """SELECT c_custkey,
              c_name AS s_name,          -- struct_pack(...).name ≡ identity
              c_acctbal AS s_bal,        -- struct_pack(...).bal  ≡ identity
              c_mktsegment AS m_seg,     -- map lookup of the packed value
              'a,b' AS m_keys            -- sorted keys of the 2-entry map
       FROM customer""",
)
def c52(spark, sf_dir):
    """C52: struct/map create + field access; complex values reduced to
    scalars at the output boundary so hashes are comparable."""
    c = tables(spark, sf_dir)("customer")
    st = F.struct(F.col("c_name").alias("name"), F.col("c_acctbal").alias("bal"))
    mp = F.create_map(F.lit("segment"), F.col("c_mktsegment"))
    mp2 = F.create_map(F.lit("a"), F.col("c_acctbal"), F.lit("b"), F.lit(0.0))
    return c.select(
        "c_custkey",
        st.getField("name").alias("s_name"),
        st.getField("bal").alias("s_bal"),
        mp.getItem("segment").alias("m_seg"),
        F.array_join(F.map_keys(mp2), ",").alias("m_keys"),
    )


@q(
    "c53_json",
    """SELECT event_id,
              CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_path,
              json_extract_string(props, '$.k') AS k_str
       FROM events""",
)
def c53(spark, sf_dir):
    """C53: JSON column handling (`events.props`, the reference's JSON-records
    wire format, client.py:114) — schema'd from_json plus path extraction."""
    from pyspark.sql import types as T

    e = tables(spark, sf_dir)("events")
    schema = T.StructType([T.StructField("k", T.LongType())])
    return e.select(
        "event_id",
        F.from_json("props", schema).getField("k").alias("k_path"),
        F.get_json_object("props", "$.k").alias("k_str"),
    )


@q(
    "c54_hash",
    """SELECT doc_id,
              sha256(text) AS sha_hex,
              md5(text) AS md5_hex,
              length(sha256(text)) AS sha_len
       FROM documents""",
)
def c54(spark, sf_dir):
    """C54: content hashing (the reference's chunk-id/uuid analogue,
    README.md:197) — sha2/md5 agree across engines; xxhash64/uuid are
    engine-specific so they live in the dedup ops (rows-only)."""
    d = tables(spark, sf_dir)("documents")
    return d.select(
        "doc_id",
        F.sha2("text", 256).alias("sha_hex"),
        F.md5("text").alias("md5_hex"),
        F.length(F.sha2("text", 256)).alias("sha_len"),
    )


@q(
    "c48b_regex_parts",
    """SELECT p_partkey,
              array_to_string(regexp_extract_all(p_name, '[a-z]+'), '|') AS words,
              split_part(p_type, ' ', 1) AS first_word,
              reverse(p_brand) AS rbrand,
              repeat(p_brand, 2) AS brand2,
              left(p_name, 5) AS name5,
              right(p_name, 3) AS name_tail
       FROM part""",
)
def c48b(spark, sf_dir):
    """C48 variant: regexp_extract_all / split_part / reverse / repeat /
    left / right (pandas ``.str.findall``/``.str.split`` family). All
    JVM built-ins — stays inside whole-stage codegen."""
    p = tables(spark, sf_dir)("part")
    return p.select(
        "p_partkey",
        F.array_join(F.regexp_extract_all("p_name", F.lit("[a-z]+"), 0), "|").alias(
            "words"
        ),
        F.split_part("p_type", F.lit(" "), F.lit(1)).alias("first_word"),
        F.reverse("p_brand").alias("rbrand"),
        F.repeat("p_brand", 2).alias("brand2"),
        F.left("p_name", F.lit(5)).alias("name5"),
        F.right("p_name", F.lit(3)).alias("name_tail"),
    )


@q(
    "c48c_fuzzy_strings",
    """SELECT p_partkey,
              levenshtein(p_brand, 'Brand#11') AS lev,
              printf('%s-%04d', p_brand, p_size) AS tag,
              translate(p_name, 'aeiou', 'AEIOU') AS shouted,
              strpos(p_name, 'a') AS first_a,
              ord(p_brand) AS first_cp
       FROM part""",
)
def c48c(spark, sf_dir):
    """C48 variant: edit distance (the scalar primitive under fuzzy matching
    and spell-variant dedup), printf-style formatting, translate, instr,
    ascii — all JVM built-ins."""
    p = tables(spark, sf_dir)("part")
    return p.select(
        "p_partkey",
        F.levenshtein("p_brand", F.lit("Brand#11")).alias("lev"),
        F.format_string("%s-%04d", F.col("p_brand"), F.col("p_size")).alias("tag"),
        F.translate("p_name", "aeiou", "AEIOU").alias("shouted"),
        F.instr("p_name", "a").alias("first_a"),
        F.ascii("p_brand").alias("first_cp"),
    )


@q(
    "c49b_date_series",
    """SELECT o_orderkey, strftime(m, '%Y-%m-%d') AS month_start
       FROM (SELECT o_orderkey,
                    unnest(generate_series(date_trunc('month', o_orderdate),
                                           date_trunc('month', o_orderdate) + INTERVAL 2 MONTH,
                                           INTERVAL 1 MONTH)) AS m
             FROM orders)""",
)
def c49b(spark, sf_dir):
    """C49/C51 variant: per-row date series generation + explode (pandas
    `date_range` per row) — the calendar-spine primitive behind resampling
    and gap-filling, fully codegen'd (sequence is a JVM HOF)."""
    o = tables(spark, sf_dir)("orders")
    start = F.date_trunc("month", F.col("o_orderdate"))
    series = F.sequence(start, F.add_months(start, 2), F.expr("interval 1 month"))
    return o.select(
        "o_orderkey",
        F.explode(series).alias("m"),
    ).select("o_orderkey", F.date_format("m", "yyyy-MM-dd").alias("month_start"))


@q(
    "c50b_bitwise",
    """SELECT o_orderkey,
              o_orderkey & 255 AS low_byte,
              o_orderkey | 4096 AS with_flag,
              xor(o_orderkey, 255) AS flipped,
              o_orderkey << 2 AS shl,
              o_orderkey >> 3 AS shr
       FROM orders""",
)
def c50b(spark, sf_dir):
    """C50 variant: bitwise family (mask/flag/shift — the substrate of
    bitmap-style encodings like SimHash, dedup.py)."""
    o = tables(spark, sf_dir)("orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(255)).alias("flipped"),
        F.shiftleft(k, 2).alias("shl"),
        F.shiftright(k, 3).alias("shr"),
    )


@q(
    "c51b_array_setops",
    """SELECT doc_id,
              coalesce(array_to_string(list_sort(list_distinct(list_intersect(a, b))), ','), '') AS inter,
              coalesce(array_to_string(list_sort(list_distinct(list_concat(a, b))), ','), '') AS uni,
              coalesce(array_to_string(list_sort(list_distinct(
                  list_filter(a, x -> NOT list_contains(b, x)))), ','), '') AS diff
       FROM (SELECT doc_id,
                    list_slice(string_split(text, ' '), 1, 6) AS a,
                    list_slice(string_split(text, ' '), 4, 12) AS b
             FROM documents)""",
)
def c51b(spark, sf_dir):
    """C51 variant: array set algebra (intersect/union/except) over token
    slices — normalized by distinct+sort on both engines so bag-order
    differences can't leak into the hash."""
    d = tables(spark, sf_dir)("documents")
    toks = F.split(F.col("text"), " ")
    a = F.slice(toks, 1, 6)
    b = F.slice(toks, 4, 9)  # elements 4..12 inclusive → length 9
    norm = lambda c: F.array_join(F.array_sort(F.array_distinct(c)), ",")
    return d.select(
        "doc_id",
        norm(F.array_intersect(a, b)).alias("inter"),
        norm(F.array_union(a, b)).alias("uni"),
        norm(F.array_except(a, b)).alias("diff"),
    )


@q(
    "c52b_map_ops",
    """SELECT c_custkey,
              MAP {'seg': c_mktsegment, 'nm': c_name}['seg'][1] AS seg_val,
              array_to_string(list_sort(map_keys(
                  map_concat(MAP {'seg': c_mktsegment}, MAP {'nm': c_name}))), ',') AS ks,
              CAST(cardinality(MAP {'seg': c_mktsegment, 'nm': c_name}) AS BIGINT) AS n_entries
       FROM customer""",
)
def c52b(spark, sf_dir):
    """C52 variant: map construction / lookup / key listing / concat /
    cardinality (pandas dict-column idioms). Values exit as scalars and
    sorted key strings so the hash is engine-neutral."""
    c = tables(spark, sf_dir)("customer")
    m = F.create_map(
        F.lit("seg"), F.col("c_mktsegment"), F.lit("nm"), F.col("c_name")
    )
    mc = F.map_concat(
        F.create_map(F.lit("seg"), F.col("c_mktsegment")),
        F.create_map(F.lit("nm"), F.col("c_name")),
    )
    return c.select(
        "c_custkey",
        F.element_at(m, "seg").alias("seg_val"),
        F.array_join(F.array_sort(F.map_keys(mc)), ",").alias("ks"),
        F.size(m).cast("long").alias("n_entries"),
    )


@q(
    "c50c_bucketize",
    """SELECT o_orderkey,
              CASE WHEN o_totalprice < 0 THEN 0
                   WHEN o_totalprice >= 500000 THEN 21
                   ELSE 1 + CAST(floor(o_totalprice / 25000.0) AS BIGINT)
              END AS price_bucket,
              CASE WHEN o_totalprice < 100000 THEN 'low'
                   WHEN o_totalprice < 300000 THEN 'mid'
                   ELSE 'high' END AS price_band
       FROM orders""",
)
def c50c(spark, sf_dir):
    """C50 variant: pandas `cut` — fixed-width binning via width_bucket
    plus labeled bands; pure per-row arithmetic on the scan."""
    o = tables(spark, sf_dir)("orders")
    return o.select(
        "o_orderkey",
        F.width_bucket("o_totalprice", F.lit(0), F.lit(500000), F.lit(20)).alias(
            "price_bucket"
        ),
        F.when(F.col("o_totalprice") < 100000, "low")
        .when(F.col("o_totalprice") < 300000, "mid")
        .otherwise("high")
        .alias("price_band"),
    )


@q(
    "c53b_variant",
    """SELECT event_id,
              CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
              json_extract_string(props, '$.k') AS k_str,
              CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod
       FROM events""",
)
def c53b(spark, sf_dir):
    """C53 variant: Spark 4 VariantType — parse the JSON column ONCE into a
    variant (binary semi-structured encoding) and extract typed paths from
    it. At scale this beats per-path get_json_object (which re-parses the
    string for every path) and keeps shredded access open to future
    pushdown."""
    e = tables(spark, sf_dir)("events")
    v = F.parse_json("props")
    return e.select(
        "event_id",
        F.variant_get(v, "$.k", "long").alias("k_num"),
        F.variant_get(v, "$.k", "string").alias("k_str"),
        (F.variant_get(v, "$.k", "long") % 10).alias("k_mod"),
    )


@q(
    "c48d_string_fns2",
    """SELECT c_custkey,
              reverse(c_name) AS rev_name,
              repeat(c_mktsegment, 2) AS seg2,
              ascii(c_name) AS first_code,
              CAST(strpos(c_name, '#') AS INTEGER) AS hash_pos,
              translate(c_name, '#0', '_x') AS translated,
              left(c_name, 8) AS name8,
              right(c_name, 4) AS tail4,
              rpad(c_mktsegment, 12, '*') AS seg_pad
       FROM customer""",
)
def c48d(spark, sf_dir):
    """C48 variant: the second string batch (reverse/repeat/ascii/locate/
    translate/left/right/rpad — pandas `.str` long tail). Stays the
    zero-shuffle scan→project codegen pipeline."""
    c = tables(spark, sf_dir)("customer")
    return c.select(
        "c_custkey",
        F.reverse("c_name").alias("rev_name"),
        F.repeat("c_mktsegment", 2).alias("seg2"),
        F.ascii("c_name").alias("first_code"),
        F.instr("c_name", "#").cast("int").alias("hash_pos"),
        F.translate("c_name", "#0", "_x").alias("translated"),
        F.substring("c_name", 1, 8).alias("name8"),
        F.substring(F.col("c_name"), -4, 4).alias("tail4"),
        F.rpad("c_mktsegment", 12, "*").alias("seg_pad"),
    )


@q(
    "c49c_calendar",
    """SELECT o_orderkey,
              CAST(quarter(o_orderdate) AS INTEGER) AS q,
              CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
              CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
              CAST(last_day(o_orderdate) AS VARCHAR) AS month_end,
              CAST(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS VARCHAR) AS plus3m
       FROM orders""",
)
def c49c(spark, sf_dir):
    """C49 variant: calendar functions (quarter / day-of-year / ISO week /
    last_day / add_months — pandas `.dt` long tail). Dates leave the query
    as strings per the hash-match discipline."""
    o = tables(spark, sf_dir)("orders")
    return o.select(
        "o_orderkey",
        F.quarter("o_orderdate").cast("int").alias("q"),
        F.dayofyear("o_orderdate").cast("int").alias("doy"),
        F.weekofyear("o_orderdate").cast("int").alias("iso_week"),
        F.last_day("o_orderdate").cast("string").alias("month_end"),
        F.add_months("o_orderdate", 3).cast("string").alias("plus3m"),
    )


@q(
    "c50d_math_ext",
    """SELECT l_orderkey, l_linenumber,
              round(sin(l_quantity), 6) AS sin_q,
              round(cos(l_discount), 6) AS cos_d,
              round(atan2(l_quantity, l_extendedprice), 6) AS angle,
              round(log10(l_extendedprice), 6) AS log10_price,
              round(cbrt(l_quantity), 6) AS cbrt_q,
              round(degrees(l_tax), 6) AS tax_deg
       FROM lineitem""",
)
def c50d(spark, sf_dir):
    """C50 variant: trig / log / root long tail (numpy ufunc surface).
    libm-backed — rounded to 6 dp per the module discipline (last-ulp
    differences between implementations)."""
    li = tables(spark, sf_dir)("lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sin("l_quantity"), 6).alias("sin_q"),
        F.round(F.cos("l_discount"), 6).alias("cos_d"),
        F.round(F.atan2(F.col("l_quantity"), F.col("l_extendedprice")), 6).alias("angle"),
        F.round(F.log10("l_extendedprice"), 6).alias("log10_price"),
        F.round(F.cbrt("l_quantity"), 6).alias("cbrt_q"),
        F.round(F.degrees("l_tax"), 6).alias("tax_deg"),
    )


@q(
    "c51c_posexplode",
    """SELECT vec_id, CAST(unnest(range(len(embedding))) AS INT) AS pos,
              round(CAST(unnest(embedding) AS DOUBLE), 6) AS val
       FROM embeddings""",
)
def c51c(spark, sf_dir):
    """C51 variant: positional explode (pandas `Series.explode` with the
    index kept / LATERAL VIEW posexplode) — the array→rows direction with
    ordinal preserved, the shape tokenized columns flatten through. Zero
    shuffle: Generate sits in the scan stage."""
    e = tables(spark, sf_dir)("embeddings")
    return e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).select(
        "vec_id",
        F.col("pos").cast("int").alias("pos"),
        F.round(F.col("val").cast("double"), 6).alias("val"),
    )
