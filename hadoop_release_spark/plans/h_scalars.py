"""§2.H — scalar function surface.

Reference analog: in MapReduce all scalar computation is arbitrary
user code inside the Mapper; this engine exposes it as Catalyst
builtin expressions (codegen'd, vectorizable, optimizable — constant
folding, null propagation). Every function here is JVM-side; no
Python UDFs (those live in §2.K).

Cross-engine gotchas pinned here (SURVEY.md §2 rules 7-10):
dayofweek offset, truncating vs rounding casts, datediff argument
order, format-pattern dialects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_release_spark.catalog import table
from hadoop_release_spark.functions.contracts import r2, r6, ts_us
from hadoop_release_spark.plans.registry import register


@register(
    "h01_str_basic",
    oracle="""
    SELECT c_custkey,
           concat(c_name, '#', c_mktsegment) AS cat,
           upper(c_name) AS up,
           lower(c_mktsegment) AS lo,
           length(c_name) AS len,
           trim(concat('  ', c_name, '  ')) AS trimmed,
           ltrim(concat('  ', c_name)) AS l_trimmed,
           rtrim(concat(c_name, '  ')) AS r_trimmed
    FROM customer
    """,
)
def h01_str_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concat/case/length/trim family."""
    c = table(spark, sf_dir, "customer")
    name = F.col("c_name")
    return c.select(
        "c_custkey",
        F.concat(name, F.lit("#"), F.col("c_mktsegment")).alias("cat"),
        F.upper(name).alias("up"),
        F.lower(F.col("c_mktsegment")).alias("lo"),
        F.length(name).cast("long").alias("len"),
        F.trim(F.concat(F.lit("  "), name, F.lit("  "))).alias("trimmed"),
        F.ltrim(F.concat(F.lit("  "), name)).alias("l_trimmed"),
        F.rtrim(F.concat(name, F.lit("  "))).alias("r_trimmed"),
    )


@register(
    "h02_str_substr_pad",
    oracle="""
    SELECT p_partkey,
           substring(p_name, 2, 5) AS sub,
           lpad(p_name, 15, '*') AS padded_l,
           rpad(p_name, 15, '.') AS padded_r,
           left(p_name, 4) AS l4,
           right(p_name, 4) AS r4
    FROM part
    """,
    priority="P2",
)
def h02_str_substr_pad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slicing and padding (1-based substring in both engines; lpad
    truncates when the input exceeds the target length, identically)."""
    p = table(spark, sf_dir, "part")
    name = F.col("p_name")
    return p.select(
        "p_partkey",
        F.substring(name, 2, 5).alias("sub"),
        F.lpad(name, 15, "*").alias("padded_l"),
        F.rpad(name, 15, ".").alias("padded_r"),
        F.expr("left(p_name, 4)").alias("l4"),
        F.expr("right(p_name, 4)").alias("r4"),
    )


@register(
    "h03_str_split",
    oracle="""
    SELECT doc_id,
           string_split(text, ' ')[1] AS first_tok,
           string_split(text, ' ')[3] AS third_tok,
           len(string_split(text, ' ')) AS n_toks
    FROM documents
    """,
)
def h03_str_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split + positional access (F.get is 0-based and null-safe
    out-of-bounds, matching DuckDB's 1-based list indexing)."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.get(toks, 0).alias("first_tok"),
        F.get(toks, 2).alias("third_tok"),
        F.size(toks).cast("long").alias("n_toks"),
    )


@register(
    "h04_str_regexp_fn",
    oracle="""
    SELECT p_partkey,
           coalesce(regexp_extract(p_name, '([aeiou]+)', 1), '') AS vowels,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS consonants
    FROM part
    """,
    priority="P2",
)
def h04_str_regexp_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extract (first vowel run) + global replace. Spark's
    regexp_replace is global by default; DuckDB needs the 'g' flag.
    No-match extract: Spark returns '', DuckDB NULL → coalesce."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract(F.col("p_name"), "([aeiou]+)", 1).alias("vowels"),
        F.regexp_replace(F.col("p_name"), "[aeiou]", "_").alias("consonants"),
    )


@register(
    "h05_str_predicates",
    oracle="""
    SELECT p_partkey,
           contains(p_name, 'an') AS has_an,
           starts_with(p_name, 'b') AS starts_b,
           ends_with(p_name, 's') AS ends_s,
           replace(p_name, 'a', 'o') AS replaced,
           reverse(p_name) AS reversed
    FROM part
    """,
    priority="P2",
)
def h05_str_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """contains/prefix/suffix predicates + replace/reverse."""
    p = table(spark, sf_dir, "part")
    name = F.col("p_name")
    return p.select(
        "p_partkey",
        name.contains("an").alias("has_an"),
        name.startswith("b").alias("starts_b"),
        name.endswith("s").alias("ends_s"),
        F.replace(name, F.lit("a"), F.lit("o")).alias("replaced"),
        F.reverse(name).alias("reversed"),
    )


@register(
    "h06_date_extract",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS y,
           month(o_orderdate) AS mo,
           day(o_orderdate) AS d,
           hour(o_orderdate) AS h,
           (dayofweek(o_orderdate) + 1) AS dow,
           quarter(o_orderdate) AS q,
           weekofyear(o_orderdate) AS woy
    FROM orders
    """,
)
def h06_date_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-field extraction. Spark dayofweek is 1=Sunday while
    DuckDB's is 0=Sunday — the oracle carries the +1 (rule 8)."""
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("long").alias("y"),
        F.month(d).cast("long").alias("mo"),
        F.dayofmonth(d).cast("long").alias("d"),
        F.hour(d).cast("long").alias("h"),
        F.dayofweek(d).cast("long").alias("dow"),
        F.quarter(d).cast("long").alias("q"),
        F.weekofyear(d).cast("long").alias("woy"),
    )


@register(
    "h07_date_trunc",
    oracle="""
    SELECT o_orderkey,
           CAST(epoch_us(date_trunc('month', o_orderdate)) AS BIGINT) AS month_us,
           CAST(epoch_us(date_trunc('day', o_orderdate)) AS BIGINT) AS day_us
    FROM orders
    """,
)
def h07_date_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncation to month/day (epoch-µs projection for hashing)."""
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        ts_us(F.date_trunc("month", d)).alias("month_us"),
        ts_us(F.date_trunc("day", d)).alias("day_us"),
    )


@register(
    "h08_date_arith",
    oracle="""
    SELECT o_orderkey,
           strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus30,
           strftime(CAST(o_orderdate AS DATE) - INTERVAL 2 MONTH, '%Y-%m-%d') AS minus2mo,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS BIGINT) AS days_to_y2k
    FROM orders
    """,
)
def h08_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic. datediff(end, start) in Spark equals
    date_diff('day', start, end) in DuckDB — argument order flips
    (rule 9). Results are emitted as strings/bigints for portability."""
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("plus30"),
        F.date_format(F.add_months(d, -2), "yyyy-MM-dd").alias("minus2mo"),
        F.datediff(F.lit("2000-01-01").cast("date"), d).cast("long").alias("days_to_y2k"),
    )


@register(
    "h09_date_format",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m') AS ym,
           strftime(o_orderdate, '%d/%m/%Y') AS dmy
    FROM orders
    """,
    priority="P2",
)
def h09_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Formatting: Spark pattern letters (yyyy-MM) translate to
    strftime codes (%Y-%m) — compare the output strings (rule 10)."""
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_format(d, "yyyy-MM").alias("ym"),
        F.date_format(d, "dd/MM/yyyy").alias("dmy"),
    )


@register(
    "h10_math_basic",
    oracle="""
    SELECT c_custkey,
           round(c_acctbal / 7, 2) AS div_rounded,
           floor(c_acctbal) AS fl,
           ceil(c_acctbal) AS ce,
           abs(c_acctbal) AS ab,
           c_custkey % 7 AS m7,
           power(2.0, c_custkey % 10) AS pow2,
           sqrt(abs(c_acctbal)) AS sq,
           CAST(sign(c_acctbal) AS BIGINT) AS sg
    FROM customer
    """,
)
def h10_math_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic builtins. Note rule 7: Spark double→int casts
    truncate while DuckDB rounds, so contract queries use explicit
    floor/ceil, never bare casts of fractional doubles. power stays
    on exact powers of two; sqrt is IEEE-correctly-rounded in both."""
    c = table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        r2(bal / 7).alias("div_rounded"),
        F.floor(bal).cast("double").alias("fl"),
        F.ceil(bal).cast("double").alias("ce"),
        F.abs(bal).alias("ab"),
        F.pmod(F.col("c_custkey"), F.lit(7)).cast("long").alias("m7"),
        F.pow(F.lit(2.0), F.pmod(F.col("c_custkey"), F.lit(10))).alias("pow2"),
        F.sqrt(F.abs(bal)).alias("sq"),
        F.signum(bal).cast("long").alias("sg"),
    )


@register(
    "h11_math_log",
    oracle="""
    SELECT c_custkey,
           round(exp(c_acctbal / 10000), 6) AS e_x,
           round(ln(abs(c_acctbal) + 1), 6) AS ln_x,
           round(log10(abs(c_acctbal) + 1), 6) AS log10_x,
           round(log2(abs(c_acctbal) + 1), 6) AS log2_x
    FROM customer
    """,
    priority="P2",
)
def h11_math_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcendentals rounded to 6dp: libm vs java.lang.Math differ
    only in the last ~bit (≈1e-16 relative), far inside the 5e-7
    half-grid, so the rounding is collision-free."""
    c = table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    safe = F.abs(bal) + 1
    return c.select(
        "c_custkey",
        r6(F.exp(bal / 10000)).alias("e_x"),
        r6(F.log(safe)).alias("ln_x"),
        r6(F.log10(safe)).alias("log10_x"),
        r6(F.log2(safe)).alias("log2_x"),
    )


@register(
    "h12_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END AS band,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_or_default,
           greatest(o_totalprice, 150000.0) AS floor_150k,
           least(o_totalprice, 150000.0) AS cap_150k
    FROM orders
    """,
)
def h12_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN chains + coalesce/nullif/greatest/least."""
    o = table(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.when(price > 300000, "high").when(price > 100000, "mid").otherwise("low").alias("band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_or_default"
        ),
        F.greatest(price, F.lit(150000.0)).alias("floor_150k"),
        F.least(price, F.lit(150000.0)).alias("cap_150k"),
    )


@register(
    "h13_cast",
    oracle="""
    SELECT n_nationkey,
           CAST(n_nationkey AS BIGINT) AS as_big,
           CAST(n_nationkey AS VARCHAR) AS as_str,
           CAST('42' AS INT) AS parsed_int,
           strftime(CAST('2024-03-15' AS DATE), '%Y-%m-%d') AS parsed_date,
           CAST(epoch_us(CAST('2024-03-15 12:30:00' AS TIMESTAMP)) AS BIGINT) AS parsed_ts_us
    FROM nation
    """,
)
def h13_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type conversions: widening, to-string, string parsing."""
    n = table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.col("n_nationkey").cast("long").alias("as_big"),
        F.col("n_nationkey").cast("string").alias("as_str"),
        F.lit("42").cast("int").alias("parsed_int"),
        F.date_format(F.lit("2024-03-15").cast("date"), "yyyy-MM-dd").alias("parsed_date"),
        ts_us(F.lit("2024-03-15 12:30:00").cast("timestamp")).alias("parsed_ts_us"),
    )


@register(
    "h14_array_basic",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           len(toks) AS n,
           len(list_distinct(toks)) AS n_distinct,
           list_contains(toks, 'data') AS has_data,
           array_to_string(toks[1:3], '|') AS first3,
           list_sort(toks)[1] AS smallest
    FROM t
    """,
    priority="P2",
)
def h14_array_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array construction/inspection over tokenized text. Array
    outputs are projected to scalars/joined strings for portable
    hashing."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.array_contains(toks, "data").alias("has_data"),
        F.array_join(F.slice(toks, 1, 3), "|").alias("first3"),
        F.get(F.array_sort(toks), 0).alias("smallest"),
    )


@register(
    "h15_array_explode",
    oracle="""
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS token,
           unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
    FROM documents
    """,
)
def h15_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: one row per token with its 1-based position (the
    zipped-unnest form in DuckDB)."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select("doc_id", F.posexplode(toks).alias("pos0", "token")).select(
        "doc_id", "token", (F.col("pos0") + 1).cast("long").alias("pos")
    )


@register(
    "h16_array_lambda",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS total_chars,
           CAST(len(list_filter(toks, x -> length(x) > 4)) AS BIGINT) AS n_long
    FROM t
    """,
    priority="P2",
)
def h16_array_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions: transform, filter, aggregate —
    per-row lambdas executed JVM-side (no Python)."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    total = F.aggregate(
        F.transform(toks, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return d.select(
        "doc_id",
        total.alias("total_chars"),
        F.size(F.filter(toks, lambda x: F.length(x) > 4)).cast("long").alias("n_long"),
    )


@register(
    "h17_map_struct",
    oracle="""
    SELECT c_custkey, c_name AS s_name, c_acctbal AS s_bal,
           c_mktsegment AS from_map
    FROM customer
    """,
    priority="P2",
)
def h17_map_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested construction and re-extraction: build a struct and a
    map from columns, then flatten back (the oracle is the identity
    projection — the test is that Spark's nested round-trip is
    lossless)."""
    c = table(spark, sf_dir, "customer")
    nested = c.select(
        "c_custkey",
        F.struct(F.col("c_name").alias("name"), F.col("c_acctbal").alias("bal")).alias("s"),
        F.create_map(F.lit("seg"), F.col("c_mktsegment")).alias("m"),
    )
    return nested.select(
        "c_custkey",
        F.col("s.name").alias("s_name"),
        F.col("s.bal").alias("s_bal"),
        F.element_at(F.col("m"), "seg").alias("from_map"),
    )


@register(
    "h18_json",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS INT) % 10 AS k_mod,
           count(*) AS n
    FROM events
    GROUP BY 1
    """,
)
def h18_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props string column, grouped
    on the extracted value."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return ev.groupBy(F.pmod(k, F.lit(10)).alias("k_mod")).agg(F.count("*").alias("n"))


@register(
    "h19_bitwise",
    oracle="""
    SELECT n_nationkey,
           CAST(n_nationkey << 2 AS BIGINT) AS shl,
           CAST(n_nationkey >> 1 AS BIGINT) AS shr,
           CAST(n_nationkey & 5 AS BIGINT) AS band,
           CAST(n_nationkey | 8 AS BIGINT) AS bor,
           CAST(xor(n_nationkey, 3) AS BIGINT) AS bxor,
           CAST(bit_count(n_nationkey) AS BIGINT) AS popcount
    FROM nation
    """,
    priority="P2",
)
def h19_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operators (shifts, and/or/xor, popcount) — the
    primitives behind the SimHash/fingerprint sketches, exposed as a
    scalar family."""
    n = table(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    return n.select(
        "n_nationkey",
        F.shiftleft(k, 2).cast("long").alias("shl"),
        F.shiftright(k, 1).cast("long").alias("shr"),
        k.bitwiseAND(F.lit(5)).cast("long").alias("band"),
        k.bitwiseOR(F.lit(8)).cast("long").alias("bor"),
        k.bitwiseXOR(F.lit(3)).cast("long").alias("bxor"),
        F.bit_count(k).cast("long").alias("popcount"),
    )


@register(
    "h20_text_distance",
    oracle="""
    SELECT p_partkey,
           CAST(levenshtein(p_name, p_brand) AS BIGINT) AS lev_name_brand,
           CAST(levenshtein(p_name, reverse(p_name)) AS BIGINT) AS lev_palindrome
    FROM part
    """,
    priority="P2",
)
def h20_text_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit distance (Levenshtein) — fuzzy string matching for
    record-linkage/dedup candidate verification on short fields
    (for long documents use the shingle-Jaccard path, l13)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.levenshtein(F.col("p_name"), F.col("p_brand")).cast("long").alias("lev_name_brand"),
        F.levenshtein(F.col("p_name"), F.reverse(F.col("p_name"))).cast("long").alias("lev_palindrome"),
    )


@register(
    "h21_url_parse",
    oracle="""
    WITH urls AS (
      SELECT doc_id,
             'https://site' || (doc_id % 20) || '.example.com/docs/' || lang
               || '/page?id=' || doc_id || '&ref=corpus' AS url,
             doc_id % 20 AS site, lang
      FROM documents)
    SELECT doc_id, url,
           'site' || site || '.example.com' AS host,
           '/docs/' || lang || '/page' AS path,
           'id=' || doc_id || '&ref=corpus' AS query,
           CAST(doc_id AS VARCHAR) AS id_param
    FROM urls
    """,
    priority="P2",
)
def h21_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing (`parse_url`): HOST / PATH / QUERY extraction plus
    a single query parameter — the log-analytics scalar family.
    URLs are built deterministically from doc fields, so the oracle
    states the expected parts directly (DuckDB has no parse_url);
    Spark's side must actually PARSE them back out."""
    d = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://site"),
        (F.col("doc_id") % 20).cast("string"),
        F.lit(".example.com/docs/"),
        F.col("lang"),
        F.lit("/page?id="),
        F.col("doc_id").cast("string"),
        F.lit("&ref=corpus"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        "url",
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY")).alias("query"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("id")).alias("id_param"),
    )


@register(
    "h22_hash_functions",
    oracle="""
    SELECT doc_id,
           md5(text) AS h_md5,
           sha256(text) AS h_sha256,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents
    """,
    priority="P2",
)
def h22_hash_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic content digests per document — the
    content-addressing primitive under exact dedup (l01), CAS-keyed
    storage layouts, and integrity manifests (the distcp -checksum
    analog, i08). md5 and SHA-256 are bit-portable across engines by
    definition (the ONLY portable content hashes — SURVEY §2 rule 6:
    xxhash64/crc32 exist in Spark but have no DuckDB twin, so
    cross-engine contracts must never key on them). Lowercase hex in
    both engines; pure projection fused into the scan, zero
    shuffles. The ASCII fixture makes byte-length = char-length;
    both digests hash UTF-8 bytes, so the contract holds for any
    text."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2("text", 256).alias("h_sha256"),
        # octet_length = UTF-8 BYTES (length() counts characters —
        # wrong for a byte-integrity manifest on non-ASCII text)
        F.octet_length("text").cast("long").alias("n_bytes"),
    )
