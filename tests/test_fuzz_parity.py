"""Differential query fuzzing (mini-SQLancer): generate seeded random
filter/group/aggregate queries in the ANSI subset BOTH engines parse
identically, run the SAME text on Spark SQL and DuckDB over the same
parquet, and require exact-normalized equality.

This hunts the parity bugs hand-written operators can't: random
predicate/group/agg combinations exercise corner interactions (null
handling, empty groups, constant folding, cast edges) far beyond the
curated registry. Determinism discipline mirrors the registry: double
sums go through the shared fixed-point FLOOR form; count/min/max are
exact by nature.
"""

from __future__ import annotations

import random

import pytest

from mysql_to_clickhouse_spark.verify import compare_frames, duckdb_connection
from tests.conftest import TEST_SF_DIR

N_QUERIES = 40
SEED = 20260814

# column model per table: (numeric cols, categorical cols, string col)
TABLES = {
    "events": {
        "num": ["value", "user_id", "event_id"],
        "cat": ["event_type", "user_id % 7"],
        "str": "event_type",
    },
    "lineitem": {
        "num": ["l_quantity", "l_extendedprice", "l_discount", "l_orderkey"],
        "cat": ["l_returnflag", "l_linestatus", "l_suppkey % 5"],
        "str": "l_returnflag",
    },
    "customer": {
        "num": ["c_acctbal", "c_custkey", "c_nationkey"],
        "cat": ["c_mktsegment", "c_nationkey % 4"],
        "str": "c_mktsegment",
    },
}

CMP = [">", ">=", "<", "<=", "=", "<>"]


def _gen_query(rng: random.Random) -> str:
    table = rng.choice(list(TABLES))
    spec = TABLES[table]

    preds = []
    for _ in range(rng.randint(0, 3)):
        c = rng.choice(spec["num"])
        op = rng.choice(CMP)
        if c in ("value", "c_acctbal", "l_extendedprice"):
            v = f"{rng.uniform(0, 500):.2f}"
        elif c == "l_discount":
            v = f"{rng.uniform(0, 0.1):.3f}"
        elif c == "l_quantity":
            v = f"{rng.uniform(1, 50):.1f}"
        else:
            v = str(rng.randint(0, 2000))
        preds.append(f"({c} {op} {v})")
    if rng.random() < 0.4:
        s = spec["str"]
        lit = rng.choice(
            ["view", "click", "purchase", "A", "N", "BUILDING", "AUTOMOBILE"]
        )
        preds.append(f"({s} {rng.choice(['=', '<>'])} '{lit}')")
    where = f"WHERE {' AND '.join(preds)}" if preds else ""

    n_keys = rng.randint(0, 2)
    keys = rng.sample(spec["cat"], n_keys) if n_keys else []
    key_aliases = [f"k{i}" for i in range(len(keys))]
    key_select = [
        f"CAST({k} AS STRING) AS {a}" for k, a in zip(keys, key_aliases)
    ]

    mcol = rng.choice(spec["num"])
    aggs = [
        "CAST(COUNT(*) AS BIGINT) AS n",
        f"CAST(MIN({mcol}) AS DOUBLE) AS mn",
        f"CAST(MAX({mcol}) AS DOUBLE) AS mx",
        # the shared fixed-point sum (engine-portable, order-exact)
        f"CAST(SUM(CAST(FLOOR(CAST({mcol} AS DOUBLE) * 10000.0) AS BIGINT))"
        f" AS DOUBLE) / 10000.0 AS fsum",
    ]
    if rng.random() < 0.5:
        dcol = rng.choice(spec["num"])
        aggs.append(f"CAST(COUNT(DISTINCT {dcol}) AS BIGINT) AS nd")

    select = ", ".join(key_select + aggs)
    group = f"GROUP BY {', '.join(key_aliases)}" if keys else ""
    return f"SELECT {select} FROM {table} {where} {group}"


# ---------------------------------------------------------------------------
# Correlated-subquery axis: EXISTS / NOT EXISTS / IN / NOT IN / scalar
# subqueries — the decorrelation paths (Spark RewriteCorrelatedScalarSubquery,
# RewritePredicateSubquery) the curated s3/s5/s6/x9/x13 queries exercise only
# at fixed shapes. Both engines parse the identical ANSI text; random
# thresholds + shapes hunt null-semantics and empty-group corner cases.
# ---------------------------------------------------------------------------

N_SUBQ_QUERIES = 30
SUBQ_SEED = 20260814 + 7_000_000

# (outer, oalias, inner, ialias, fk=pk corr, outer pk, outer IN-key,
#  inner IN-key, outer numeric, inner numeric cols)
SUBQ_SHAPES = [
    ("customer", "c", "orders", "o", "o.o_custkey = c.c_custkey",
     "c_custkey", "c_custkey", "o_custkey", "c_acctbal",
     [("o_totalprice", 1000.0, 250000.0)]),
    ("orders", "o", "lineitem", "l", "l.l_orderkey = o.o_orderkey",
     "o_orderkey", "o_orderkey", "l_orderkey", "o_totalprice",
     [("l_quantity", 1.0, 50.0), ("l_extendedprice", 1000.0, 80000.0)]),
    ("supplier", "s", "lineitem", "l", "l.l_suppkey = s.s_suppkey",
     "s_suppkey", "s_suppkey", "l_suppkey", "s_acctbal",
     [("l_quantity", 1.0, 50.0)]),
    ("nation", "n", "customer", "c2", "c2.c_nationkey = n.n_nationkey",
     "n_nationkey", "n_nationkey", "c_nationkey", "n_nationkey",
     [("c_acctbal", -500.0, 8000.0)]),
]

SUBQ_TABLES = ("customer", "orders", "lineitem", "supplier", "nation")


def _gen_subquery_case(rng: random.Random) -> str:
    (outer, oa, inner, ia, corr, pk, in_pk, in_fk, num, inner_nums) = (
        rng.choice(SUBQ_SHAPES)
    )
    icol, lo, hi = rng.choice(inner_nums)
    thresh = f"{rng.uniform(lo, hi):.2f}"
    cmp_op = rng.choice([">", ">=", "<", "<="])
    ipred = f"{ia}.{icol} {cmp_op} {thresh}"

    form = rng.randrange(6)
    if form == 0:
        where = (
            f"EXISTS (SELECT 1 FROM {inner} {ia} WHERE {corr} AND {ipred})"
        )
    elif form == 1:
        where = (
            f"NOT EXISTS (SELECT 1 FROM {inner} {ia} "
            f"WHERE {corr} AND {ipred})"
        )
    elif form == 2:
        # uncorrelated IN (fk keys are non-null in every fixture table,
        # so IN/NOT IN null traps cannot mask a divergence silently)
        where = (
            f"{oa}.{in_pk} IN (SELECT {ia}.{in_fk} FROM {inner} {ia} "
            f"WHERE {ipred})"
        )
    elif form == 3:
        where = (
            f"{oa}.{in_pk} NOT IN (SELECT {ia}.{in_fk} FROM {inner} {ia} "
            f"WHERE {ipred})"
        )
    elif form == 4:
        n = rng.randint(1, 8)
        op = rng.choice([">=", "<", "="])
        where = (
            f"(SELECT CAST(COUNT(*) AS BIGINT) FROM {inner} {ia} "
            f"WHERE {corr} AND {ipred}) {op} {n}"
        )
    else:
        # correlated scalar MIN/MAX vs an outer column: empty inner
        # group -> NULL scalar -> NULL comparison -> row filtered, the
        # exact semantics corner this form exists to pin on both engines
        agg = rng.choice(["MIN", "MAX"])
        where = (
            f"CAST({oa}.{num} AS DOUBLE) > (SELECT {agg}(CAST({ia}.{icol} "
            f"AS DOUBLE)) FROM {inner} {ia} WHERE {corr})"
        )

    if rng.random() < 0.4:
        return (
            f"SELECT CAST(COUNT(*) AS BIGINT) AS n, "
            f"CAST(MIN({oa}.{pk}) AS BIGINT) AS mn, "
            f"CAST(MAX({oa}.{pk}) AS BIGINT) AS mx, "
            f"CAST(SUM(CAST(FLOOR(CAST({oa}.{num} AS DOUBLE) * 10000.0) "
            f"AS BIGINT)) AS DOUBLE) / 10000.0 AS fsum "
            f"FROM {outer} {oa} WHERE {where}"
        )
    return (
        f"SELECT {oa}.{pk} AS k, CAST({oa}.{num} AS DOUBLE) AS v "
        f"FROM {outer} {oa} WHERE {where}"
    )


@pytest.fixture(scope="module")
def duck():
    con = duckdb_connection(TEST_SF_DIR)
    yield con
    con.close()


@pytest.fixture(scope="module", autouse=True)
def _views(spark):
    from mysql_to_clickhouse_spark.tables import load

    for name in set(TABLES) | set(SUBQ_TABLES):
        load(spark, TEST_SF_DIR, name).createOrReplaceTempView(name)


@pytest.mark.parametrize("i", range(N_QUERIES))
def test_random_query_parity(spark, duck, i):
    rng = random.Random(SEED + i)
    sql = _gen_query(rng)
    spark_pdf = spark.sql(sql).toPandas()
    duck_pdf = duck.sql(sql).df()
    res = compare_frames(spark_pdf, duck_pdf)
    assert res.ok, f"divergence on:\n{sql}\n{res.detail}"


# ---------------------------------------------------------------------------
# join + HAVING fuzz: random star-fragment joins in the shared subset
# ---------------------------------------------------------------------------

JOINS = [
    ("customer", "orders", "c_custkey = o_custkey",
     ["c_mktsegment", "c_nationkey % 4"],
     ["o_totalprice", "c_acctbal", "o_orderkey"]),
    ("orders", "lineitem", "o_orderkey = l_orderkey",
     ["o_orderpriority", "l_returnflag"],
     ["l_extendedprice", "l_quantity", "o_totalprice"]),
    ("nation", "customer", "n_nationkey = c_nationkey",
     ["n_name", "c_mktsegment"],
     ["c_acctbal", "c_custkey"]),
]

N_JOIN_QUERIES = 20


def _gen_join_query(rng: random.Random) -> str:
    left, right, cond, cats, nums = rng.choice(JOINS)
    jtype = rng.choice(["JOIN", "LEFT JOIN"])

    preds = []
    for _ in range(rng.randint(0, 2)):
        c = rng.choice(nums)
        v = f"{rng.uniform(0, 100000):.2f}" if c != "l_quantity" else str(
            rng.randint(1, 50)
        )
        preds.append(f"({c} {rng.choice(CMP)} {v})")
    where = f"WHERE {' AND '.join(preds)}" if preds else ""

    key = rng.choice(cats)
    mcol = rng.choice(nums)
    having = (
        f"HAVING COUNT(*) {rng.choice(['>', '>='])} {rng.randint(0, 20)}"
        if rng.random() < 0.5
        else ""
    )
    return (
        f"SELECT CAST({key} AS STRING) AS k, CAST(COUNT(*) AS BIGINT) AS n, "
        f"CAST(MIN({mcol}) AS DOUBLE) AS mn, "
        f"CAST(SUM(CAST(FLOOR(CAST({mcol} AS DOUBLE) * 10000.0) AS BIGINT))"
        f" AS DOUBLE) / 10000.0 AS fsum "
        f"FROM {left} {jtype} {right} ON {cond} {where} "
        f"GROUP BY k {having}"
    )


@pytest.fixture(scope="module", autouse=True)
def _join_views(spark):
    from mysql_to_clickhouse_spark.tables import load

    for name in ("nation", "customer", "orders", "lineitem"):
        load(spark, TEST_SF_DIR, name).createOrReplaceTempView(name)


@pytest.mark.parametrize("i", range(N_JOIN_QUERIES))
def test_random_join_parity(spark, duck, i):
    rng = random.Random(SEED * 7 + i)
    sql = _gen_join_query(rng)
    spark_pdf = spark.sql(sql).toPandas()
    duck_pdf = duck.sql(sql).df()
    res = compare_frames(spark_pdf, duck_pdf)
    assert res.ok, f"divergence on:\n{sql}\n{res.detail}"


# ---------------------------------------------------------------------------
# window-function fuzz: ranking/offset/frame shapes over a total order
# ---------------------------------------------------------------------------

N_WINDOW_QUERIES = 15

WTABLES = {
    "events": ("user_id", "event_id", ["value", "event_id"], "event_type"),
    "orders": ("o_custkey", "o_orderkey", ["o_totalprice"], "o_orderpriority"),
    "customer": ("c_nationkey", "c_custkey", ["c_acctbal"], "c_mktsegment"),
}


def _gen_window_query(rng: random.Random) -> str:
    table = rng.choice(list(WTABLES))
    part, pk, nums, cat = WTABLES[table]
    mcol = rng.choice(nums)
    direction = rng.choice(["ASC", "DESC"])
    # every ORDER BY ends in the PK: total order -> deterministic
    order = f"{mcol} {direction}, {pk} ASC"
    fn = rng.choice(
        [
            "CAST(ROW_NUMBER() OVER w AS BIGINT)",
            "CAST(RANK() OVER w AS BIGINT)",
            "CAST(DENSE_RANK() OVER w AS BIGINT)",
            f"CAST(LAG({pk}) OVER w AS BIGINT)",
            f"CAST(LEAD({pk}) OVER w AS BIGINT)",
            # running fixed-point sum over an exact frame
            f"CAST(SUM(CAST(FLOOR(CAST({mcol} AS DOUBLE) * 100.0) AS BIGINT))"
            f" OVER (PARTITION BY {part} ORDER BY {order}"
            f" ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)",
            f"CAST(NTILE({rng.randint(2, 5)}) OVER w AS BIGINT)",
        ]
    )
    keep = rng.randint(1, 4)
    return (
        f"SELECT * FROM ("
        f"SELECT CAST({pk} AS BIGINT) AS pk, CAST({cat} AS STRING) AS c, "
        f"{fn} AS wv, "
        f"CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn "
        f"FROM {table} "
        f"WINDOW w AS (PARTITION BY {part} ORDER BY {order})"
        f") WHERE rn <= {keep}"
    )


@pytest.mark.parametrize("i", range(N_WINDOW_QUERIES))
def test_random_window_parity(spark, duck, i):
    rng = random.Random(SEED * 13 + i)
    sql = _gen_window_query(rng)
    spark_pdf = spark.sql(sql).toPandas()
    duck_pdf = duck.sql(sql).df()
    res = compare_frames(spark_pdf, duck_pdf)
    assert res.ok, f"divergence on:\n{sql}\n{res.detail}"


# ---------------------------------------------------------------------------
# date/calendar fuzz — truncations + parts over events.ts / o_orderdate
# ---------------------------------------------------------------------------

N_DATE_QUERIES = 12


def _gen_date_query(rng: random.Random) -> str:
    table, ts = rng.choice(
        [("events", "CAST(ts AS TIMESTAMP)"), ("orders", "o_orderdate")]
    )
    grain = rng.choice(["hour", "day", "month", "year"])
    part = rng.choice(["year", "month", "day", "hour"])
    return (
        f"SELECT CAST(date_trunc('{grain}', {ts}) AS TIMESTAMP) AS g, "
        f"CAST(EXTRACT({part} FROM {ts}) AS BIGINT) AS p, "
        f"CAST(COUNT(*) AS BIGINT) AS n "
        f"FROM {table} GROUP BY g, p"
    )


@pytest.mark.parametrize("i", range(N_DATE_QUERIES))
def test_random_date_parity(spark, duck, i):
    rng = random.Random(SEED * 31 + i)
    sql = _gen_date_query(rng)
    spark_pdf = spark.sql(sql).toPandas()
    duck_pdf = duck.sql(sql).df()
    res = compare_frames(spark_pdf, duck_pdf)
    assert res.ok, f"divergence on:\n{sql}\n{res.detail}"


# ---------------------------------------------------------------------------
# set-operation fuzz — UNION / INTERSECT / EXCEPT with ALL variants
# ---------------------------------------------------------------------------

N_SETOP_QUERIES = 10


def _gen_setop_query(rng: random.Random) -> str:
    op = rng.choice(
        ["UNION", "UNION ALL", "INTERSECT", "EXCEPT"]
    )
    lo1, hi1 = sorted((rng.randint(0, 1500), rng.randint(0, 1500)))
    lo2, hi2 = sorted((rng.randint(0, 1500), rng.randint(0, 1500)))
    return (
        f"SELECT CAST(c_custkey AS BIGINT) AS k, c_mktsegment AS s "
        f"FROM customer WHERE c_custkey BETWEEN {lo1} AND {hi1} "
        f"{op} "
        f"SELECT CAST(c_custkey AS BIGINT) AS k, c_mktsegment AS s "
        f"FROM customer WHERE c_custkey BETWEEN {lo2} AND {hi2}"
    )


@pytest.mark.parametrize("i", range(N_SETOP_QUERIES))
def test_random_setop_parity(spark, duck, i):
    rng = random.Random(SEED * 53 + i)
    sql = _gen_setop_query(rng)
    spark_pdf = spark.sql(sql).toPandas()
    duck_pdf = duck.sql(sql).df()
    res = compare_frames(spark_pdf, duck_pdf)
    assert res.ok, f"divergence on:\n{sql}\n{res.detail}"


# ---------------------------------------------------------------------------
# string-function fuzz — upper/substr/replace/length/trim shared subset
# ---------------------------------------------------------------------------

N_STRING_QUERIES = 12


def _gen_string_query(rng: random.Random) -> str:
    col, table = rng.choice(
        [("c_mktsegment", "customer"), ("o_orderpriority", "orders"),
         ("event_type", "events"), ("l_returnflag", "lineitem")]
    )
    start = rng.randint(1, 4)
    ln = rng.randint(1, 6)
    needle = rng.choice(["A", "E", "I", "L", "U", "R"])
    exprs = [
        f"upper({col}) AS e1",
        f"lower({col}) AS e2",
        f"substring({col}, {start}, {ln}) AS e3",
        f"replace({col}, '{needle}', '_') AS e4",
        f"CAST(length({col}) AS BIGINT) AS e5",
        f"concat_ws('|', {col}, reverse({col})) AS e6",
        f"trim(concat_ws('', '  ', {col}, ' ')) AS e7",
        f"CAST(instr({col}, '{needle}') AS BIGINT) AS e8",
    ]
    picked = rng.sample(exprs, rng.randint(3, 6))
    return (
        f"SELECT {', '.join(sorted(picked))}, CAST(COUNT(*) AS BIGINT) AS n "
        f"FROM {table} GROUP BY {', '.join(sorted(e.rsplit(' AS ', 1)[1] for e in picked))}"
    )


@pytest.mark.parametrize("i", range(N_STRING_QUERIES))
def test_random_string_parity(spark, duck, i):
    rng = random.Random(SEED * 97 + i)
    sql = _gen_string_query(rng)
    spark_pdf = spark.sql(sql).toPandas()
    duck_pdf = duck.sql(sql).df()
    res = compare_frames(spark_pdf, duck_pdf)
    assert res.ok, f"divergence on:\n{sql}\n{res.detail}"


# ---------------------------------------------------------------------------
# nested-aggregation fuzz: aggregate OVER an aggregate (two GROUP BY
# levels) — hunts second-level type promotion (BIGINT sums re-summed),
# empty-inner-group propagation, and between-level filter semantics.
# ---------------------------------------------------------------------------

N_NESTED_QUERIES = 15


def _gen_nested_query(rng: random.Random) -> str:
    table = rng.choice(list(TABLES))
    spec = TABLES[table]
    k1, k2 = rng.sample(spec["cat"], 2) if len(spec["cat"]) >= 2 else (
        spec["cat"][0], spec["cat"][0]
    )
    mcol = rng.choice(spec["num"])
    pred = ""
    if rng.random() < 0.5:
        c = rng.choice(spec["num"])
        v = f"{rng.uniform(0, 1000):.2f}"
        pred = f"WHERE CAST({c} AS DOUBLE) {rng.choice(CMP)} {v}"
    inner = (
        f"SELECT CAST({k1} AS STRING) AS g1, CAST({k2} AS STRING) AS g2, "
        f"CAST(COUNT(*) AS BIGINT) AS n, "
        f"CAST(SUM(CAST(FLOOR(CAST({mcol} AS DOUBLE) * 10000.0) AS BIGINT))"
        f" AS DOUBLE) / 10000.0 AS fsum "
        f"FROM {table} {pred} GROUP BY g1, g2"
    )
    between = ""
    if rng.random() < 0.5:
        between = f"WHERE n >= {rng.randint(1, 5)}"
    outer_aggs = [
        "CAST(COUNT(*) AS BIGINT) AS n_groups",
        "CAST(MIN(n) AS BIGINT) AS min_n",
        "CAST(MAX(n) AS BIGINT) AS max_n",
        # re-fold the already-fixed-point fsum through the same FLOOR form
        "CAST(SUM(CAST(FLOOR(fsum * 10000.0) AS BIGINT)) AS DOUBLE)"
        " / 10000.0 AS total",
        "CAST(MAX(fsum) AS DOUBLE) AS biggest",
    ]
    if rng.random() < 0.5:
        return (
            f"SELECT g1, {', '.join(outer_aggs)} "
            f"FROM ({inner}) t {between} GROUP BY g1"
        )
    return f"SELECT {', '.join(outer_aggs)} FROM ({inner}) t {between}"


@pytest.mark.parametrize("i", range(N_NESTED_QUERIES))
def test_random_nested_agg_parity(spark, duck, i):
    rng = random.Random(SEED * 131 + i)
    sql = _gen_nested_query(rng)
    spark_pdf = spark.sql(sql).toPandas()
    duck_pdf = duck.sql(sql).df()
    res = compare_frames(spark_pdf, duck_pdf)
    assert res.ok, f"divergence on:\n{sql}\n{res.detail}"


# ---------------------------------------------------------------------------
# outer-join fuzz: FULL/LEFT joins where unmatched-side NULLs flow into
# aggregates and COALESCE — the three-valued-logic corner the inner-join
# axis never reaches.
# ---------------------------------------------------------------------------

N_OUTER_QUERIES = 10

OUTER_JOINS = [
    ("customer", "orders", "c_custkey = o_custkey",
     "c_mktsegment", "o_totalprice", "c_acctbal"),
    ("nation", "customer", "n_nationkey = c_nationkey",
     "n_name", "c_acctbal", "n_regionkey"),
]


def _gen_outer_query(rng: random.Random) -> str:
    left, right, cond, cat, rnum, lnum = rng.choice(OUTER_JOINS)
    jtype = rng.choice(["FULL JOIN", "LEFT JOIN"])
    # a selective right-side filter manufactures unmatched left rows
    sel = f"{rnum} < {rng.uniform(0, 50000):.2f}"
    return (
        f"SELECT COALESCE(CAST({cat} AS STRING), '<none>') AS k, "
        f"CAST(COUNT(*) AS BIGINT) AS n_rows, "
        f"CAST(COUNT({rnum}) AS BIGINT) AS n_matched, "
        f"CAST(SUM(CASE WHEN {rnum} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n_unmatched, "
        f"CAST(MIN(COALESCE({rnum}, -1.0)) AS DOUBLE) AS mn "
        f"FROM {left} {jtype} (SELECT * FROM {right} WHERE {sel}) r "
        f"ON {cond} GROUP BY k"
    )


@pytest.mark.parametrize("i", range(N_OUTER_QUERIES))
def test_random_outer_join_parity(spark, duck, i):
    rng = random.Random(SEED * 173 + i)
    sql = _gen_outer_query(rng)
    spark_pdf = spark.sql(sql).toPandas()
    duck_pdf = duck.sql(sql).df()
    res = compare_frames(spark_pdf, duck_pdf)
    assert res.ok, f"divergence on:\n{sql}\n{res.detail}"


@pytest.mark.parametrize("i", range(N_SUBQ_QUERIES))
def test_subquery_parity(spark, duck, i):
    rng = random.Random(SUBQ_SEED + i)
    sql = _gen_subquery_case(rng)
    spark_pdf = spark.sql(sql).toPandas()
    duck_pdf = duck.sql(sql).df()
    res = compare_frames(spark_pdf, duck_pdf)
    assert res.ok, f"divergence on:\n{sql}\n{res.detail}"


# ---------------------------------------------------------------------------
# grouping-sets fuzz: ROLLUP / CUBE / GROUPING SETS + GROUPING() markers —
# the multi-grouping lattice (subtotal NULLs vs natural NULLs, duplicate
# sets, empty grand-total set) that the curated d9/d10/s4 shapes fix in
# place but never randomize.
# ---------------------------------------------------------------------------

N_GROUPING_QUERIES = 15

GROUPING_TABLES = [
    ("orders", ["o_orderpriority", "o_orderstatus"], "o_totalprice"),
    ("lineitem", ["l_returnflag", "l_linestatus", "l_suppkey % 7"], "l_quantity"),
    ("customer", ["c_mktsegment", "c_nationkey"], "c_acctbal"),
    ("events", ["event_type", "user_id % 5"], "value"),
]


def _gen_grouping_query(rng: random.Random) -> str:
    # GROUPING() cannot take a select alias (Spark resolves it against
    # the grouping expressions only), so the SAME CAST(expr AS STRING)
    # text appears in the projection, the lattice, and the markers.
    table, cats, num = rng.choice(GROUPING_TABLES)
    keys = rng.sample(cats, rng.randint(2, min(3, len(cats))))
    exprs = [f"CAST({k} AS STRING)" for k in keys]
    form = rng.randrange(3)
    if form == 0:
        grouping = f"ROLLUP({', '.join(exprs)})"
    elif form == 1:
        grouping = f"CUBE({', '.join(exprs)})"
    else:
        # random subset lattice, always including the grand total
        pool = [f"({', '.join(s)})" for s in
                [exprs, exprs[:1], exprs[1:], []]]
        sets = rng.sample(pool, rng.randint(2, len(pool)))
        if "()" not in sets:
            sets.append("()")
        grouping = f"GROUPING SETS ({', '.join(sets)})"
    sel_keys = ", ".join(f"{e} AS k{i}" for i, e in enumerate(exprs))
    markers = ", ".join(
        f"CAST(GROUPING({e}) AS BIGINT) AS g{i}"
        for i, e in enumerate(exprs)
    )
    return (
        f"SELECT {sel_keys}, {markers}, "
        f"CAST(COUNT(*) AS BIGINT) AS n, "
        f"CAST(SUM(CAST(FLOOR({num} * 100.0) AS BIGINT)) AS BIGINT) AS s_fp "
        f"FROM {table} GROUP BY {grouping}"
    )


@pytest.mark.parametrize("i", range(N_GROUPING_QUERIES))
def test_random_grouping_sets_parity(spark, duck, i):
    rng = random.Random(SEED * 211 + i)
    sql = _gen_grouping_query(rng)
    spark_pdf = spark.sql(sql).toPandas()
    duck_pdf = duck.sql(sql).df()
    res = compare_frames(spark_pdf, duck_pdf)
    assert res.ok, f"divergence on:\n{sql}\n{res.detail}"


# ---------------------------------------------------------------------------
# window-frame fuzz: bounded ROWS frames, RANGE frames (peer-inclusive),
# FIRST_VALUE/LAST_VALUE over explicit frames — the frame-boundary
# arithmetic the rank/lag axis above never touches.
# ---------------------------------------------------------------------------

N_FRAME_QUERIES = 12


def _gen_frame_query(rng: random.Random) -> str:
    table = rng.choice(list(WTABLES))
    part, pk, nums, cat = WTABLES[table]
    mcol = rng.choice(nums)
    fsum = (
        f"CAST(FLOOR(CAST({mcol} AS DOUBLE) * 100.0) AS BIGINT)"
    )
    form = rng.randrange(3)
    if form == 0:
        # bounded ROWS frame over a total order (pk tiebreak)
        j, k = rng.randint(0, 4), rng.randint(0, 4)
        frame = (
            f"PARTITION BY {part} ORDER BY {mcol} {rng.choice(['ASC','DESC'])},"
            f" {pk} ROWS BETWEEN {j} PRECEDING AND {k} FOLLOWING"
        )
        wv = f"CAST(SUM({fsum}) OVER ({frame}) AS BIGINT)"
        wv2 = f"CAST(COUNT(*) OVER ({frame}) AS BIGINT)"
    elif form == 1:
        # RANGE frame on an integer key — peer rows enter together, so
        # sum/count are deterministic even under order-key ties
        span = rng.randint(1, 500)
        frame = (
            f"PARTITION BY {part} ORDER BY CAST({pk} AS BIGINT) "
            f"RANGE BETWEEN {span} PRECEDING AND CURRENT ROW"
        )
        wv = f"CAST(SUM({fsum}) OVER ({frame}) AS BIGINT)"
        wv2 = f"CAST(COUNT(*) OVER ({frame}) AS BIGINT)"
    else:
        # FIRST/LAST_VALUE need the total order: ROWS frame + pk tiebreak
        j = rng.randint(1, 5)
        frame = (
            f"PARTITION BY {part} ORDER BY {mcol}, {pk} "
            f"ROWS BETWEEN {j} PRECEDING AND CURRENT ROW"
        )
        wv = f"CAST(FIRST_VALUE({pk}) OVER ({frame}) AS BIGINT)"
        wv2 = f"CAST(LAST_VALUE({pk}) OVER ({frame}) AS BIGINT)"
    return (
        f"SELECT CAST({pk} AS BIGINT) AS pk, CAST({cat} AS STRING) AS c, "
        f"{wv} AS wv, {wv2} AS wv2 FROM {table}"
    )


@pytest.mark.parametrize("i", range(N_FRAME_QUERIES))
def test_random_window_frame_parity(spark, duck, i):
    rng = random.Random(SEED * 307 + i)
    sql = _gen_frame_query(rng)
    spark_pdf = spark.sql(sql).toPandas()
    duck_pdf = duck.sql(sql).df()
    res = compare_frames(spark_pdf, duck_pdf)
    assert res.ok, f"divergence on:\n{sql}\n{res.detail}"


# ---------------------------------------------------------------------------
# conditional-aggregate fuzz: FILTER (WHERE ...) vs CASE-in-agg — the
# NULL-vs-0 semantics of empty condition sets (COUNT FILTER -> 0,
# MIN/MAX FILTER -> NULL, SUM CASE -> 0 but SUM FILTER -> NULL) is a
# classic cross-engine divergence spot; both engines parse the clause
# ---------------------------------------------------------------------------

N_CONDAGG_QUERIES = 18


def _num_literal(rng: random.Random, c: str) -> str:
    if c in ("value", "c_acctbal", "l_extendedprice"):
        return f"{rng.uniform(0, 500):.2f}"
    if c == "l_discount":
        return f"{rng.uniform(0, 0.1):.3f}"
    if c == "l_quantity":
        return f"{rng.uniform(1, 50):.1f}"
    return str(rng.randint(0, 2000))


def _gen_condagg_query(rng: random.Random) -> str:
    table = rng.choice(list(TABLES))
    spec = TABLES[table]
    ccol = rng.choice(spec["num"])
    cond = f"{ccol} {rng.choice(CMP)} {_num_literal(rng, ccol)}"
    # sometimes make the condition near-impossible so some groups have
    # an EMPTY matching set — the corner this axis exists to pin
    if rng.random() < 0.35:
        cond = f"{ccol} > 1e12"
    mcol = rng.choice(spec["num"])
    fsum = (
        f"SUM(CAST(FLOOR(CAST({mcol} AS DOUBLE) * 10000.0) AS BIGINT))"
        f" FILTER (WHERE {cond})"
    )
    aggs = [
        f"CAST(COUNT(*) FILTER (WHERE {cond}) AS BIGINT) AS nf",
        f"CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT) AS ncase",
        f"CAST(MIN({mcol}) FILTER (WHERE {cond}) AS DOUBLE) AS mnf",
        f"CAST(MAX(CASE WHEN {cond} THEN {mcol} END) AS DOUBLE) AS mxc",
        f"CAST({fsum} AS DOUBLE) / 10000.0 AS fsumf",
        f"CAST(COUNT(DISTINCT CASE WHEN {cond} THEN {mcol} END) "
        "AS BIGINT) AS ndc",
    ]
    n_keys = rng.randint(0, 2)
    keys = rng.sample(spec["cat"], n_keys) if n_keys else []
    key_aliases = [f"k{i}" for i in range(len(keys))]
    key_select = [
        f"CAST({k} AS STRING) AS {a}" for k, a in zip(keys, key_aliases)
    ]
    group = f"GROUP BY {', '.join(key_aliases)}" if keys else ""
    having = ""
    if keys and rng.random() < 0.4:
        having = f"HAVING COUNT(*) > {rng.randint(0, 50)}"
    select = ", ".join(key_select + aggs)
    return f"SELECT {select} FROM {table} {group} {having}"


@pytest.mark.parametrize("i", range(N_CONDAGG_QUERIES))
def test_random_condagg_parity(spark, duck, i):
    rng = random.Random(SEED * 401 + i)
    sql = _gen_condagg_query(rng)
    spark_pdf = spark.sql(sql).toPandas()
    duck_pdf = duck.sql(sql).df()
    res = compare_frames(spark_pdf, duck_pdf)
    assert res.ok, f"divergence on:\n{sql}\n{res.detail}"


# ---------------------------------------------------------------------------
# CH-dialect fuzz: seeded CH-named-function queries through the dialect
# layer (functions/chdialect.py) vs hand-restated DuckDB semantics.
# Unlike the other axes this one CANNOT share text — the entire point is
# the name-resolution/rewrite surface, so the generator emits the pair
# (ClickHouse text, DuckDB restatement) in lockstep.
# ---------------------------------------------------------------------------

N_CH_QUERIES = 100

_CH_KEYS = [
    # (CH expr for Spark, DuckDB restatement)
    (
        "toYYYYMMDD(ts)",
        "CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS INT)",
    ),
    ("toDayOfWeek(ts)", "CAST(isodow(CAST(ts AS TIMESTAMP)) AS INT)"),
    ("toHour(ts)", "CAST(hour(CAST(ts AS TIMESTAMP)) AS INT)"),
    (
        "toInt32(JSONExtractInt(props, 'k') % 10)",
        "CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS INT)",
    ),
    ("toInt32(user_id % 13)", "CAST(user_id % 13 AS INT)"),
    # tranche 3: literal %-format translation and Sunday-start weeks
    (
        "formatDateTime(ts, '%Y-%m')",
        "strftime(CAST(ts AS TIMESTAMP), '%Y-%m')",
    ),
    (
        # DuckDB dayofweek: Sunday=0 — subtracting it lands on Sunday,
        # matching CH's default mode-0 week start. Surfaced as a string:
        # DATE columns come back as different pandas dtypes per engine.
        "toString(toStartOfWeek(ts))",
        "CAST(CAST(ts AS DATE) - "
        "CAST(dayofweek(CAST(ts AS TIMESTAMP)) AS INT) AS VARCHAR)",
    ),
]

_CH_FP = "CAST(FLOOR(value * 10000.0) AS BIGINT)"


def _ch_cond(rng: random.Random) -> tuple[str, str]:
    r = rng.random()
    if r < 0.3:
        t = rng.choice(["view", "click", "purchase", "error", "signup"])
        return (f"event_type = '{t}'",) * 2
    if r < 0.55:
        v = f"{rng.uniform(0, 400):.2f}"
        return (f"value > {v}",) * 2
    if r < 0.8:
        k, j = rng.randint(2, 9), rng.randint(0, 1)
        return (f"user_id % {k} = {j}",) * 2
    v = rng.randint(10, 90)
    return (
        f"JSONExtractInt(props, 'k') > {v}",
        f"CAST(json_extract_string(props, '$.k') AS BIGINT) > {v}",
    )


def _gen_ch_query(rng: random.Random) -> tuple[str, str]:
    ch_aggs: list[str] = []
    dk_aggs: list[str] = []

    def add(ch: str, dk: str, alias: str) -> None:
        ch_aggs.append(f"{ch} AS {alias}")
        dk_aggs.append(f"{dk} AS {alias}")

    for idx, which in enumerate(rng.sample(range(14), rng.randint(2, 4))):
        a = f"a{idx}"
        c_ch, c_dk = _ch_cond(rng)
        if which == 0:
            add(
                f"countIf({c_ch})",
                f"CAST(COUNT(*) FILTER (WHERE {c_dk}) AS BIGINT)",
                a,
            )
        elif which == 1:
            add(
                f"countIf(user_id, {c_ch})",
                f"CAST(COUNT(user_id) FILTER (WHERE {c_dk}) AS BIGINT)",
                a,
            )
        elif which == 2:
            add(
                f"COALESCE(sumIf({_CH_FP}, {c_ch}), 0)",
                f"CAST(COALESCE(SUM({_CH_FP}) FILTER (WHERE {c_dk}), 0)"
                " AS BIGINT)",
                a,
            )
        elif which == 3:
            add(
                f"COALESCE(minIf(event_id, {c_ch}), -1)",
                f"CAST(COALESCE(MIN(event_id) FILTER (WHERE {c_dk}), -1)"
                " AS BIGINT)",
                a,
            )
        elif which == 4:
            add(
                "uniqExact(user_id)",
                "CAST(COUNT(DISTINCT user_id) AS BIGINT)",
                a,
            )
        elif which == 5:
            fn = rng.choice(["argMax", "argMin"])
            dk = {"argMax": "arg_max", "argMin": "arg_min"}[fn]
            # event_id is unique -> deterministic pick on both engines
            add(f"{fn}(user_id, event_id)", f"{dk}(user_id, event_id)", a)
        elif which == 6:
            p = rng.choice(["0.25", "0.5", "0.75", "0.9"])
            add(
                f"quantileExact({p})({_CH_FP})",
                f"quantile_cont({_CH_FP}, {p})",
                a,
            )
        elif which == 7:
            # avg over fixed-point bigints: exact integer sum (< 2^52)
            # then one correctly-rounded division on both engines
            add(
                f"COALESCE(avgIf({_CH_FP}, {c_ch}), 0.0)",
                f"COALESCE(AVG({_CH_FP}) FILTER (WHERE {c_dk}), 0.0)",
                a,
            )
        elif which == 8:
            # tranche 2: exact conditional distinct
            add(
                f"uniqExactIf(user_id, {c_ch})",
                f"CAST(COUNT(DISTINCT CASE WHEN {c_dk} THEN user_id END)"
                " AS BIGINT)",
                a,
            )
        elif which == 9:
            # tranche 2: exact interpolated median over small ints —
            # both engines interpolate (a+b)/2, exact in double
            k = rng.randint(100, 1000)
            add(
                f"CAST(medianExact(toInt64(user_id % {k})) AS DOUBLE)",
                f"CAST(quantile_cont(CAST(user_id % {k} AS BIGINT), 0.5)"
                " AS DOUBLE)",
                a,
            )
        elif which == 10:
            # tranche 2: higher-order lambda (CH lambda-first arg swap)
            # over the digit runs in props; plain length() resolves as
            # a builtin on both engines
            m = rng.randint(1, 2)
            add(
                f"COALESCE(sumIf(toInt64(arrayCount("
                f"x -> length(x) > {m}, extractAll(props, '[0-9]+'))), "
                f"{c_ch}), 0)",
                f"CAST(COALESCE(SUM(CAST(len(list_filter("
                f"regexp_extract_all(props, '[0-9]+'), "
                f"x -> length(x) > {m})) AS BIGINT)) "
                f"FILTER (WHERE {c_dk}), 0) AS BIGINT)",
                a,
            )
        elif which == 11:
            # tranche 3: CH dateDiff counts unit boundaries — DuckDB's
            # date_diff has the same boundary semantics
            add(
                f"COALESCE(sumIf(toInt64(dateDiff('day', "
                f"toStartOfMonth(ts), ts)), {c_ch}), 0)",
                f"CAST(COALESCE(SUM(date_diff('day', "
                f"date_trunc('month', CAST(ts AS TIMESTAMP)), "
                f"CAST(ts AS TIMESTAMP))) FILTER (WHERE {c_dk}), 0) "
                f"AS BIGINT)",
                a,
            )
        elif which == 12:
            # tranche 3: bit-reduction aggregate
            k = rng.choice([255, 4095])
            add(
                f"COALESCE(groupBitOr(toInt64(user_id % {k})), 0)",
                f"CAST(COALESCE(bit_or(CAST(user_id % {k} AS BIGINT)), 0)"
                " AS BIGINT)",
                a,
            )
        else:
            # tranche 3: URL family round trip — the parameter value is
            # synthesized from event_id, so Spark's parse_url extraction
            # must reproduce exactly what DuckDB computes directly
            p = rng.choice([97, 101])
            add(
                f"COALESCE(sumIf(toInt64(extractURLParameter("
                f"concat('https://sh', toString(user_id % 5), "
                f"'.example.org/p/', event_type, '?q=', "
                f"toString(event_id % {p})), 'q')), {c_ch}), 0)",
                f"CAST(COALESCE(SUM(event_id % {p}) "
                f"FILTER (WHERE {c_dk}), 0) AS BIGINT)",
                a,
            )

    # statement-level idioms, COMPOSABLE in one statement: FROM events
    # [FINAL] [SAMPLE k/m [OFFSET a/b]] [PREWHERE|WHERE cond]. FINAL is
    # the a4 latest-per-key collapse (restated on the DuckDB side as
    # the window CTE); SAMPLE is the a32 md5 hash-band predicate
    # (restated as the identical integer band); the CH processing
    # order — collapse first, then band — matches the translator's
    # FINAL-inside-SAMPLE nesting.
    use_final = rng.random() < 0.35
    use_sample = rng.random() < 0.3
    src_ch = "events FINAL" if use_final else "events"
    src_dk = (
        "(SELECT * FROM ("
        "SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id "
        "ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) DESC, event_id DESC"
        ") AS __rn FROM events) "
        "WHERE __rn = 1 AND NOT (event_type = 'error')) events"
        if use_final
        else "events"
    )
    sample_pred_dk = ""
    if use_sample:
        denom = rng.choice([4, 8, 16])
        off_num = rng.randint(0, denom - 2)
        src_ch += f" SAMPLE 1/{denom} OFFSET {off_num}/{denom}"
        lo = ((1 << 32) * off_num) // denom
        hi = lo + (1 << 32) // denom
        band = (
            "CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8))"
            " AS BIGINT)"
        )
        sample_pred_dk = f"{band} >= {lo} AND {band} < {hi}"
    w_ch = w_dk = ""
    if rng.random() < 0.4:
        c_ch, c_dk = _ch_cond(rng)
        kw = "PREWHERE" if rng.random() < 0.5 else "WHERE"
        w_ch, w_dk = f"{kw} {c_ch}", f"WHERE {c_dk}"
        if sample_pred_dk:
            w_dk = f"WHERE ({sample_pred_dk}) AND ({c_dk})"
    elif sample_pred_dk:
        w_dk = f"WHERE {sample_pred_dk}"
    tail_ch = (
        " SETTINGS max_threads = 4" if rng.random() < 0.2 else ""
    )
    if rng.random() < 0.8:
        k_ch, k_dk = rng.choice(_CH_KEYS)
        # WITH TOTALS composes with FINAL/SAMPLE/PREWHERE/SETTINGS in
        # the same statement: the dialect rewrites it to GROUPING SETS
        # ((k), ()), restated natively on the DuckDB side (NULL totals
        # keys on both engines — the ANSI convention the translator
        # documents)
        use_totals = rng.random() < 0.3
        tot_ch = " WITH TOTALS" if use_totals else ""
        # HAVING COUNT(*) > 0 mirrors Spark's empty-input semantics:
        # Spark's grouping sets emit NO rows over zero input where
        # DuckDB still emits the one () row (documented translator edge)
        group_dk = (
            f"GROUP BY GROUPING SETS (({k_dk}), ()) HAVING COUNT(*) > 0"
            if use_totals
            else "GROUP BY 1"
        )
        ch = (
            f"SELECT {k_ch} AS k0, {', '.join(ch_aggs)} FROM {src_ch} "
            f"{w_ch} GROUP BY {k_ch}{tot_ch} ORDER BY k0{tail_ch}"
        )
        dk = (
            f"SELECT {k_dk} AS k0, {', '.join(dk_aggs)} FROM {src_dk} "
            f"{w_dk} {group_dk} ORDER BY k0"
        )
    else:
        ch = f"SELECT {', '.join(ch_aggs)} FROM {src_ch} {w_ch}{tail_ch}"
        dk = f"SELECT {', '.join(dk_aggs)} FROM {src_dk} {w_dk}"
    return ch, dk


@pytest.mark.parametrize("i", range(N_CH_QUERIES))
def test_random_ch_dialect_parity(spark, duck, i):
    from mysql_to_clickhouse_spark.functions.chdialect import ch_sql

    rng = random.Random(SEED * 577 + i)
    ch_text, duck_text = _gen_ch_query(rng)
    spark_pdf = ch_sql(spark, ch_text).toPandas()
    duck_pdf = duck.sql(duck_text).df()
    res = compare_frames(spark_pdf, duck_pdf)
    assert res.ok, (
        f"divergence on CH text:\n{ch_text}\n"
        f"vs duck:\n{duck_text}\n{res.detail}"
    )


# ---------------------------------------------------------------------------
# CH statement COMPOSITION axis (r11, VERDICT #4): mutations x ARRAY
# JOIN x LIMIT BY x WITH TOTALS x subquery depth in one seeded stream.
# The r10 axis composes TOTALS/FINAL/SAMPLE/PREWHERE; this one drives
# the remaining statement families through ch_mutation + ch_sql against
# native DuckDB restatements. The UPDATE shapes deliberately assign a
# column the gate reads (value) — the r11 ADVICE snapshot-semantics
# bug class stays permanently fuzzed.
# ---------------------------------------------------------------------------

N_CH_COMPOSE = 60

_FP_V = "CAST(FLOOR(value * 10000.0) AS BIGINT)"


def _gen_mutation(rng: random.Random) -> tuple[list[str], str]:
    """([mutation statements for ch_mutation], DuckDB CTE body) over
    events — the pre-aggregation mutation prefix."""
    c_ch, c_dk = _ch_cond(rng)
    if rng.random() < 0.5:
        ch = f"ALTER TABLE events DELETE WHERE {c_ch}"
        dk = (
            "SELECT * FROM events "
            f"WHERE NOT COALESCE(CAST(({c_dk}) AS BOOLEAN), FALSE)"
        )
        return [ch], dk
    k = rng.randint(2, 5)
    ch = (
        f"ALTER TABLE events UPDATE "
        f"value = value * 2 + (user_id % {k}), "
        f"event_type = concat(event_type, '_m') "
        f"WHERE {c_ch}"
    )
    gate = f"COALESCE(CAST(({c_dk}) AS BOOLEAN), FALSE)"
    dk = (
        "SELECT event_id, ts, user_id, "
        f"CASE WHEN {gate} THEN event_type || '_m' "
        "ELSE event_type END AS event_type, "
        f"CASE WHEN {gate} THEN value * 2 + (user_id % {k}) "
        "ELSE value END AS value, props "
        "FROM events"
    )
    return [ch], dk


def _gen_ch_compose(rng: random.Random):
    """Returns (mutations, ch_text, duck_text). ch_text runs via
    ch_sql against the (possibly mutated) view named events_m."""
    mutations, dk_src = [], "SELECT * FROM events"
    if rng.random() < 0.5:
        mutations, dk_src = _gen_mutation(rng)
    shape = rng.random()
    if shape < 0.4:
        # ARRAY JOIN over the digit runs in props, aggregated, with an
        # optional WITH TOTALS on the group
        m = rng.randint(3, 9)
        use_totals = rng.random() < 0.4
        tot = " WITH TOTALS" if use_totals else ""
        w_ch = w_dk = ""
        if rng.random() < 0.5:
            c_ch, c_dk = _ch_cond(rng)
            w_ch, w_dk = f"WHERE {c_ch}", f"AND ({c_dk})"
        ch = (
            f"SELECT user_id % {m} AS k0, count() AS n, "
            f"COALESCE(sum(toInt64(d)), 0) AS s "
            # regexp_extract_all, not the extractAll SQL UDF: Spark
            # refuses SQL-UDF expressions inside Generate (explode)
            f"FROM events_m ARRAY JOIN "
            f"regexp_extract_all(props, '[0-9]+', 0) AS d "
            f"{w_ch} GROUP BY user_id % {m}{tot} ORDER BY k0"
        )
        group = (
            "GROUP BY GROUPING SETS ((k0), ()) HAVING COUNT(*) > 0"
            if use_totals else "GROUP BY k0"
        )
        dk = (
            f"WITH events_m AS ({dk_src}), ex AS ("
            f"SELECT user_id % {m} AS k0, "
            f"unnest(regexp_extract_all(props, '[0-9]+')) AS d "
            f"FROM events_m WHERE TRUE {w_dk}) "
            f"SELECT k0, CAST(COUNT(*) AS BIGINT) AS n, "
            f"CAST(COALESCE(SUM(CAST(d AS BIGINT)), 0) AS BIGINT) AS s "
            f"FROM ex {group} ORDER BY k0"
        )
        return mutations, ch, dk
    if shape < 0.7:
        # top-level LIMIT BY over a filtered scan (first-n-per-key in
        # the query's ORDER BY; event_id is unique -> deterministic)
        m = rng.randint(3, 8)
        nper = rng.randint(1, 3)
        c_ch, c_dk = _ch_cond(rng)
        ch = (
            f"SELECT user_id % {m} AS g, event_id, {_FP_V} AS v_fp "
            f"FROM events_m WHERE {c_ch} "
            f"ORDER BY g, event_id LIMIT {nper} BY g"
        )
        dk = (
            f"WITH events_m AS ({dk_src}), r AS ("
            f"SELECT user_id % {m} AS g, event_id, {_FP_V} AS v_fp, "
            f"ROW_NUMBER() OVER (PARTITION BY user_id % {m} "
            f"ORDER BY event_id) AS rn "
            f"FROM events_m WHERE {c_dk}) "
            f"SELECT g, event_id, v_fp FROM r WHERE rn <= {nper} "
            f"ORDER BY g, event_id"
        )
        return mutations, ch, dk
    # subquery depth: outer aggregate over an inner per-user rollup
    m = rng.randint(2, 6)
    kw = "PREWHERE" if rng.random() < 0.4 else "WHERE"
    c_ch, c_dk = _ch_cond(rng)
    ch = (
        f"SELECT uk % {m} AS k0, count() AS n_users, "
        f"COALESCE(sum(s_fp), 0) AS tot "
        f"FROM (SELECT user_id AS uk, sum({_FP_V}) AS s_fp "
        f"FROM events_m {kw} {c_ch} GROUP BY user_id) "
        f"GROUP BY uk % {m} ORDER BY k0"
    )
    dk = (
        f"WITH events_m AS ({dk_src}), inner_q AS ("
        f"SELECT user_id AS uk, SUM({_FP_V}) AS s_fp "
        f"FROM events_m WHERE {c_dk} GROUP BY user_id) "
        f"SELECT uk % {m} AS k0, CAST(COUNT(*) AS BIGINT) AS n_users, "
        f"CAST(COALESCE(SUM(s_fp), 0) AS BIGINT) AS tot "
        f"FROM inner_q GROUP BY k0 ORDER BY k0"
    )
    return mutations, ch, dk


@pytest.mark.parametrize("i", range(N_CH_COMPOSE))
def test_random_ch_compose_parity(spark, duck, i):
    from mysql_to_clickhouse_spark.functions.chdialect import (
        ch_mutation,
        ch_sql,
    )
    from mysql_to_clickhouse_spark.tables import load

    rng = random.Random(SEED * 911 + i)
    mutations, ch_text, duck_text = _gen_ch_compose(rng)
    frame = load(spark, TEST_SF_DIR, "events")
    for stmt in mutations:
        frame = ch_mutation(stmt, frame)
    frame.createOrReplaceTempView("events_m")
    spark_pdf = ch_sql(spark, ch_text).toPandas()
    duck_pdf = duck.sql(duck_text).df()
    res = compare_frames(spark_pdf, duck_pdf)
    assert res.ok, (
        f"divergence; mutations={mutations}\nCH:\n{ch_text}\n"
        f"duck:\n{duck_text}\n{res.detail}"
    )
