"""Planted-data semantic tests for the r4 session-2 wave: e9/e10
window ops, h19 rolling MAU, i24 PII redaction, i25 paragraph dedup."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour)


def _ev(eid, ts, uid, et="view", value=1.0, props="{}"):
    return Row(event_id=eid, ts=ts, user_id=uid, event_type=et,
               value=value, props=props)


def test_running_distinct_counts_each_user_once(spark, tmp_path):
    rows = [
        _ev(0, _ts(1), 1), _ev(1, _ts(1), 2),      # day1: users 1,2
        _ev(2, _ts(2), 1), _ev(3, _ts(2), 3),      # day2: 1 again + new 3
        _ev(4, _ts(3), 1), _ev(5, _ts(3), 2),      # day3: no new users
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(rows).write.parquet(f"{sf}/events.parquet")

    from mysql_to_clickhouse_spark.operators.windows import e9_running_distinct

    got = {r.day_str: r for r in e9_running_distinct(spark, sf).collect()}
    assert got["2024-01-01"].cum_distinct_users == 2
    assert got["2024-01-02"].cum_distinct_users == 3
    assert "2024-01-03" not in got  # no new users -> no row for that day


def test_nonneg_derivative_clamps_resets(spark, tmp_path):
    rows = [
        _ev(0, _ts(1, 0), 1, value=10.0),
        _ev(1, _ts(1, 1), 1, value=46.0),   # +36 over 3600s -> 0.01/s
        _ev(2, _ts(1, 2), 1, value=5.0),    # reset -> clamped to 0
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(rows).write.parquet(f"{sf}/events.parquet")

    from mysql_to_clickhouse_spark.operators.windows import e10_nonneg_derivative

    got = sorted(e10_nonneg_derivative(spark, sf).collect(),
                 key=lambda r: r.ts_us)
    assert got[0].rate_per_s is None
    assert got[1].rate_per_s == pytest.approx(36.0 / 3600.0)
    assert got[2].rate_per_s == 0.0


def test_rolling_mau_window_coverage(spark, tmp_path):
    rows = [
        _ev(0, _ts(1), 1),
        _ev(1, _ts(5), 2),
        _ev(2, _ts(10), 1),
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(rows).write.parquet(f"{sf}/events.parquet")

    from mysql_to_clickhouse_spark.operators.eventtime import h19_rolling_mau

    got = {r.day_str: r.rolling_7d_users for r in h19_rolling_mau(spark, sf).collect()}
    # day5 window [day-1..5] covers user1(day1) + user2(day5)
    assert got["2024-01-05"] == 2
    # day10 window [day4..10] covers user2(day5) + user1(day10)
    assert got["2024-01-10"] == 2
    assert got["2024-01-01"] == 1


def _doc(doc_id, text, lang="en", source="src0"):
    return Row(doc_id=doc_id, text=text, lang=lang, source=source,
               n_chars=len(text))


def test_pii_redaction_counts_and_replaces(spark, tmp_path):
    docs = [_doc(3, "hello world"), _doc(15, "foo bar"), _doc(7, "clean text")]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(docs).write.parquet(f"{sf}/documents.parquet")

    from mysql_to_clickhouse_spark.operators.llmops import i24_pii_redaction

    got = {r.doc_id: r for r in i24_pii_redaction(spark, sf).collect()}
    assert got[3].n_emails == 1 and got[3].n_phones == 0
    assert "<EMAIL>" in got[3].clean_text and "@" not in got[3].clean_text
    assert got[15].n_emails == 1 and got[15].n_phones == 1
    assert "<PHONE>" in got[15].clean_text
    assert got[7].n_emails == 0 and got[7].clean_text == "clean text"


def test_paragraph_dedup_drops_boilerplate(spark, tmp_path):
    boiler = " ".join(f"w{i}" for i in range(10))       # shared 10-word chunk
    uniq_a = " ".join(f"a{i}" for i in range(10))
    uniq_b = " ".join(f"b{i}" for i in range(10))
    docs = [
        _doc(1, boiler + " " + uniq_a),
        _doc(2, boiler + " " + uniq_b),                  # boiler dropped here
        _doc(3, uniq_b + " " + uniq_b),                  # in-doc repeat: 2nd dropped
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(docs).write.parquet(f"{sf}/documents.parquet")

    from mysql_to_clickhouse_spark.operators.llmops import i25_paragraph_dedup

    got = {r.doc_id: r for r in i25_paragraph_dedup(spark, sf).collect()}
    assert got[1].n_chunks == 2 and got[1].n_kept == 2
    assert got[1].clean_text == boiler + " " + uniq_a
    assert got[2].n_kept == 1 and got[2].clean_text == uniq_b
    # doc3: uniq_b already owned by doc2; both of doc3's chunks dropped
    assert got[3].n_kept == 0 and got[3].clean_text == ""


def test_strict_funnel_broken_by_interference(spark, tmp_path):
    """view->click->purchase counts only when consecutive: an
    interfering event between view and click voids the strict chain."""
    rows = [
        # user 1: v c p consecutive -> level 3
        _ev(0, _ts(1, 0), 1, "view"), _ev(1, _ts(1, 1), 1, "click"),
        _ev(2, _ts(1, 2), 1, "purchase"),
        # user 2: v e c -> error interferes -> level 1
        _ev(3, _ts(1, 0), 2, "view"), _ev(4, _ts(1, 1), 2, "error"),
        _ev(5, _ts(1, 2), 2, "click"),
        # user 3: c v c p -> the later consecutive run still counts
        _ev(6, _ts(1, 0), 3, "click"), _ev(7, _ts(1, 1), 3, "view"),
        _ev(8, _ts(1, 2), 3, "click"), _ev(9, _ts(1, 3), 3, "purchase"),
        # user 4: never views -> 0
        _ev(10, _ts(1, 0), 4, "purchase"),
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(rows).write.parquet(f"{sf}/events.parquet")

    from mysql_to_clickhouse_spark.operators.eventtime import h20_strict_funnel

    got = {r.user_id: r.strict_level for r in h20_strict_funnel(spark, sf).collect()}
    assert got == {1: 3, 2: 1, 3: 3, 4: 0}


def test_paragraph_dedup_matches_bruteforce_random(spark, tmp_path):
    """Property test: i25 equals a direct Python implementation of
    'first global occurrence by (doc_id, pos) wins' on a randomized
    small corpus with heavy chunk sharing."""
    import random

    rng = random.Random(7)
    vocab = [f"t{i}" for i in range(12)]
    docs = []
    for d in range(12):
        n_words = rng.choice([10, 20, 30, 25])
        words = [rng.choice(vocab) for _ in range(n_words)]
        docs.append((d, " ".join(words)))
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        [Row(doc_id=d, text=t, lang="en", source="s", n_chars=len(t))
         for d, t in docs]
    ).write.parquet(f"{sf}/documents.parquet")

    # brute force
    first_owner: dict[str, tuple] = {}
    chunks_of: dict[int, list] = {}
    for d, t in docs:
        ws = t.split(" ")
        cs = [" ".join(ws[i:i + 10]) for i in range(0, len(ws), 10)]
        chunks_of[d] = cs
        for p, c in enumerate(cs):
            if c not in first_owner or (d, p) < first_owner[c]:
                first_owner[c] = (d, p)
    expected = {}
    for d, t in docs:
        kept = [c for p, c in enumerate(chunks_of[d])
                if first_owner[c] == (d, p)]
        expected[d] = (len(chunks_of[d]), len(kept), " ".join(kept))

    from mysql_to_clickhouse_spark.operators.llmops import i25_paragraph_dedup

    got = {r.doc_id: (r.n_chunks, r.n_kept, r.clean_text)
           for r in i25_paragraph_dedup(spark, sf).collect()}
    assert got == expected


def test_paragraph_dedup_hot_chunk_skew(spark, tmp_path):
    """Adversarial skew: the SAME chunk appears in every document (the
    groupBy(chunk) hot key). Correctness must hold: exactly one global
    survivor, every other occurrence dropped."""
    boiler = " ".join(f"h{i}" for i in range(10))
    docs = [
        _doc(d, boiler + " " + " ".join(f"u{d}_{i}" for i in range(10)))
        for d in range(40)
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(docs).write.parquet(f"{sf}/documents.parquet")

    from mysql_to_clickhouse_spark.operators.llmops import i25_paragraph_dedup

    got = {r.doc_id: r for r in i25_paragraph_dedup(spark, sf).collect()}
    keepers = [d for d, r in got.items() if boiler in r.clean_text]
    assert keepers == [0]                       # min doc_id owns the hot chunk
    assert all(got[d].n_kept == 1 for d in range(1, 40))
    assert all(got[d].n_chunks == 2 for d in range(40))


def test_cdc_boundaries_properties_random():
    """Hypothesis-style property sweep: for random byte strings, the
    boundaries tile the input, respect min/max (except the tail), and
    are a pure function (same input -> same output)."""
    import random

    from mysql_to_clickhouse_spark.operators.multimodal import (
        _CDC_MAX,
        _CDC_MIN,
        _cdc_byte_table,
        cdc_boundaries,
    )

    table = _cdc_byte_table()
    rng = random.Random(123)
    for trial in range(25):
        n = rng.randint(0, 1200)
        data = bytes(rng.getrandbits(8) for _ in range(n))
        ends = cdc_boundaries(data, table)
        assert ends == cdc_boundaries(data, table)     # deterministic
        assert ends[-1] == len(data)
        assert ends == sorted(set(ends)) or data == b""
        prev = 0
        for e in ends[:-1]:
            assert _CDC_MIN <= e - prev <= _CDC_MAX, (trial, e - prev)
            prev = e
        assert ends[-1] - prev <= _CDC_MAX


def test_filter_pipeline_reason_bits(spark, tmp_path):
    """Each rejection reason sets its own bit; duplicates keep exactly
    one copy; a clean doc passes with mask 0."""
    good = " ".join(f"word{i}" for i in range(30))
    tiny_words = " ".join(["a"] * 30)                 # gopher: tiny-word cap
    repet = " ".join(["x y z"] * 20)                  # trigram repetition
    docs = [
        _doc(1, good),
        _doc(2, good),                                # exact dup of 1 -> bit 4
        _doc(3, tiny_words),                          # bit 1 (+ maybe others)
        _doc(4, repet),                               # bit 2
        _doc(5, "short words only"),                  # len < 50 -> bit 8
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(docs).write.parquet(f"{sf}/documents.parquet")

    from mysql_to_clickhouse_spark.operators.llmops import i31_filter_pipeline

    got = {r.doc_id: r for r in i31_filter_pipeline(spark, sf).collect()}
    assert got[1].keep == 1 and got[1].reason_mask == 0
    assert got[2].reason_mask & 4                     # dropped as duplicate
    assert got[3].reason_mask & 1                     # gopher fail
    assert got[4].reason_mask & 2                     # repetition fail
    assert got[5].reason_mask & 8                     # length fail
    assert all(r.keep == 0 for d, r in got.items() if d != 1)


def test_pseudonymize_preserves_grouping(spark, tmp_path):
    """a29: the surrogate key groups exactly like the raw key —
    cardinality and per-group sizes preserved."""
    rows = [
        _ev(0, _ts(1), 1), _ev(1, _ts(2), 1), _ev(2, _ts(1), 2),
        _ev(3, _ts(1), 3, "purchase"),
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(rows).write.parquet(f"{sf}/events.parquet")

    from mysql_to_clickhouse_spark.operators.scans import a29_pseudonymize

    got = a29_pseudonymize(spark, sf).collect()
    assert len(got) == 3                              # 3 users -> 3 surrogates
    assert sorted(r.n_events for r in got) == [1, 1, 2]
    assert all(len(r.surrogate) == 64 for r in got)   # sha256 hex
    assert all("1" != r.surrogate for r in got)       # raw key absent
