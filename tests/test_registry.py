"""Registry ordering contract: the verification driver records correctness
for only a prefix of ``queries()`` (50 entries in round 1), so the emitted
order must cover every SURVEY.md §2 family in any reasonable prefix."""

from __future__ import annotations

from mysql_to_clickhouse_spark.registry import _BASE_COUNTS, all_queries


def test_every_family_in_any_10_prefix():
    names = list(all_queries())
    first10 = names[:10]
    assert {n[0] for n in first10} == set(_BASE_COUNTS), first10


def test_50_prefix_covers_each_family_five_deep():
    qs = all_queries()
    names = list(qs)[:50]
    for fam in _BASE_COUNTS:
        fam_names = [n for n in names if n[0] == fam]
        assert len(fam_names) == 5, (fam, fam_names)
    # every capped driver row is a hash check: all 50 prefix entries
    # carry oracles (j3 gained its fixed-point oracle in round 5)
    rows_only = [n for n in names if qs[n].oracle is None]
    assert rows_only == [], rows_only


def test_base_ids_before_extensions():
    names = list(all_queries())
    n_base = sum(_BASE_COUNTS.values())
    base_prefix = names[:n_base]
    # No extension (letter-suffixed or beyond-family-count id) in base zone.
    for n in base_prefix:
        fam, rest = n[0], n[1:].split("_", 1)[0]
        assert rest.isdigit() and int(rest) <= _BASE_COUNTS[fam], n


def test_registry_complete():
    names = list(all_queries())
    assert len(names) == len(set(names)) >= 120


def test_priority_order_is_total():
    """all_queries() must emit EVERY registered query — the interleave
    must be bounded by the longest live family list, not the static
    base counts (a dropped tail would silently skip driver checks)."""
    from mysql_to_clickhouse_spark import registry as reg

    qs = all_queries()
    assert set(qs.keys()) == set(reg._REGISTRY.keys())

    # synthetic overfull family: more entries than its base count
    fake = {
        f"a{i}_fake": reg.Query(name=f"a{i}_fake", fn=None, oracle="x", tier="T2")
        for i in range(1, 8)
    }
    fake.update(
        {
            f"b{i}_fk": reg.Query(name=f"b{i}_fk", fn=None, oracle="x", tier="T2")
            for i in range(1, 3)
        }
    )
    ordered = reg._priority_order(fake)
    assert set(ordered) == set(fake.keys())


def test_extension_prefixes_family_balanced():
    """Extras round-robin by family too: for any driver cap, the slice
    of extension IDs it sees is family-balanced (no family may hold 2+
    more slots than another family that still has unseen extras), and
    within each family oracle-backed extras precede rows-only ones."""
    from mysql_to_clickhouse_spark.registry import _BASE_COUNTS
    from mysql_to_clickhouse_spark import registry as reg

    qs = all_queries()
    names = list(qs)
    n_base = sum(_BASE_COUNTS.values())
    extras = names[n_base:]
    totals = {}
    for n in extras:
        totals[n[0]] = totals.get(n[0], 0) + 1
    for cap in (10, 50, 100, 200, len(names)):
        seen = {}
        for n in names[n_base:cap]:
            seen[n[0]] = seen.get(n[0], 0) + 1
        for fam, cnt in seen.items():
            for other, tot in totals.items():
                if totals.get(other, 0) > seen.get(other, 0):
                    # family `other` still has unseen extras → no family
                    # may be more than one round ahead of it
                    assert cnt <= seen.get(other, 0) + 1, (cap, fam, other)
    # oracle-first within each family's extra list
    by_fam = {}
    for n in extras:
        by_fam.setdefault(n[0], []).append(n)
    for fam, fam_names in by_fam.items():
        tiers = [0 if qs[n].oracle else 1 for n in fam_names]
        assert tiers == sorted(tiers), (fam, fam_names)


def test_rows_only_debt_ledger_complete():
    """Every oracle-less query must carry a no_oracle_reason and a
    resolvable compensating test (file exists, test function defined),
    and COVERAGE.md must contain the generated ledger row for it."""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coverage = open(os.path.join(repo, "COVERAGE.md")).read()
    qs = all_queries()
    rows_only = {n: q for n, q in qs.items() if q.oracle is None}
    assert rows_only, "expected at least one rows-only query"
    for name, q in rows_only.items():
        assert q.no_oracle_reason.strip(), f"{name}: missing no_oracle_reason"
        assert "::" in q.test, f"{name}: test must be file.py::test_fn"
        path, fn = q.test.split("::", 1)
        full = os.path.join(repo, path)
        assert os.path.exists(full), f"{name}: {path} not found"
        assert f"def {fn}(" in open(full).read(), f"{name}: {fn} not in {path}"
        assert f"| `{name}` |" in coverage, f"{name}: ledger row missing"
    # and no stale ledger rows for queries that HAVE oracles now
    ledger = coverage.split("## Rows-only debt ledger", 1)[1]
    for line in ledger.splitlines():
        if line.startswith("| `"):
            qid = line.split("`")[1]
            assert qid in rows_only, f"stale ledger row: {qid}"
