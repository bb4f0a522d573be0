"""Local mirror of the driver's DuckDB-oracle comparison (SURVEY.md §5.2).

Runs a registered query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count + column names + values
order-insensitively. Strictly harder than the driver's value-hash check:
exact equality (bitwise for floats) PLUS the stringified driver-hash
model — so a local pass predicts a driver hash match.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass

import numpy as np
import pandas as pd

from mysql_to_clickhouse_spark.tables import TABLES


def duckdb_connection(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for name in TABLES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form: datetime64→µs, arrays→tuples, columns sorted by
    name, rows sorted by all columns."""
    out = df.copy()
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("Int64" if s.isna().any() else "int64")
        elif pd.api.types.is_float_dtype(s) and s.dtype != np.float64:
            out[c] = s.astype("float64")
        elif s.dtype == object:
            sample = s.dropna()
            if len(sample) and isinstance(
                sample.iloc[0], (list, np.ndarray, tuple)
            ):
                out[c] = s.map(
                    lambda v: tuple(np.asarray(v).tolist())
                    if v is not None
                    else None
                )
            elif len(sample) and isinstance(sample.iloc[0], _dt.date):
                # datetime.date objects (Spark DATE) vs datetime64 (DuckDB)
                out[c] = pd.to_datetime(s).astype("datetime64[us]")
    out = out[sorted(out.columns)]
    if len(out):
        out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(
            drop=True
        )
    return out


@dataclass
class CompareResult:
    ok: bool
    detail: str

    def __bool__(self) -> bool:  # pragma: no cover
        return self.ok


def compare_frames(
    spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame
) -> CompareResult:
    a_cols, b_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if a_cols != b_cols:
        return CompareResult(False, f"column mismatch: spark={a_cols} oracle={b_cols}")
    if len(spark_pdf) != len(oracle_pdf):
        return CompareResult(
            False, f"row count mismatch: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
        )
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            avf = av.astype("float64").to_numpy()
            bvf = bv.astype("float64").to_numpy()
            exact = np.array_equal(avf, bvf, equal_nan=True)
            if exact:
                continue
            close = bool(np.allclose(avf, bvf, rtol=1e-9, atol=1e-12, equal_nan=True))
            worst = float(np.nanmax(np.abs(avf - bvf))) if len(avf) else 0.0
            return CompareResult(
                False,
                f"float col {c!r}: exact={exact} close={close} max_abs_diff={worst}",
            )
        else:
            if not av.equals(bv):
                neq = (av != bv) & ~(av.isna() & bv.isna())
                idx = list(np.where(neq)[0][:5])
                pairs = [(av.iloc[i], bv.iloc[i]) for i in idx]
                return CompareResult(
                    False, f"col {c!r} differs at rows {idx}: {pairs}"
                )
    return CompareResult(True, "ok")


def _string_rows(pdf: pd.DataFrame) -> list[tuple[str, ...]]:
    """The driver-hash model: datetimes normalized to µs, everything
    else stringified as-is — dtype differences (int64 vs float64) that
    a numeric comparison forgives WILL break this, as they would break
    the driver's value hash."""
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[us]")
    return sorted(
        tuple(str(v) for v in row) for row in pdf.itertuples(index=False)
    )


def run_and_compare(spark, con, query, sf_dir: str) -> CompareResult:
    """Execute one registry Query against spark + duckdb and compare."""
    sdf = query.fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if query.oracle is None:
        n = len(spark_pdf)
        return CompareResult(True, f"rows-only: {n} rows")
    oracle_pdf = con.sql(query.oracle).df()
    result = compare_frames(spark_pdf, oracle_pdf)
    if not result.ok:
        return result
    # strict driver-hash model on top of the numeric comparison
    s_rows, o_rows = _string_rows(spark_pdf), _string_rows(oracle_pdf)
    if s_rows != o_rows:
        first = next(
            (f"spark={a} oracle={b}" for a, b in zip(s_rows, o_rows) if a != b),
            "row sets differ",
        )
        return CompareResult(
            False,
            "numeric-equal but STRINGIFIED mismatch (driver hash would "
            f"fail): {first}",
        )
    return result
