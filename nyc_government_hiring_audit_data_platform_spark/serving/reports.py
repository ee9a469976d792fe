"""Serving layer (reference parity: EP4 - api/ + streamlit/).

The reference serves GOLD tables through a per-request DuckDB connect +
``SELECT * ... OFFSET ? LIMIT ?`` FastAPI endpoint (reference:
api/fetch_data.py:42-69, api/main.py:42-51) and a Streamlit dashboard
with slider filtering and mean/min/max summary stats
(streamlit/app.py:29-112). Here the same surface runs against one
long-lived SparkSession: a dataset registry, deterministic pagination
(explicit sort - unordered OFFSET/LIMIT is nondeterministic, SURVEY.md
§7.3), range filtering, and the dashboard aggregations. FastAPI is not
installed in this container, so ``build_app`` gates the import and the
plain functions are the tested surface; the HTTP layer is a thin shim.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# id -> (name, dataframe-producer) registry; mirrors DATASET_CONFIG
# (reference: api/fetch_data.py:13-26).
_REGISTRY: dict[int, tuple[str, Any]] = {}


def register_dataset(dataset_id: int, name: str, df_factory) -> None:
    _REGISTRY[dataset_id] = (name, df_factory)


def list_datasets() -> list[dict]:
    """GET /reports (reference: api/main.py:84-94)."""
    return [{"id": i, "name": name} for i, (name, _) in sorted(_REGISTRY.items())]


def fetch_report(
    dataset_id: int,
    offset: int = 0,
    limit: int = 750_000,
    order_by: list[Column | str] | None = None,
) -> list[dict]:
    """GET /reports/{id} with pagination (reference: api/fetch_data.py:
    57-69). Params are int-cast defensively like the reference (:30-32);
    ordering defaults to every column for determinism."""
    offset, limit = int(offset), int(limit)
    if dataset_id not in _REGISTRY:
        raise KeyError(f"unknown dataset id {dataset_id}")
    _, factory = _REGISTRY[dataset_id]
    df: DataFrame = factory()
    order = order_by if order_by is not None else [F.asc(c) for c in df.columns]
    page = df.orderBy(*order).offset(offset).limit(limit)
    return [r.asDict(recursive=True) for r in page.collect()]


# -- dashboard aggregations (streamlit/app.py) -------------------------------


def score_bounds(df: DataFrame, col: str = "match_score") -> tuple[float, float]:
    """Slider bounds: min/max of the score column (reference:
    streamlit/app.py:55-59)."""
    row = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).collect()[0]
    return row["lo"], row["hi"]


def filter_score_range(df: DataFrame, lo: float, hi: float, col: str = "match_score") -> DataFrame:
    """Interactive range filter (reference: streamlit/app.py:65-73)."""
    return df.filter(F.col(col).cast("double").between(lo, hi))


def summary_metrics(df: DataFrame, col: str = "match_score") -> dict:
    """Row count + mean score over the filtered view (reference:
    streamlit/app.py:82-91), one pass."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"), F.round(F.avg(F.col(col).cast("double")), 2).alias("mean")
    ).collect()[0]
    return {"rows": row["n"], "mean_score": row["mean"]}


def build_app():  # pragma: no cover - fastapi not installed here
    """FastAPI shim over the functions above (reference: api/main.py).
    Gated: raises with guidance when fastapi is unavailable."""
    try:
        from fastapi import FastAPI, HTTPException
    except ImportError as exc:
        raise NotImplementedError(
            "fastapi is not installed in this container; serve the plain "
            "functions (list_datasets/fetch_report) behind any HTTP layer"
        ) from exc

    app = FastAPI(title="nyc-hiring-audit-spark")

    @app.get("/reports")
    def reports():
        return list_datasets()

    @app.get("/reports/{dataset_id}")
    def report(dataset_id: int, offset: int = 0, limit: int = 750_000):
        try:
            return fetch_report(dataset_id, offset, limit)
        except KeyError as e:
            raise HTTPException(status_code=404, detail=str(e))

    return app
