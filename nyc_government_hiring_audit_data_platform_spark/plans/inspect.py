"""Physical-plan inspection utilities.

The 100 TB design contract is enforced here, not assumed: tests assert
that scans prune columns and push filters, that small sides broadcast,
and that per-group top-N compiles to WindowGroupLimit. If a refactor
regresses a plan (a filter stops reaching parquet, a broadcast turns
into a shuffle), these helpers turn it into a test failure instead of a
silent 100x slowdown at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (ReadSchema of every scan)."""
    import re

    plan = physical_plan(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        for part in m.group(1).split(","):
            name = part.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every parquet scan in the plan."""
    import re

    plan = physical_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        entries = [e.strip() for e in m.group(1).split(",") if e.strip()]
        out.extend(entries)
    return out


def assert_column_pruning(df: DataFrame, max_columns: int) -> None:
    """Fail if any scan reads more than ``max_columns`` columns."""
    cols = read_schema_columns(df)
    assert len(cols) <= max_columns, (
        f"scan reads {len(cols)} columns ({cols}); expected <= {max_columns} - "
        "projection did not reach the parquet scan"
    )


def assert_filter_pushdown(df: DataFrame, fragment: str) -> None:
    """Fail unless some pushed filter mentions ``fragment``."""
    pf = pushed_filters(df)
    assert any(fragment.lower() in f.lower() for f in pf), (
        f"no pushed filter mentions {fragment!r}; pushed: {pf}"
    )


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or "BroadcastNestedLoopJoin" in physical_plan(df)


def uses_window_group_limit(df: DataFrame) -> bool:
    """True when rank<=k compiled into WindowGroupLimit (partial top-K
    before the shuffle - the scalable per-group top-N)."""
    return "WindowGroupLimit" in physical_plan(df)


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan
    (BroadcastExchange is data movement but not a shuffle)."""
    import re

    plan = physical_plan(df)
    # each operator appears once in the tree and once in the detail
    # section; count tree entries only ("(n) Exchange")
    return len(re.findall(r"\(\d+\) Exchange\b", plan))
