"""Property tests for the incremental-aggregate algebra.

The driver rows hash specific fold shapes against DuckDB; these tests
randomize the part hypothesis is good at - arbitrary multisets,
arbitrary D ⊆ I retraction subsets, arbitrary batch splits - and pin
the two contracts that must hold for EVERY input:

1. sum/count/avg maintained through splits + retractions are EXACTLY
   the full recompute over the surviving rows (groups retracted to
   zero vanish);
2. the retractable-max synopsis NEVER lies: whenever it reports
   ok=True its value equals the true surviving maximum, and whenever
   it cannot certify, it reports (None, False) - conservative refusal
   is allowed, a wrong extreme is not.

Each hypothesis example packs up to 25 independent random groups into
ONE Spark job (keyed by group index), so a dozen examples exercise
hundreds of randomized groups at ordinary test cost. Values are drawn
from 1..9 with up to 10 per group and synopsis R=4, so horizon ties,
duplicate cancellations, and genuine synopsis exhaustion all occur.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from nyc_government_hiring_audit_data_platform_spark.operators import (
    incremental as IVM,
)
from nyc_government_hiring_audit_data_platform_spark.session import get_spark


@st.composite
def group(draw):
    vals = draw(
        st.lists(st.integers(min_value=1, max_value=9), min_size=0, max_size=10)
    )
    dels = [v for v in vals if draw(st.booleans())]
    split = draw(st.integers(min_value=0, max_value=len(vals)))
    return vals, dels, split


SPECS = [
    ("n", "v", "count"),
    ("total", "v", "sum"),
    ("mean", "v", "avg"),
    ("mx", "v", "retractable_max"),
]
R = 4  # small synopsis so exhaustion is actually reachable


@settings(max_examples=12, deadline=None)
@given(st.lists(group(), min_size=1, max_size=25))
def test_ivm_never_lies_under_random_retractions(groups):
    spark = get_spark(app_name="pytest", cpus=8)  # reuses the session
    ins1, ins2, dels = [], [], []
    for gi, (vals, dl, split) in enumerate(groups):
        k = f"g{gi}"
        ins1 += [(k, v) for v in vals[:split]]
        ins2 += [(k, v) for v in vals[split:]]
        dels += [(k, v) for v in dl]

    def df(rows):
        # sentinel row keeps createDataFrame schema-stable when a
        # random batch is empty; filtered out of the assertions
        return spark.createDataFrame(rows or [("_none_", None)], "k string, v long")

    state = IVM.partial_agg_state(df(ins1), ["k"], SPECS, synopsis_r=R)
    state = IVM.incremental_agg_refresh(state, df(ins2), ["k"], SPECS, synopsis_r=R)
    if dels:
        state = IVM.incremental_agg_refresh(
            state, df(dels), ["k"], SPECS, sign=-1, synopsis_r=R
        )
    got = {
        r["k"]: r
        for r in IVM.finalize_agg_state(state, ["k"], SPECS, synopsis_r=R).collect()
        if r["k"] != "_none_"
    }

    for gi, (vals, dl, _) in enumerate(groups):
        k = f"g{gi}"
        survivors = list((Counter(vals) - Counter(dl)).elements())
        if not survivors:
            assert k not in got, f"{k}: retracted-to-zero group must vanish"
            continue
        row = got[k]
        # exact kinds: always the full recompute over survivors
        assert row["n"] == len(survivors)
        assert row["total"] == sum(survivors)
        assert abs(row["mean"] - sum(survivors) / len(survivors)) < 1e-12
        # synopsis: certified answers are TRUE answers
        if row["mx_ok"]:
            assert row["mx"] == max(survivors), (
                f"{k}: certified max {row['mx']} != true {max(survivors)} "
                f"(vals={vals}, dels={dl})"
            )
        else:
            assert row["mx"] is None
