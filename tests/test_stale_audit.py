"""The stale-green audit tool must itself be trustworthy: closure
hashes deterministic across runs, repo paths normalized (a worktree
dump of IDENTICAL code must hash identically), and the ledger-join
semantics of --hashed-round correct."""

from __future__ import annotations

import json
import subprocess
import sys

sys.path.insert(0, "/root/repo")
from tools import stale_audit as SA  # noqa: E402


def _dump_subproc(repo_dir: str) -> dict:
    out = subprocess.run(
        [sys.executable, "tools/stale_audit.py", "dump", repo_dir],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        check=True,
    )
    return json.loads(out.stdout)


def test_dump_is_deterministic_and_total():
    a = _dump_subproc("/root/repo")
    b = _dump_subproc("/root/repo")
    assert a == b, "closure hashes unstable across identical runs"
    from nyc_government_hiring_audit_data_platform_spark import driver_queries as DQ

    assert set(a) == set(DQ.QUERIES), "audit must cover every declared query"
    # every oracle-bearing query carries a non-empty oracle hash
    assert all(a[n]["oracle"] for n in DQ.ORACLE)


def test_worktree_of_head_hashes_identically(tmp_path):
    """Identical code in a different directory (the compare-mode
    worktree) must produce identical hashes - the wet_documents
    absolute-fixture-path false positive, pinned."""
    wt = str(tmp_path / "wt_head")
    subprocess.run(
        ["git", "-C", "/root/repo", "worktree", "add", "--detach", wt, "HEAD"],
        check=True,
        capture_output=True,
    )
    try:
        subprocess.run(
            ["git", "-C", "/root/repo", "diff", "--quiet", "HEAD"],
            check=False,
        )
        here = _dump_subproc("/root/repo")
        there = _dump_subproc(wt)
        # only queries whose source is identical on disk must match; a
        # dirty working tree can differ, so compare against committed
        # HEAD only when the tree is clean
        dirty = subprocess.run(
            ["git", "-C", "/root/repo", "status", "--porcelain"],
            capture_output=True,
            text=True,
        ).stdout.strip()
        if not dirty:
            assert here == there, "worktree dump differs: path leakage in hashes"
        else:  # still a strong check: wet_documents is fixture-path-bound
            assert here["wet_documents"] == there["wet_documents"]
    finally:
        subprocess.run(
            ["git", "-C", "/root/repo", "worktree", "remove", "--force", wt],
            capture_output=True,
        )


def test_last_checked_and_fresh_floor_semantics(tmp_path):
    d = tmp_path / "ledger"
    d.mkdir()
    (d / "CORRECTNESS_r05.json").write_text(
        json.dumps({"q1": {"rows_match": True}, "q2": {"rows_match": True}})
    )
    (d / "CORRECTNESS_r06.json").write_text(
        json.dumps({"q2": {"rows_match": True}})
    )
    last = SA._last_checked(str(d))
    assert last == {"q1": 5, "q2": 6}
