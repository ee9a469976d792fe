"""Stale-green audit: which driver queries changed after their last hash?

The driver re-hashes ~50 of the declared queries per round, so a query
whose Spark body, oracle SQL, or *any transitively referenced package
helper* changes after its latest CORRECTNESS_r{N} row is green-on-file
for code that no longer exists ("stale green", VERDICT r5/r6). This tool
makes the audit mechanical instead of a diff-reading ritual:

  # 1. dump per-query closure hashes for a checkout (runs in-process):
  python tools/stale_audit.py dump /path/to/checkout > new.json

  # 2. compare two checkouts against the CORRECTNESS ledger:
  python tools/stale_audit.py compare <old-git-rev> [--repo /root/repo]

``compare`` materializes <old-git-rev> into a temp ``git worktree``,
dumps both sides in subprocesses (so the two package versions never
share an interpreter), joins with the last-checked round per query from
CORRECTNESS_r*.json, and prints every query whose closure changed since
the given rev but whose latest driver hash predates the current round -
i.e. the exact set ``__spark_entry__.REWRITTEN`` must pin.

Closure definition (per query name):
  - the registered Spark callable's source, plus the source of every
    function/class it references (transitively) that is defined inside
    the ``nyc_government_hiring_audit_data_platform_spark`` package,
    plus ``repr`` of referenced module-level constants;
  - the final ORACLE SQL string (import-time f-string composition of
    shared ``_sql`` fragments is therefore covered by value).

Known under-approximation: dynamic dispatch (getattr-by-string) and
behavior changed purely via data files are invisible; those have been
absent from the query suite so far. Over-approximation: a helper edit
flags every query in its closure even when the edit is a comment - the
cost is one extra driver re-hash, which is the safe direction.
"""

from __future__ import annotations

import ast
import glob
import hashlib
import inspect
import json
import os
import re
import subprocess
import sys
import textwrap

PKG = "nyc_government_hiring_audit_data_platform_spark"


# ---------------------------------------------------------------------------
# dump mode: runs inside a checkout, prints {query: {spark, oracle}} hashes
# ---------------------------------------------------------------------------


def _referenced_names(src: str) -> tuple[set[str], set[tuple[str, str]]]:
    """Bare names and (root, attr) pairs referenced by a function source."""
    tree = ast.parse(textwrap.dedent(src))
    names: set[str] = set()
    attrs: set[tuple[str, str]] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            names.add(node.id)
        elif isinstance(node, ast.Attribute) and isinstance(node.value, ast.Name):
            attrs.add((node.value.id, node.attr))
    return names, attrs


def _closure_sources(fn, skip_ids: frozenset[int] = frozenset()) -> list[str]:
    """Sources of fn plus every package-defined object it (transitively)
    references; module-level constants contribute their repr.

    ``skip_ids``: object ids to exclude - the QUERIES/ORACLE registries
    reference *every* query (and repr with memory addresses), so keeping
    them would make every closure change whenever any query is added.
    Same reasoning rejects any constant whose repr embeds an address.
    """
    import types

    seen: set[int] = set()
    out: dict[str, str] = {}  # sort key -> source text (dedup + determinism)
    stack = [fn]
    while stack:
        obj = stack.pop()
        if id(obj) in seen:
            continue
        seen.add(id(obj))
        try:
            src = inspect.getsource(obj)
            modname = getattr(obj, "__module__", "") or ""
        except (OSError, TypeError):
            continue
        if not modname.startswith(PKG):
            continue
        key = f"{modname}.{getattr(obj, '__qualname__', getattr(obj, '__name__', '?'))}"
        out[key] = src
        names, attrs = _referenced_names(src)
        gl = getattr(obj, "__globals__", None)
        if gl is None:  # class: use its module's namespace
            mod = sys.modules.get(modname)
            gl = vars(mod) if mod else {}
        candidates = []
        for n in names:
            if n in gl:
                candidates.append((f"{modname}:{n}", gl[n]))
        for root, attr in attrs:
            base = gl.get(root)
            if isinstance(base, types.ModuleType) and base.__name__.startswith(PKG):
                if hasattr(base, attr):
                    candidates.append((f"{base.__name__}:{attr}", getattr(base, attr)))
        for ckey, val in candidates:
            if id(val) in skip_ids or isinstance(val, types.ModuleType):
                continue
            if inspect.isfunction(val) or inspect.isclass(val):
                if (getattr(val, "__module__", "") or "").startswith(PKG):
                    stack.append(val)
            elif isinstance(val, (str, int, float, bool, tuple, list, dict, set, frozenset, bytes)):
                # module-level constant defined in the package namespace
                # (gl came from a package function/class). Reject reprs
                # embedding memory addresses - not content-stable.
                r = repr(val)
                if " at 0x" not in r:
                    out.setdefault(f"const:{ckey}", r)
    return [out[k] for k in sorted(out)]


def dump(repo_dir: str) -> dict[str, dict[str, str]]:
    sys.path.insert(0, repo_dir)
    from nyc_government_hiring_audit_data_platform_spark import driver_queries as DQ

    skip = frozenset({id(DQ.QUERIES), id(DQ.ORACLE)})

    def norm(text: str) -> str:
        # fixture-backed queries embed the repo's ABSOLUTE path (e.g.
        # the wet_documents expectation parquet); hash it as <REPO> so
        # comparing a git-worktree dump against the live repo doesn't
        # flag a pure path difference as a code change
        return text.replace(repo_dir, "<REPO>")

    result: dict[str, dict[str, str]] = {}
    for name, fn in DQ.QUERIES.items():
        closure = norm("\n".join(_closure_sources(fn, skip)))
        spark_h = hashlib.sha256(closure.encode()).hexdigest()[:16]
        oracle = DQ.ORACLE.get(name)
        oracle_h = (
            hashlib.sha256(" ".join(norm(oracle).split()).encode()).hexdigest()[:16]
            if oracle
            else ""
        )
        result[name] = {"spark": spark_h, "oracle": oracle_h}
    return result


# ---------------------------------------------------------------------------
# compare mode
# ---------------------------------------------------------------------------


def _last_checked(repo_dir: str) -> dict[str, int]:
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo_dir, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            rows = json.load(open(path))
        except (OSError, ValueError):
            continue
        for name in rows:
            last[name] = max(last.get(name, 0), rnd)
    return last


def _dump_subprocess(repo_dir: str) -> dict[str, dict[str, str]]:
    me = os.path.abspath(__file__)
    proc = subprocess.run(
        [sys.executable, me, "dump", repo_dir], capture_output=True, text=True, check=True
    )
    return json.loads(proc.stdout)


def compare(old_rev: str, repo_dir: str, hashed_round: int | None = None) -> int:
    """``hashed_round``: the CORRECTNESS round whose hashes were taken
    from code AT ``old_rev``. When comparing against a ROUND-CLOSE rev
    (the code the driver actually hashed), pass that round: every query
    changed since is stale regardless of being checked that round.
    When omitted, uses the base-of-round heuristic (checked >= latest
    round counts as fresh) - correct only if ``old_rev`` PRECEDES the
    changes the latest round's driver run already saw."""
    wt = f"/tmp/stale_audit_{old_rev[:12]}"
    if not os.path.isdir(wt):
        subprocess.run(
            ["git", "-C", repo_dir, "worktree", "add", "--detach", wt, old_rev],
            check=True,
            capture_output=True,
        )
    try:
        old = _dump_subprocess(wt)
        new = _dump_subprocess(repo_dir)
    finally:
        subprocess.run(
            ["git", "-C", repo_dir, "worktree", "remove", "--force", wt], capture_output=True
        )
    last = _last_checked(repo_dir)
    cur_round = max(last.values(), default=0)
    fresh_floor = (hashed_round + 1) if hashed_round is not None else cur_round
    stale, fresh, added = [], [], []
    for name, h in sorted(new.items()):
        if name not in old:
            added.append(name)
            continue
        what = [side for side in ("spark", "oracle") if old[name][side] != h[side]]
        if not what:
            continue
        checked = last.get(name, 0)
        (fresh if checked >= fresh_floor else stale).append((name, "+".join(what), checked))
    print(f"# closure diff vs {old_rev}; latest driver round = r{cur_round}"
          + (f"; rev hashed as r{hashed_round}" if hashed_round is not None else ""))
    print(f"# {len(added)} added, {len(fresh)} changed+freshly-hashed, {len(stale)} STALE-GREEN")
    for name in added:
        print(f"ADDED       {name}")
    for name, what, checked in fresh:
        print(f"FRESH   r{checked} {name} ({what})")
    for name, what, checked in stale:
        print(f"STALE   r{checked} {name} ({what})  <- pin in REWRITTEN")
    return 0


def main() -> int:
    if len(sys.argv) >= 3 and sys.argv[1] == "dump":
        print(json.dumps(dump(os.path.abspath(sys.argv[2])), indent=1, sort_keys=True))
        return 0
    if len(sys.argv) >= 3 and sys.argv[1] == "compare":
        rest = sys.argv[3:]
        repo, hashed_round = "/root/repo", None
        while rest:
            if rest[0] == "--repo":
                repo = rest[1]
            elif rest[0] == "--hashed-round":
                hashed_round = int(rest[1])
            rest = rest[2:]
        return compare(sys.argv[2], repo, hashed_round)
    print(__doc__)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
