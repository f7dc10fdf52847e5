"""Compare bench JSON records and flag per-query movers.

Usage:
    python tools/bench_compare.py OLD.json NEW.json [NEW2.json ...] [threshold]

Accepts either a raw bench.py output line ({"metric": ...}) or a
driver BENCH_r{N}.json wrapper ({"parsed": {...}}). Prints one line
per query with the ratio, sorted worst-first, and exits nonzero if any
query moved more than ``threshold``× (default 2.0) in either
direction — so a round's perf regression is a visible diff, not a
number someone has to eyeball across files.

Multiple NEW files (the r12 host-episode lesson): this host suffers
multi-minute slow episodes that inflate disjoint query sets per run,
so a single solo record can flag 5-7x "regressions" in untouched code.
Passing every same-tree solo run compares OLD against the per-query
MINIMUM across runs (canary = the minimum canary among them) — a query
is only flagged SLOWER if it is slow in EVERY run, which is the
episode-robust signal. Each run's t_offset (when recorded) is shown
for flagged movers so episodes can be correlated with wall-clock.
"""

from __future__ import annotations

import json
import os
import sys


def _brace_object(text: str, key: str) -> dict | None:
    """Extract the JSON object following ``"key":`` from a possibly
    front-truncated text blob by brace matching (driver BENCH wrappers
    keep only the TAIL of stdout when their own parse failed, so the
    record may hold complete inner objects inside an incomplete
    line)."""
    marker = f'"{key}": {{'
    i = text.find(marker)
    if i < 0:
        return None
    start = i + len(marker) - 1
    depth = 0
    for j in range(start, len(text)):
        if text[j] == "{":
            depth += 1
        elif text[j] == "}":
            depth -= 1
            if depth == 0:
                try:
                    return json.loads(text[start : j + 1])
                except json.JSONDecodeError:
                    return None
    return None


def _load(path: str) -> dict:
    with open(path) as f:
        text = f.read()
    try:
        d = json.loads(text)
    except json.JSONDecodeError:
        # r15+ bench stdout is TWO JSON lines (sidecar with per-query
        # diagnostics first, slim contract line LAST — the truncation
        # hardening). Merge them: the contract line wins on conflicts.
        d = {}
        for line in text.splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    d.update(json.loads(line))
                except json.JSONDecodeError:
                    continue
        if not d:
            raise SystemExit(f"{path}: no parseable JSON line")
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    if "queries" not in d and isinstance(d.get("tail"), str):
        # driver wrapper whose own parse failed: recover the inner
        # objects from the tail blob (prefer the cold-floor minimums,
        # matching what later records report as queries_min)
        tail = d["tail"]
        q = _brace_object(tail, "queries")
        qm = _brace_object(tail, "queries_min")
        if q or qm:
            rec = {"queries": q or qm}
            if qm:
                rec["queries_min"] = qm
            import re

            m = re.search(r'"canary_duckdb_sec": ([0-9.]+)', tail)
            if m:
                rec["canary_duckdb_sec"] = float(m.group(1))
            print(f"{path}: recovered {len(rec['queries'])} queries from tail blob")
            d = rec
    if "queries" not in d:
        raise SystemExit(f"{path}: no 'queries' key (crashed bench record?)")
    return d


def _min_merge(records: list[dict]) -> dict:
    """Per-query minimum across same-tree runs (the episode-robust
    number); canary = min canary; errors = union."""
    if len(records) == 1:
        return records[0]
    names = set()
    for r in records:
        names |= set(r["queries"])
    merged: dict = {
        "queries": {
            n: min(r["queries"][n] for r in records if n in r["queries"])
            for n in names
        },
        "errors": {k: v for r in records for k, v in (r.get("errors") or {}).items()},
    }
    canaries = [r["canary_duckdb_sec"] for r in records if r.get("canary_duckdb_sec")]
    if canaries:
        merged["canary_duckdb_sec"] = min(canaries)
    offs = [r.get("queries_t_offset") or {} for r in records]
    if any(offs):
        merged["queries_t_offset"] = {
            n: [o.get(n) for o in offs] for n in names
        }
    print(f"min-merged {len(records)} same-tree runs "
          f"(totals: {', '.join(str(round(sum(r['queries'].values()), 1)) for r in records)}; "
          f"min-merge total {round(sum(merged['queries'].values()), 1)})")
    return merged


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    args = sys.argv[1:]
    threshold = 2.0
    # the last arg is a threshold only if it is NOT an existing bench
    # file (ADVICE r12: a record named like "3.5" would silently be
    # consumed as a threshold instead of a NEW record)
    if not os.path.exists(args[-1]):
        try:
            threshold = float(args[-1])
            args = args[:-1]
        except ValueError:
            pass
    if len(args) < 2:
        raise SystemExit(__doc__)
    old = _load(args[0])
    new = _min_merge([_load(p) for p in args[1:]])
    # Host-drift normalization: if both records carry the constant-work
    # DuckDB canary, scale old timings by the canary ratio so a slower
    # co-tenant host doesn't read as a plan regression (and a faster
    # host doesn't hide one).
    drift = 1.0
    if old.get("canary_duckdb_sec") and new.get("canary_duckdb_sec"):
        drift = new["canary_duckdb_sec"] / old["canary_duckdb_sec"]
        print(f"canary: old={old['canary_duckdb_sec']}s new={new['canary_duckdb_sec']}s "
              f"-> normalizing old timings by {drift:.2f}x host drift\n")
    rows = []
    for name, t_new in new["queries"].items():
        t_old = old["queries"].get(name)
        if t_old is None:
            rows.append((float("nan"), name, t_old, t_new, "NEW"))
            continue
        t_old = round(t_old * drift, 3)
        ratio = t_new / t_old if t_old else float("inf")
        flag = "SLOWER" if ratio > threshold else ("FASTER" if ratio < 1 / threshold else "")
        rows.append((ratio, name, t_old, t_new, flag))
    for name in old["queries"].keys() - new["queries"].keys():
        rows.append((float("nan"), name, old["queries"][name], None, "GONE"))
    rows.sort(key=lambda r: -(r[0] if r[0] == r[0] else 0))
    bad = 0
    offsets = new.get("queries_t_offset") or {}
    for ratio, name, t_old, t_new, flag in rows:
        r = f"{ratio:6.2f}x" if ratio == ratio else "    — "
        off = ""
        if flag in ("SLOWER", "FASTER") and name in offsets:
            off = f"  @t={offsets[name]}"
        print(f"{name:34s} {t_old if t_old is not None else '—':>8} → "
              f"{t_new if t_new is not None else '—':>8}  {r}  {flag}{off}")
        if flag in ("SLOWER", "FASTER"):
            bad += 1
    errs = new.get("errors") or {}
    for name, e in errs.items():
        print(f"{name:34s} ERROR: {e}")
    print(f"\n{bad} queries moved >{threshold}x; {len(errs)} errored")
    sys.exit(1 if (bad or errs) else 0)


if __name__ == "__main__":
    main()
