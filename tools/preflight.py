#!/usr/bin/env python
"""Preflight: run the verification ritual and refresh README's
verification block from the ACTUAL results, so the committed docs
cannot drift from reality (rounds 6-9 shipped a README claiming
"557 passed / 17.91 s" while HEAD measured 633 passed / 42.6 s).

Runs, in order:
  1. the full pytest suite (oracle sweep replays every DuckDB-backed
     query repr-exact at sf0.001),
  2. the repr-exact crosscheck of ALL oracle queries at sf0.01 — the
     DRIVER's scale factor (added round 11: the r10 signed-zero escape
     was invisible at sf0.001 and only reachable by the driver until
     this stage existed),
  3. ``bench.py`` at $SPARK_GRAFT_SF_DIR (default sf0.1) and parses its
     one-line JSON,
then rewrites the block between the ``<!-- preflight:begin -->`` /
``<!-- preflight:end -->`` markers in README.md with the measured
numbers and a timestamp, and prints a one-line PASS/FAIL summary.

Usage:
    python tools/preflight.py                    # full ritual
    python tools/preflight.py --skip-pytest      # skip stage 1
    python tools/preflight.py --skip-crosscheck  # skip stage 2
    python tools/preflight.py --skip-bench       # skip stage 3

Exit status is non-zero if any stage fails.  README lines for a
SKIPPED stage are kept verbatim from the previous run; lines for a
stage that RAN AND FAILED are kept but annotated "(stale — ... run
failed)" so a failure can never republish old numbers as fresh.
"""

from __future__ import annotations

import datetime
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
README = os.path.join(REPO, "README.md")
BEGIN = "<!-- preflight:begin -->"
END = "<!-- preflight:end -->"


def run_pytest() -> tuple[bool, str]:
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    # last non-empty line is pytest's summary ("633 passed, 1 skipped in ...")
    lines = [ln.strip() for ln in proc.stdout.splitlines() if ln.strip()]
    summary = lines[-1] if lines else "(no output)"
    summary = re.sub(r"^=+\s*|\s*=+$", "", summary)
    return proc.returncode == 0, summary


def _default_crosscheck_dir() -> str:
    """sf0.01 fixture dir for the crosscheck stage.  Honors
    SPARK_GRAFT_SF001_DIR, else derives a sf0.01 sibling of
    SPARK_GRAFT_SF_DIR (which the bench stage honors), else the
    canonical harness path — so the preflight ritual works on hosts
    with a different data layout."""
    explicit = os.environ.get("SPARK_GRAFT_SF001_DIR")
    if explicit:
        return explicit
    bench_dir = os.environ.get("SPARK_GRAFT_SF_DIR")
    if bench_dir:
        sibling = os.path.join(os.path.dirname(bench_dir.rstrip("/")), "sf0.01")
        if os.path.isdir(sibling):
            return sibling
    return "/root/testdata/sf0.01"


def run_crosscheck(sf_dir: str | None = None) -> tuple[bool, str]:
    sf_dir = sf_dir or _default_crosscheck_dir()
    proc = subprocess.run(
        [sys.executable, "tools/crosscheck.py", sf_dir, "--all"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=5400,
    )
    lines = [ln.strip() for ln in proc.stdout.splitlines() if ln.strip()]
    summary = lines[-1] if lines else "(no output)"
    return proc.returncode == 0, summary


def run_bench() -> tuple[bool, dict | None]:
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=3600,
        env=os.environ.copy(),
    )
    if proc.returncode != 0:
        return False, None
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return True, json.loads(line)
    return False, None


def _existing_line(prefix: str) -> str | None:
    """Current block's line starting with ``prefix`` (kept verbatim when
    that stage is skipped, so --skip-pytest doesn't erase the last
    recorded pytest state)."""
    text = open(README).read()
    m = re.search(re.escape(BEGIN) + r"(.*?)" + re.escape(END), text, re.DOTALL)
    if not m:
        return None
    for line in m.group(1).splitlines():
        if line.strip().startswith(prefix):
            return line
    return None


def _kept_line(prefix: str, status: str, today: str) -> str | None:
    """Previous block line for a stage that did not produce fresh data.

    ``skip``: kept verbatim.  ``fail``: kept but annotated as stale —
    a failed run must never republish old numbers under a fresh date
    (ADVICE r10)."""
    kept = _existing_line(prefix)
    if kept is None:
        return None
    if status == "fail" and "(stale" not in kept:
        kept = f"{kept.rstrip()} _(stale — {today} run FAILED)_"
    return kept


def render_block(stages: dict[str, tuple[str, object]]) -> str:
    """``stages``: name -> (status, payload); status in pass/fail/skip.
    Payload is the pytest/crosscheck summary string or the bench JSON
    dict, present only when the stage ran and passed."""
    today = datetime.date.today().isoformat()
    lines = [
        BEGIN,
        f"Verification state (generated by `tools/preflight.py`, {today}):",
        "",
    ]
    status, summary = stages["pytest"]
    if status == "pass":
        lines.append(
            f"- `pytest tests/ -q`: **{summary}** — the oracle sweep"
            " replays every DuckDB-backed registry query repr-exact at"
            " sf0.001."
        )
    elif (kept := _kept_line("- `pytest", status, today)) is not None:
        lines.append(kept)
    status, summary = stages["crosscheck"]
    if status == "pass":
        lines.append(
            f"- `crosscheck sf0.01 --all`: **{summary}** — repr-exact"
            " (-0.0-sensitive) replay of every oracle query at the"
            " DRIVER's scale factor."
        )
    elif (kept := _kept_line("- `crosscheck", status, today)) is not None:
        lines.append(kept)
    status, bench = stages["bench"]
    if status == "pass" and isinstance(bench, dict):
        lines.append(
            f"- `bench.py` (sf{bench.get('sf')}): {bench.get('n_queries')}"
            f" headline queries in **{bench.get('value')} s**; 24-query"
            f" r4-comparable set {bench.get('value_r4_query_set')} s"
            f" ({bench.get('r4_mode')}, canary {bench.get('canary_s')} s,"
            f" normalized {bench.get('value_r4_normalized')} s);"
            f" streaming {bench.get('streaming_events_per_s'):,} events/s"
            f" ({bench.get('streaming_method', 'single_batch_v1')})."
        )
    elif (kept := _kept_line("- `bench", status, today)) is not None:
        lines.append(kept)
    lines.append(END)
    return "\n".join(lines)


def rewrite_readme(block: str) -> None:
    text = open(README).read()
    pat = re.compile(re.escape(BEGIN) + r".*?" + re.escape(END), re.DOTALL)
    if not pat.search(text):
        raise SystemExit(f"README.md is missing the {BEGIN} / {END} markers")
    open(README, "w").write(pat.sub(block, text))


def main() -> int:
    ok = True
    stages: dict[str, tuple[str, object]] = {
        "pytest": ("skip", None),
        "crosscheck": ("skip", None),
        "bench": ("skip", None),
    }
    if "--skip-pytest" not in sys.argv:
        passed, summary = run_pytest()
        stages["pytest"] = ("pass" if passed else "fail", summary)
        print(f"pytest:     {'PASS' if passed else 'FAIL'} — {summary}")
        ok &= passed
    if "--skip-crosscheck" not in sys.argv:
        passed, summary = run_crosscheck()
        stages["crosscheck"] = ("pass" if passed else "fail", summary)
        print(f"crosscheck: {'PASS' if passed else 'FAIL'} — {summary}")
        ok &= passed
    if "--skip-bench" not in sys.argv:
        passed, bench = run_bench()
        stages["bench"] = ("pass" if passed else "fail", bench)
        print(f"bench:      {'PASS' if passed else 'FAIL'}")
        ok &= passed
    rewrite_readme(render_block(stages))
    print("README verification block refreshed.")
    print("PREFLIGHT", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
