"""CI smoke for bench.py's control flow.

r14 shipped BENCH_r14.json as ``rc: 1, parsed: null``: the
``--write-artifact`` refactor left ``artifact`` unbound on the flag-less
path — exactly how the driver invokes bench.py — and nothing in CI
executed that path (r14 verdict #1). This test runs ``bench.py
--dry-run`` (full argument/artifact/summary control flow, no Spark, no
testdata) and asserts the contract the driver depends on: exit 0 and a
final stdout line that parses as the short summary record.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*flags: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), *flags],
        capture_output=True,
        text=True,
        timeout=120,
        cwd=REPO,
    )


def test_bench_flagless_path_exits_zero_with_parseable_tail():
    proc = _run("--dry-run")
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) >= 2, proc.stdout
    full = json.loads(lines[-2])
    summary = json.loads(lines[-1])
    assert summary["metric"] == "headline_suite_total"
    assert summary["unit"] == "sec"
    assert summary["detail"] == "not-written"  # flag-less: no artifact
    assert summary["n_queries"] == len(full["queries"])
    assert set(full) >= {"metric", "value", "unit", "queries", "sf"}


def test_bench_dry_run_never_writes_artifact():
    # --write-artifact + --dry-run must not clobber the committed
    # artifact of record with a zero-filled record
    before = os.path.getmtime(os.path.join(REPO, "BENCH_local.json"))
    proc = _run("--dry-run", "--write-artifact")
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.splitlines()[-1])
    assert summary["detail"] == "not-written"
    assert os.path.getmtime(os.path.join(REPO, "BENCH_local.json")) == before


def test_bench_summary_line_is_self_contained_and_fits_tail_window():
    """r17 verdict #2: the driver records only a 2000-char stdout tail
    (measured across BENCH_r12-r17) and parses its LAST JSON line; the
    summary line must therefore (a) stay under the window with margin
    and (b) carry the FULL per-query map, compressed, so cross-round
    per-query diffs never depend on the committed BENCH_local.json."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from bench_decode import decode_queries_z

    proc = _run("--dry-run")
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    full = json.loads(lines[-2])
    summary = json.loads(lines[-1])
    assert len(lines[-1]) <= 1980, len(lines[-1])
    assert summary["codec"] == "zlib+b85"
    # the compressed map carries 2dp (10 ms granularity, an order under
    # the host-variance band); BENCH_local.json keeps the 3dp record
    assert decode_queries_z(summary["queries_z"]) == {
        k: round(v, 2) for k, v in full["queries"].items()
    }


def test_bench_decode_handles_driver_artifact_shape(tmp_path):
    # the driver wraps the parsed summary as {n, rc, tail, parsed}
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import zlib, base64
    from bench_decode import load_artifact

    qmap = {"q1": 1.25, "q2": 0.5}
    qz = base64.b85encode(
        zlib.compress(json.dumps(qmap, separators=(",", ":")).encode(), 9)
    ).decode()
    art = tmp_path / "BENCH_rX.json"
    art.write_text(json.dumps({
        "n": 99, "rc": 0,
        "parsed": {"metric": "headline_suite_total", "value": 1.75,
                   "codec": "zlib+b85", "queries_z": qz},
    }))
    rec = load_artifact(str(art))
    assert rec["queries"] == qmap and "queries_z" not in rec
