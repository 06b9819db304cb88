"""Decode the self-contained per-query map inside a driver bench
artifact (r17 verdict #2): ``BENCH_r{N}.json``'s final summary line
carries the full per-query timing map compressed as ``queries_z``
(``base64.b85`` over ``zlib``) because the driver's tail-capture window
is 2000 characters and the plain map is ~2.7 KB.

Usage:
    python tools/bench_decode.py BENCH_r18.json        # driver artifact
    python tools/bench_decode.py BENCH_local.json      # already plain

Prints the artifact's summary fields plus the decoded per-query map as
pretty JSON, sorted by descending time — ready for cross-round diffing
without any second file.
"""

from __future__ import annotations

import base64
import json
import sys
import zlib


def decode_queries_z(s: str) -> dict[str, float]:
    """Inverse of bench.py's encoding: b85 → zlib → JSON map."""
    return json.loads(zlib.decompress(base64.b85decode(s)).decode())


def load_artifact(path: str) -> dict:
    """Accept a driver artifact ({n, rc, tail, parsed}), a raw summary
    line, or the plain BENCH_local.json full record."""
    with open(path) as fh:
        doc = json.load(fh)
    rec = doc.get("parsed", doc) if isinstance(doc, dict) else doc
    if rec is None:
        raise SystemExit(f"{path}: parsed is null — tail was truncated")
    out = {k: v for k, v in rec.items() if k != "queries_z"}
    if "queries_z" in rec:
        out["queries"] = decode_queries_z(rec["queries_z"])
    return out


def main() -> None:
    if len(sys.argv) != 2:
        raise SystemExit(__doc__)
    rec = load_artifact(sys.argv[1])
    queries = rec.pop("queries", {})
    print(json.dumps(rec, indent=1))
    for name, t in sorted(queries.items(), key=lambda kv: -kv[1]):
        print(f"{t:8.3f}  {name}")


if __name__ == "__main__":
    main()
