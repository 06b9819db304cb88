"""Decode the self-contained per-query map inside a driver bench
artifact (r17 verdict #2): ``BENCH_r{N}.json``'s final summary line
carries the full per-query timing map compressed as ``queries_z``
(``base64.b85`` over ``zlib``) because the driver's tail-capture window
is 2000 characters and the plain map is ~2.7 KB.

Usage:
    python tools/bench_decode.py BENCH_r18.json        # driver artifact
    python tools/bench_decode.py BENCH_local.json      # already plain
    python tools/bench_decode.py --compare BENCH_r19.json BENCH_r18.json

Prints the artifact's summary fields plus the decoded per-query map as
pretty JSON, sorted by descending time — ready for cross-round diffing
without any second file.

``--compare`` (r18 verdict #1) reproduces the round-over-round story
from the two committed artifacts ALONE: the common-query raw ratio, the
host-drift control ratio (the stable flagship + streaming_tumbling
pair), the host-normalized ratio ``normalized_vs_prev`` =
raw / control, and the per-query movers table. bench.py calls the same
:func:`compare` at artifact-write time, so the number on the summary
line and the number this tool prints can never diverge.
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
    line, or the plain BENCH_local.json full record. Pre-r18 driver
    artifacts carry no ``queries_z``; for those, salvage whatever
    per-query pairs survive in the tail's full-line fragment (partial —
    compare() intersects on common names, so a salvaged prefix still
    yields an honest common-set ratio)."""
    with open(path) as fh:
        doc = json.load(fh)
    rec = doc.get("parsed", doc) if isinstance(doc, dict) else doc
    if rec is None:
        raise SystemExit(f"{path}: parsed is null — tail was truncated")
    out = {k: v for k, v in rec.items() if k != "queries_z"}
    if "queries_z" in rec:
        out["queries"] = decode_queries_z(rec["queries_z"])
    elif "queries" not in rec and isinstance(doc, dict) and doc.get("tail"):
        import re

        frag = doc["tail"].rsplit("\n", 1)[0]  # full-line fragment
        # Salvage ONLY the "queries" sub-object (r19 advice #3: a flat
        # key/number regex over the whole line could sweep nested
        # non-query numeric keys — components_chain/control scalars —
        # into the map and skew the common-set ratio). queries is the
        # FIRST nested object in the summary line and is flat
        # name -> number, so the first '}' at-or-after its text closes
        # it. Two fragment shapes: (a) the opener survived the cut —
        # decode from it to the first '}'; (b) the fragment starts
        # MID-object (the usual driver truncation) — everything before
        # the first '}' is queries remainder, and any pre-queries
        # summary scalars were cut along with the opener. The scalar
        # exclusion set stays as belt-and-braces for a cut landing
        # after the queries object closed.
        m = re.search(r'"queries"\s*:\s*\{', frag)
        body = frag[m.end():] if m else frag
        end = body.find("}")
        if end >= 0:
            body = body[:end]
        scalar = {"value", "sf", "n_edges", "num_partitions", "rounds"}
        pairs = {
            k: float(v)
            for k, v in re.findall(r'"(\w+)"\s*:\s*([0-9][0-9.]*)', body)
            if k not in scalar
        }
        if pairs:
            out["queries"] = pairs
            out["queries_salvaged_from_tail"] = True
    return out


def compare(curr: dict, prev: dict, n_movers: int = 10) -> dict:
    """Round-over-round comparison from two per-query records: the
    raw common-query total ratio, the control-pair host ratio, the
    host-normalized ratio, and the top per-query movers (by |delta|)
    over the common set. Pure arithmetic over the two records — no
    narrative inputs."""
    cq, pq = curr.get("queries") or {}, prev.get("queries") or {}
    common = sorted(set(cq) & set(pq))
    sum_c = sum(cq[k] for k in common)
    sum_p = sum(pq[k] for k in common)
    raw = sum_c / sum_p if sum_p else None
    ctl_c, ctl_p = curr.get("control") or {}, prev.get("control") or {}
    ctl_common = sorted(set(ctl_c) & set(ctl_p))
    ctl_sum_p = sum(ctl_p[k] for k in ctl_common)
    ctl = (
        sum(ctl_c[k] for k in ctl_common) / ctl_sum_p
        if ctl_common and ctl_sum_p
        else None
    )
    norm = raw / ctl if raw is not None and ctl else raw
    movers = sorted(
        ((round(cq[k] - pq[k], 3), k) for k in common),
        key=lambda t: -abs(t[0]),
    )[:n_movers]
    # force-series annotation (r20): an absent "force" field means the
    # r1-r19 count() series. A ratio spanning count -> noop measures
    # the forcing change (count let Catalyst eliminate don't-vanish
    # joins and prune window/agg value expressions), not plan drift —
    # say so in the comparison itself rather than relying on the
    # reader to cross-check two artifacts' force fields.
    f_curr = curr.get("force") or "count"
    f_prev = prev.get("force") or "count"
    out = {
        "n_common": len(common),
        "sum_curr": round(sum_c, 3),
        "sum_prev": round(sum_p, 3),
        "raw_ratio": round(raw, 4) if raw is not None else None,
        "control_ratio": round(ctl, 4) if ctl is not None else None,
        "normalized_vs_prev": round(norm, 4) if norm is not None else None,
        "force_curr": f_curr,
        "force_prev": f_prev,
        "cross_force": f_curr != f_prev,
        "movers": [{"q": k, "delta": d} for d, k in movers],
    }
    if out["cross_force"]:
        out["cross_force_note"] = (
            "ratio spans a forcing change ({} -> {}): it measures the "
            "force delta, not plan drift — read with SCALE.md r20's "
            "count-vs-noop bridge table".format(f_prev, f_curr)
        )
    return out


def main() -> None:
    if len(sys.argv) == 4 and sys.argv[1] == "--compare":
        curr, prev = load_artifact(sys.argv[2]), load_artifact(sys.argv[3])
        out = compare(curr, prev)
        out["curr"], out["prev"] = sys.argv[2], sys.argv[3]
        print(json.dumps(out, indent=1))
        return
    if len(sys.argv) != 2:
        raise SystemExit(__doc__)
    rec = load_artifact(sys.argv[1])
    queries = rec.pop("queries", {})
    print(json.dumps(rec, indent=1))
    for name, t in sorted(queries.items(), key=lambda kv: -kv[1]):
        print(f"{t:8.3f}  {name}")


if __name__ == "__main__":
    main()
