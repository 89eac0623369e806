"""Round-over-round bench comparison: python tools/bench_diff.py OLD NEW
[threshold] — prints per-query deltas sorted by regression factor,
flagging entries slower than threshold× (default 1.5) or newly failing.
Entries absent from OLD are listed as new."""
import json
import sys


def _queries(path: str) -> dict:
    """Accept bench.py's own JSON line, the driver's BENCH_r{N}.json
    wrapper (bench line inside its `tail` string), or a raw output file
    containing the line."""
    text = open(path).read()
    try:
        d = json.loads(text)
    except ValueError:
        d = None
    if isinstance(d, dict) and "queries" in d:
        return d["queries"]
    src = d.get("tail", "") if isinstance(d, dict) else text
    for line in reversed(src.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                parsed = json.loads(line)
            except ValueError:
                continue
            if "queries" in parsed:
                return parsed["queries"]
    # driver tails can truncate mid-JSON: salvage the "name": float pairs
    import re

    pairs = re.findall(r'"([a-z0-9_]+)":\s*(-?\d+(?:\.\d+)?)', src)
    qs = {k: float(v) for k, v in pairs
          if k not in ("n", "rc", "cpus", "sf", "value")}
    if qs:
        return qs
    raise SystemExit(f"no bench queries found in {path}")


def main() -> None:
    old_p, new_p = sys.argv[1], sys.argv[2]
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old = _queries(old_p)
    new = _queries(new_p)
    rows = []
    for k, nv in new.items():
        ov = old.get(k)
        if ov is None:
            rows.append((0.0, f"  NEW   {nv:8.2f}s  {k}"))
        elif nv < 0 <= ov:
            rows.append((999.0, f"  FAIL  (was {ov:.2f}s)  {k}"))
        elif nv < 0 and ov < 0:
            rows.append((998.0, f"  FAIL  (both rounds)  {k}"))
        elif ov <= 0:
            # recovered from failure, or a 0.0 old time (no ratio exists)
            rows.append((0.0, f"  RECOV {nv:8.2f}s  (was failing)  {k}"))
        else:
            f = nv / ov
            flag = "REGR " if f > thresh else "     "
            rows.append((f, f"  {flag} {ov:8.2f}s -> {nv:8.2f}s  ({f:4.2f}x)  {k}"))
    try:
        for _, line in sorted(rows, reverse=True):
            print(line)
        gone = [k for k in old if k not in new]
        if gone:
            print("dropped:", ", ".join(gone))
    except BrokenPipeError:  # | head
        pass


if __name__ == "__main__":
    main()
