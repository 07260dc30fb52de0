#!/usr/bin/env python3
"""Generate src/main/resources/graft/bench_bands.json — the per-key
expected bench readings (seconds) the Bench band guard compares against
(r13 verdict Next #1).

Input: one or more BENCH_FULL.json artifacts (typically the last few
committed versions: `git show <rev>:BENCH_FULL.json > /tmp/b_<rev>.json`,
plus the driver's own BENCH_r{N}.json when it parses). Per key the band
is the MEDIAN across artifacts — robust to the single-run outliers the
guard exists to catch (BENCH_r13.json carried q_substring_trim_exact at
79 s against a 8.5–14.4 s cross-round band), and to whole-run-slow
driver windows (r14) once enough quiet runs surround them.

Keys: suite/headline names verbatim from `queries`; d-series trend
points as `<key>_10x` (scale10x) and `<key>_1x` (scale10x_controls);
since r15 the plan-pinned hand-SQL controls as `<key>_ctl` (`controls`)
and the start-of-run probe calibration as `machine_probe`
(`machine_probe_s`) — the denominators of Bench's machine_index
run-speed normalizer (r14 verdict #2).

Suite-tail rotation (r14 verdict #4) means a rotated-out key is simply
absent from that round's `queries` map — the median here automatically
carries its band forward from the rounds it did run, so feed ≥4
artifacts to keep ≥2 readings per rotated key.

`--carry prev_bands.json` keeps the previous band for any key absent
from EVERY input artifact (r16: the four post-fix artifacts all shared
one rotation parity — the count-based parity bug — so the other
rotation half appeared in none of them; dropping those keys would
un-rotate them into `unbanded`). Carried keys are by definition keys
the inputs never re-measured, so the old median is still the best
available estimate.

Usage: python3 dev/make_bands.py [--carry prev.json] artifact1.json \
         [artifact2.json ...] > src/main/resources/graft/bench_bands.json
"""
import json, statistics, sys


def main():
    args = sys.argv[1:]
    carry = {}
    if args and args[0] == "--carry":
        carry = json.load(open(args[1]))
        args = args[2:]
    per_key = {}
    for path in args:
        art = json.load(open(path))
        for key, val in art.get("queries", {}).items():
            per_key.setdefault(key, []).append(float(val))
        for key, val in art.get("scale10x", {}).items():
            per_key.setdefault(key + "_10x", []).append(float(val))
        for key, val in art.get("scale10x_controls", {}).items():
            per_key.setdefault(key + "_1x", []).append(float(val))
        for key, val in art.get("controls", {}).items():
            per_key.setdefault(key + "_ctl", []).append(float(val))
        for field, key in (("machine_probe_s", "machine_probe"),
                           ("machine_hash_probe_s", "machine_hash_probe"),
                           ("machine_write_probe_s", "machine_write_probe")):
            probe = art.get(field, -1)
            if isinstance(probe, (int, float)) and probe > 0:
                per_key.setdefault(key, []).append(float(probe))
    bands = {k: round(statistics.median(v), 3)
             for k, v in sorted(per_key.items())}
    carried = {k: v for k, v in carry.items() if k not in bands}
    if carried:
        print(f"[make_bands] carried {len(carried)} keys absent from "
              f"every input: {sorted(carried)[:6]}...", file=sys.stderr)
    bands = dict(sorted({**carried, **bands}.items()))
    json.dump(bands, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
