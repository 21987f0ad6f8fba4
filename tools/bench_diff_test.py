#!/usr/bin/env python3
"""Self-test for bench_diff.py's two flagging arms (r14 verdict #4).

Cases:
  1. sustained sub-floor-delta regression (0.1s -> 0.55s on median AND
     min-of-reps) -> FLAGGED via the second arm.
  2. pure shared-box noise on a fast query (median doubles but the
     min-of-reps holds) -> NOT flagged (printed noise-floor).
  3. classic big regression (2.0s -> 4.0s) -> FLAGGED via the first arm.
  4. sub-floor query with no queries_min in the artifacts -> NOT flagged
     (the second arm needs min-of-reps to discriminate).

Run: python3 tools/bench_diff_test.py  (exit 0 = all pass)
"""
import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
DIFF = os.path.join(HERE, "bench_diff.py")


def artifact(path, queries, qmins=None, anchor=None, anchor_mem=None):
    line = {"metric": "total", "value": sum(queries.values()),
            "unit": "sec", "queries": queries, "reps": 3, "warmup": 1,
            "errors": {}, "sf": "test"}
    if qmins is not None:
        line["queries_min"] = qmins
    if anchor is not None:
        line["anchor"] = {"start": anchor, "mid": anchor, "end": anchor}
    if anchor_mem is not None:
        line["anchor_mem"] = {"start": anchor_mem, "mid": anchor_mem,
                              "end": anchor_mem}
    with open(path, "w") as f:
        f.write(json.dumps(line) + "\n")


def run(prev, cur):
    p = subprocess.run([sys.executable, DIFF, prev, cur],
                       capture_output=True, text=True)
    return p.returncode, p.stdout + p.stderr


def main():
    failures = []
    with tempfile.TemporaryDirectory() as d:
        prev, cur = os.path.join(d, "prev.json"), os.path.join(d, "cur.json")

        # case 1: sustained fast-query regression -> flagged (arm 2)
        artifact(prev, {"q_fast": 0.10}, {"q_fast": 0.09})
        artifact(cur, {"q_fast": 0.55}, {"q_fast": 0.52})
        rc, out = run(prev, cur)
        if rc != 1 or "REGRESSED (sustained)" not in out:
            failures.append(f"case 1: expected sustained flag, rc={rc}\n{out}")

        # case 2: pure noise (median swings, min holds) -> not flagged
        artifact(prev, {"q_fast": 0.20}, {"q_fast": 0.18})
        artifact(cur, {"q_fast": 0.60}, {"q_fast": 0.19})
        rc, out = run(prev, cur)
        if rc != 0 or "REGRESSED" in out or "(noise-floor)" not in out:
            failures.append(f"case 2: expected noise-floor, rc={rc}\n{out}")

        # case 3: classic big regression -> flagged (arm 1)
        artifact(prev, {"q_big": 2.0}, {"q_big": 1.9})
        artifact(cur, {"q_big": 4.0}, {"q_big": 3.8})
        rc, out = run(prev, cur)
        if rc != 1 or "REGRESSED" not in out:
            failures.append(f"case 3: expected arm-1 flag, rc={rc}\n{out}")

        # case 4: no queries_min anywhere -> sub-floor delta not flagged
        artifact(prev, {"q_fast": 0.10})
        artifact(cur, {"q_fast": 0.55})
        rc, out = run(prev, cur)
        if rc != 0 or "REGRESSED" in out:
            failures.append(f"case 4: expected no flag w/o mins, rc={rc}\n{out}")

        # case 5 (r15 verdict #2): a uniformly 1.8x-slower SESSION —
        # every query AND the anchor shifted together — must produce
        # ZERO flags after anchor normalization (r15's driver run was
        # exactly this shape and was unfalsifiable without the anchor)
        artifact(prev, {"q_a": 2.0, "q_b": 0.8, "q_c": 0.3},
                 {"q_a": 1.9, "q_b": 0.75, "q_c": 0.28}, anchor=0.50)
        artifact(cur, {"q_a": 3.6, "q_b": 1.44, "q_c": 0.54},
                 {"q_a": 3.4, "q_b": 1.35, "q_c": 0.50}, anchor=0.90)
        rc, out = run(prev, cur)
        if rc != 0 or "REGRESSED" in out:
            failures.append(f"case 5: uniform-session shift must not flag "
                            f"after anchor normalization, rc={rc}\n{out}")
        if "normalized" not in out:
            failures.append(f"case 5: expected anchor calibration note\n{out}")

        # case 6: a REAL single-query regression inside a steady session
        # (anchor flat, one query 2.5x) -> still flagged with anchors on
        artifact(prev, {"q_a": 2.0, "q_b": 0.8}, {"q_a": 1.9, "q_b": 0.75},
                 anchor=0.50)
        artifact(cur, {"q_a": 5.0, "q_b": 0.82}, {"q_a": 4.8, "q_b": 0.78},
                 anchor=0.51)
        rc, out = run(prev, cur)
        if rc != 1 or "REGRESSED" not in out:
            failures.append(f"case 6: real regression must survive anchor "
                            f"normalization, rc={rc}\n{out}")

        # case 7: real regression RIDING a slow session — q_a is 3.6x raw,
        # 2x after dividing out the 1.8x session — flagged on the
        # normalized ratio, while q_b (pure session shift) stays clean
        artifact(prev, {"q_a": 2.0, "q_b": 0.8}, {"q_a": 1.9, "q_b": 0.75},
                 anchor=0.50)
        artifact(cur, {"q_a": 7.2, "q_b": 1.44}, {"q_a": 7.0, "q_b": 1.35},
                 anchor=0.90)
        rc, out = run(prev, cur)
        if rc != 1 or out.count("REGRESSED") != 1:
            failures.append(f"case 7: expected exactly the real regression "
                            f"flagged under a slow session, rc={rc}\n{out}")

        # case 8 (r16): compute anchor flat but memory anchor 1.8x — a
        # memory-contended session; the disagreement warning must fire
        # (the text-family doubled in exactly this shape on unchanged
        # code) and normalization stays on the compute anchor
        artifact(prev, {"q_a": 2.0}, {"q_a": 1.9}, anchor=0.50,
                 anchor_mem=0.50)
        artifact(cur, {"q_a": 2.1}, {"q_a": 2.0}, anchor=0.51,
                 anchor_mem=0.90)
        rc, out = run(prev, cur)
        if "disagree" not in out:
            failures.append(f"case 8: expected anchor-disagreement warning"
                            f"\n{out}")
        if rc != 0:
            failures.append(f"case 8: near-flat query must not flag, "
                            f"rc={rc}\n{out}")

    with tempfile.TemporaryDirectory() as d:
        prev, cur = os.path.join(d, "prev.json"), os.path.join(d, "cur.json")

        # case 9 (ADVICE r16): a drift line taken in a 2x-slower session
        # than the full-run line it's merged with — the drift query must
        # be normalized by ITS OWN line's anchor (not the blended one), so
        # its 2x raw ratio reads as session speed, not a regression; and
        # the full-vs-drift anchor mismatch warning must fire.
        artifact(prev, {"q_a": 2.0, "q_d": 1.0}, {"q_a": 1.9, "q_d": 0.95},
                 anchor=0.50)
        full = {"metric": "total", "value": 2.1,
                "queries": {"q_a": 2.1}, "queries_min": {"q_a": 2.0},
                "anchor": {"start": 0.5, "mid": 0.5, "end": 0.5}}
        drift = {"metric": "drift", "queries": {"q_d": 2.0},
                 "anchor": {"start": 1.0, "mid": 1.0, "end": 1.0}}
        with open(cur, "w") as f:
            f.write(json.dumps(full) + "\n" + json.dumps(drift) + "\n")
        p = subprocess.run([sys.executable, DIFF, prev, cur,
                            "--include-drift"],
                           capture_output=True, text=True)
        rc, out = p.returncode, p.stdout + p.stderr
        if rc != 0 or "REGRESSED" in out:
            failures.append(f"case 9: drift query at its own session speed "
                            f"must not flag, rc={rc}\n{out}")
        if "different speeds" not in out:
            failures.append(f"case 9: expected drift-anchor mismatch "
                            f"warning\n{out}")

    if failures:
        print("\n\n".join(failures))
        sys.exit(1)
    print("bench_diff_test: 9/9 pass")


if __name__ == "__main__":
    main()
