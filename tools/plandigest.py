#!/usr/bin/env python3
"""Plan digests for round-over-round regression detection.

Bench captures every query's AQE-final EXPLAIN FORMATTED to
target/plans/<query>.txt. Those plans embed volatile ids (expression #ids,
plan_id, query-stage numbers, codegen ids, partition counts, absolute
paths), so raw diffs are noisy. This tool normalizes each plan down to its
operator structure and emits one digest line per query; committing the
digest file (PLANS_r{N}.digest) lets the next round separate "the plan
changed" from "the environment drifted" with a one-line diff.

Usage:
  python3 tools/plandigest.py target/plans PLANS_r04.digest   # write
  python3 tools/plandigest.py --diff OLD.digest NEW.digest    # compare
"""
import hashlib
import os
import re
import sys

VOLATILE = [
    (re.compile(r"#\d+[L]?"), "#"),            # expression ids
    (re.compile(r"plan_id=\d+"), "plan_id="),
    (re.compile(r"\[id=[^\]]*\]"), ""),
    (re.compile(r"codegen id : \d+"), "codegen"),
    (re.compile(r"(Shuffle|Broadcast|Result)QueryStage \d+"), r"\1QueryStage"),
    (re.compile(r"\(\d+\)"), ""),              # node numbering
    (re.compile(r"\*\(\d+\)"), "*"),           # whole-stage codegen spans
    (re.compile(r"hashpartitioning\(([^,]+), \d+\)"), r"hashpartitioning(\1)"),
    (re.compile(r"rangepartitioning\((.+?), \d+\)"), r"rangepartitioning(\1)"),
    (re.compile(r"file:[^\s,\]]+"), "file:"),  # absolute paths
    (re.compile(r"lambda x_\d+"), "lambda x"),
    (re.compile(r"Statistics\([^)]*\)"), ""),
]


def normalize(text: str) -> str:
    # keep only the operator-tree section (before the per-node detail dump,
    # whose first "(1) ..." heading starts a blank-line-separated block)
    tree = text.split("\n\n")[0]
    out = []
    for line in tree.splitlines():
        for pat, rep in VOLATILE:
            line = pat.sub(rep, line)
        line = line.strip()
        if line:
            out.append(line)
    return "\n".join(out)


def digest_dir(plans_dir: str) -> dict:
    digests = {}
    for name in sorted(os.listdir(plans_dir)):
        if not name.endswith(".txt"):
            continue
        with open(os.path.join(plans_dir, name)) as f:
            norm = normalize(f.read())
        digests[name[:-4]] = hashlib.md5(norm.encode()).hexdigest()[:16]
    return digests


def load(path: str) -> dict:
    with open(path) as f:
        return dict(line.split() for line in f if line.strip())


def main() -> int:
    if len(sys.argv) == 4 and sys.argv[1] == "--diff":
        old, new = load(sys.argv[2]), load(sys.argv[3])
        changed = sorted(q for q in old.keys() & new.keys() if old[q] != new[q])
        added = sorted(new.keys() - old.keys())
        removed = sorted(old.keys() - new.keys())
        for q in changed:
            print(f"CHANGED {q}")
        for q in added:
            print(f"ADDED   {q}")
        for q in removed:
            print(f"REMOVED {q}")
        print(f"== {len(changed)} changed, {len(added)} added, "
              f"{len(removed)} removed, {len(old.keys() & new.keys()) - len(changed)} stable ==")
        return 0
    if len(sys.argv) == 3:
        digests = digest_dir(sys.argv[1])
        with open(sys.argv[2], "w") as f:
            for q, d in sorted(digests.items()):
                f.write(f"{q} {d}\n")
        print(f"wrote {len(digests)} digests to {sys.argv[2]}")
        return 0
    print(__doc__)
    return 1


if __name__ == "__main__":
    sys.exit(main())
