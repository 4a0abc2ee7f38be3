#!/usr/bin/env python3
"""Plan digests for round-over-round regression detection.

Bench captures every query's AQE-final EXPLAIN FORMATTED to
target/plans/<query>.txt. Those plans embed volatile ids (expression #ids,
plan_id, query-stage numbers, codegen ids, partition counts, absolute
paths), so raw diffs are noisy. This tool normalizes each plan down to its
operator structure and emits one digest line per query; committing the
digest file (PLANS_r{N}.digest) lets the next round separate "the plan
changed" from "the environment drifted" with a one-line diff.

Each line carries TWO hashes: `query fullhash shapehash`.

- fullhash: the strict normalization (everything above).
- shapehash: the STRATEGY-INVARIANT normalization — all four join
  strategy labels (BroadcastHash/BroadcastNestedLoop/SortMerge/
  ShuffledHash, with their build-side/type detail) collapse to one
  token; broadcast-exchange modes, bare Sort nodes (sort-merge
  scaffolding) and AQEShuffleRead (runtime coalesce) are dropped; and
  the surviving operator lines are hashed as a SORTED multiset, because
  a build-side swap reorders whole subtrees. Rounds 8-11 re-inspected
  the same ~8 queries every re-pin because AQE's runtime strategy
  choice flips on borderline stats while the plan is semantically
  identical; strategy and operator order are exactly what AQE is FREE
  to pick per run, so they do not belong in the regression shape —
  added/removed exchanges, scans, aggregates, windows, pushed-filter
  content, and cartesians (never normalized) remain visible.

--diff classifies: a row whose SHAPE hash moved prints CHANGED (a real
plan change — inspect it); a row where only the FULL hash moved prints
FLAP (the whitelisted broadcast-strategy class — no action needed). A
diff against an old single-hash digest falls back to full-hash-only
comparison (every difference prints CHANGED, as before).

CartesianProduct is NEVER normalized away — a flap into a cartesian is a
real change by definition, so the shape normalizer refuses to touch any
plan containing one.

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

# the benign AQE strategy-flap classes: BHJ <-> BNLJ on a broadcast side
# (1-row/bounded broadcasts) and the borderline SMJ <-> BHJ conversion
# (the round-6 "teravalidate" class). The shape hash is made
# STRATEGY-INVARIANT: all four join strategy labels collapse to one
# token, the broadcast exchange's mode detail is dropped, and the Sort
# nodes that exist only as SMJ scaffolding are dropped (SortAggregate /
# TakeOrdered are NOT — only the bare Sort operator). Real structural
# changes stay visible: scans, pushed filters, shuffle exchanges,
# aggregates, windows — and a join degrading to CartesianProduct is
# never normalized (see shape_normalize's refusal below).
SHAPE = [
    (re.compile(
        r"(BroadcastHashJoin|BroadcastNestedLoopJoin|SortMergeJoin|ShuffledHashJoin).*"),
     "Join"),
    (re.compile(r"BroadcastExchange.*"), "BroadcastExchange"),
]

_SORT_NODE = re.compile(r"Sort($|\s|\[)")


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


def shape_normalize(norm: str) -> str:
    # a flap INTO a cartesian is a real change — never normalize those plans
    if "CartesianProduct" in norm:
        return norm
    out = []
    for line in norm.splitlines():
        core = re.sub(r"^[\s:+\-*]+", "", line)
        if _SORT_NODE.match(core) or core.startswith("AQEShuffleRead"):
            # SMJ scaffolding / runtime coalesce — strategy artifacts
            continue
        for pat, rep in SHAPE:
            core = pat.sub(rep, core)
        out.append(core)
    # SORTED multiset of operator lines, not the tree order: a strategy
    # flap that swaps build sides reorders the children's whole subtrees,
    # which no line-local rewrite can absorb. Structural changes that
    # matter (an extra Exchange, a new scan, a lost pushed filter, a
    # cartesian) all change line CONTENT or the multiset itself and stay
    # visible; pure operator reordering is the optimizer's prerogative.
    return "\n".join(sorted(out))


def digest_dir(plans_dir: str) -> dict:
    digests = {}
    for name in sorted(os.listdir(plans_dir)):
        if not name.endswith(".txt"):
            continue
        with open(os.path.join(plans_dir, name)) as f:
            norm = normalize(f.read())
        full = hashlib.md5(norm.encode()).hexdigest()[:16]
        shape = hashlib.md5(shape_normalize(norm).encode()).hexdigest()[:16]
        digests[name[:-4]] = (full, shape)
    return digests


def load(path: str) -> dict:
    out = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) == 2:          # pre-round-12 single-hash format
                out[parts[0]] = (parts[1], None)
            elif len(parts) == 3:
                out[parts[0]] = (parts[1], parts[2])
    return out


def main() -> int:
    if len(sys.argv) == 4 and sys.argv[1] == "--diff":
        old, new = load(sys.argv[2]), load(sys.argv[3])
        both = old.keys() & new.keys()
        changed, flaps = [], []
        for q in sorted(both):
            (of, os_), (nf, ns) = old[q], new[q]
            if of == nf:
                continue
            if os_ is not None and ns is not None and os_ == ns:
                flaps.append(q)
            else:
                changed.append(q)
        added = sorted(new.keys() - old.keys())
        removed = sorted(old.keys() - new.keys())
        for q in changed:
            print(f"CHANGED {q}")
        for q in flaps:
            print(f"FLAP    {q}  (benign broadcast-strategy class)")
        for q in added:
            print(f"ADDED   {q}")
        for q in removed:
            print(f"REMOVED {q}")
        print(f"== {len(changed)} changed, {len(flaps)} flaps, "
              f"{len(added)} added, {len(removed)} removed, "
              f"{len(both) - len(changed) - len(flaps)} stable ==")
        return 0
    if len(sys.argv) == 3:
        digests = digest_dir(sys.argv[1])
        with open(sys.argv[2], "w") as f:
            for q, (full, shape) in sorted(digests.items()):
                f.write(f"{q} {full} {shape}\n")
        print(f"wrote {len(digests)} digests to {sys.argv[2]}")
        return 0
    print(__doc__)
    return 1


if __name__ == "__main__":
    sys.exit(main())
