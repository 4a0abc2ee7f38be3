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

Round 13 adds a THIRD hash (xshape): the shape normalization with
Exchange/exchange-reuse lines ALSO dropped. It exists for exactly one
ledgered class — AQE's borderline stats-threshold conversions, where a
runtime size estimate crossing the broadcast threshold adds/removes an
Exchange on byte-identical code (rounds 8-12 hand-re-inspected the same
~7 rows every re-pin). A row prints LEDGERED instead of CHANGED only
when BOTH gates hold: its xshape hash is unchanged (the delta is
exchange-only — scans, aggregates, windows, pushed filters, join count
all identical) AND the query is named in the committed allowlist
(--ledger tools/flap_ledger.txt; names are added only after a human
inspection concluded the flip is the benign threshold class). An
exchange delta on an un-ledgered query stays CHANGED — added shuffles
are sometimes real regressions, so the intrinsic test alone is not
enough to silence one.

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


def xshape_normalize(shaped: str) -> str:
    # the exchange-insensitive shape: drop Exchange / ReusedExchange lines
    # (hash AND range partitionings — a borderline AQE conversion can
    # remove either). Everything else — scans, filters, aggregates,
    # windows, joins (already collapsed), generators — stays.
    if "CartesianProduct" in shaped:
        return shaped
    return "\n".join(
        l for l in shaped.splitlines()
        if not l.startswith("Exchange") and not l.startswith("ReusedExchange"))


def digest_dir(plans_dir: str) -> dict:
    digests = {}
    for name in sorted(os.listdir(plans_dir)):
        if not name.endswith(".txt"):
            continue
        with open(os.path.join(plans_dir, name)) as f:
            norm = normalize(f.read())
        full = hashlib.md5(norm.encode()).hexdigest()[:16]
        shaped = shape_normalize(norm)
        shape = hashlib.md5(shaped.encode()).hexdigest()[:16]
        xshape = hashlib.md5(xshape_normalize(shaped).encode()).hexdigest()[:16]
        digests[name[:-4]] = (full, shape, xshape)
    return digests


def load(path: str) -> dict:
    out = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) == 2:          # pre-round-12 single-hash format
                out[parts[0]] = (parts[1], None, None)
            elif len(parts) == 3:        # round-12 two-hash format
                out[parts[0]] = (parts[1], parts[2], None)
            elif len(parts) == 4:
                out[parts[0]] = (parts[1], parts[2], parts[3])
    return out


def load_ledger(path: str) -> set:
    names = set()
    try:
        with open(path) as f:
            for line in f:
                line = line.split("#")[0].strip()
                if line:
                    names.add(line.split()[0])
    except FileNotFoundError:
        pass
    return names


def main() -> int:
    argv = list(sys.argv[1:])
    ledger = set()
    if "--ledger" in argv:
        i = argv.index("--ledger")
        ledger = load_ledger(argv[i + 1])
        del argv[i:i + 2]
    if len(argv) == 3 and argv[0] == "--diff":
        old, new = load(argv[1]), load(argv[2])
        both = old.keys() & new.keys()
        changed, flaps, ledgered = [], [], []
        for q in sorted(both):
            (of, os_, ox), (nf, ns, nx) = old[q], new[q]
            if of == nf:
                continue
            if os_ is not None and ns is not None and os_ == ns:
                flaps.append(q)
            elif (ox is not None and nx is not None and ox == nx
                  and q in ledger):
                ledgered.append(q)
            else:
                changed.append(q)
        added = sorted(new.keys() - old.keys())
        removed = sorted(old.keys() - new.keys())
        for q in changed:
            print(f"CHANGED {q}")
        for q in ledgered:
            print(f"LEDGERED {q}  (stats-threshold exchange flap, "
                  "inspected — see flap_ledger)")
        for q in flaps:
            print(f"FLAP    {q}  (benign broadcast-strategy class)")
        for q in added:
            print(f"ADDED   {q}")
        for q in removed:
            print(f"REMOVED {q}")
        print(f"== {len(changed)} changed, {len(flaps)} flaps, "
              f"{len(ledgered)} ledgered, "
              f"{len(added)} added, {len(removed)} removed, "
              f"{len(both) - len(changed) - len(flaps) - len(ledgered)} "
              "stable ==")
        return 0
    if len(argv) == 2:
        digests = digest_dir(argv[0])
        with open(argv[1], "w") as f:
            for q, (full, shape, xshape) in sorted(digests.items()):
                f.write(f"{q} {full} {shape} {xshape}\n")
        print(f"wrote {len(digests)} digests to {argv[1]}")
        return 0
    print(__doc__)
    return 1


if __name__ == "__main__":
    sys.exit(main())
