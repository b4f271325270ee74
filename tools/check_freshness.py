"""Evidence-freshness budget for the driver correctness rotation
(r8 VERDICT #6: the round's only real findings — stale dedup evidence,
untested late keys — would both have been machine-caught).

A key's driver evidence is STALE when any of:

- it has never produced a green CORRECTNESS row (rows + schema + hash
  all true, no err), or its latest row is red;
- its query/oracle TEXT changed after its latest green row (tracked by
  a fingerprint manifest, ``tools/key_text_manifest.json`` — the
  sha256 of the key's query-function source + oracle SQL; rounds are
  per-fingerprint, so a git-blame pass is never needed);
- its latest green row is older than the freshness budget
  (``MAX_AGE_ROUNDS`` — the 50-key fold cycles the whole surface in
  ~5 rounds).

The check PASSES when every stale key sits inside the upcoming fold
(the first 50 ``_PRIORITY_R0x`` entries) — stale-and-scheduled is the
rotation working as designed; stale-and-unscheduled fails the build.

Boundary slack (r10 VERDICT #3 — the gate red-ded the repo at every
round boundary by design): when the newest ``_PRIORITY_R{N}`` is
exactly ONE round behind the current round (the driver just dropped a
new CORRECTNESS artifact and the next fold hasn't shipped yet), keys
whose age-staleness is exactly one round over budget WARN instead of
fail — they were fresh when the shipped fold was built.  Two or more
rounds of staleness, text-changed keys, and never-green keys still
fail: a never-green key auto-joins EVERY fold until green (r10
VERDICT #7), slack or no slack.

Usage:
    python tools/check_freshness.py           # check (CI chain)
    python tools/check_freshness.py --update  # re-record fingerprints
        for keys whose text changed (stamps them with the CURRENT
        round, which forces them into the fold until re-certified)
"""

from __future__ import annotations

import glob
import hashlib
import inspect
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
MANIFEST = os.path.join(HERE, "key_text_manifest.json")
MAX_AGE_ROUNDS = 5
FOLD = 50


def _green(rec: dict) -> bool:
    return bool(rec.get("rows_match") and rec.get("schema_match")
                and rec.get("hash_match") and not rec.get("err"))


def load_evidence() -> tuple[int, dict[str, int], dict[str, int]]:
    """Returns (current_round, latest_green_round, latest_any_round)."""
    green: dict[str, int] = {}
    seen: dict[str, int] = {}
    rounds = []
    for path in sorted(glob.glob(os.path.join(REPO,
                                              "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        rounds.append(rnd)
        for key, rec in json.load(open(path)).items():
            seen[key] = max(seen.get(key, 0), rnd)
            if _green(rec):
                green[key] = max(green.get(key, 0), rnd)
    current = (max(rounds) + 1) if rounds else 1
    return current, green, seen


def fingerprints() -> dict[str, str]:
    import __spark_entry__ as E
    qs, oracles = E.queries(), E.oracle_sql()
    out = {}
    for key, fn in qs.items():
        try:
            src = inspect.getsource(fn)
        except (OSError, TypeError):
            src = repr(fn)
        blob = src + "\n--oracle--\n" + oracles.get(key, "")
        out[key] = hashlib.sha256(blob.encode()).hexdigest()[:16]
    return out


def evaluate(current: int, green: dict[str, int], fps: dict[str, str],
             manifest: dict[str, dict], fold: set[str],
             fold_round: int,
             seen: dict[str, int] | None = None
             ) -> tuple[list, set, list, list]:
    """Pure staleness classification (unit-tested in
    tests/test_entry_contract.py) -> (changed, stale, problems,
    warnings).  ``problems`` fail the gate; ``warnings`` are the
    one-round boundary-slack class (r10 VERDICT #3).  ``seen`` is the
    latest round each key appeared in ANY row — a key whose latest
    row is newer than its latest green row REGRESSED red and is
    stale with no slack (r15 review: the docstring promised this
    class but load_evidence's latest-any map was being discarded,
    so a red regression after an old green passed as fresh)."""
    seen = seen or {}
    # the one-round boundary window: the driver advanced the round but
    # the next fold hasn't shipped yet — age-overage-by-one keys warn
    boundary_slack = fold_round == current - 1

    changed, stale, problems, warnings = [], set(), [], []
    for key, fp in fps.items():
        ent = manifest.get(key)
        if ent is None or ent["fp"] != fp:
            changed.append(key)
            # text is new (or changed): current text exists as of NOW
            text_round = current
        else:
            text_round = ent["text_round"]
        g = green.get(key, 0)
        stale_reasons, soft = [], False
        if g == 0:
            # never-green keys auto-join EVERY fold until green — no
            # slack ever (r10 VERDICT #7)
            stale_reasons.append("never driver-green")
        elif seen.get(key, 0) > g:
            # the key REGRESSED: a row newer than its last green is
            # red — no slack ever
            stale_reasons.append(
                f"latest row (r{seen[key]}) is red; last green r{g}")
        elif g < text_round:
            stale_reasons.append(
                f"text newer (r{text_round}) than last green (r{g})")
        elif current - g > MAX_AGE_ROUNDS:
            over = current - g - MAX_AGE_ROUNDS
            stale_reasons.append(
                f"evidence r{g} older than {MAX_AGE_ROUNDS} rounds")
            # fresh when the shipped fold was built, stale only because
            # the driver advanced the round -> warn for exactly one
            # round of slack; 2+ rounds over budget always fail
            soft = boundary_slack and over == 1
        if stale_reasons:
            stale.add(key)
            if key not in fold:
                msg = (f"{key}: {'; '.join(stale_reasons)} "
                       f"and NOT in the upcoming fold")
                (warnings if soft else problems).append(msg)
    return changed, stale, problems, warnings


def main() -> int:
    update = "--update" in sys.argv
    current, green, seen = load_evidence()
    fps = fingerprints()

    manifest: dict[str, dict] = {}
    bootstrap = not os.path.exists(MANIFEST)
    if not bootstrap:
        manifest = json.load(open(MANIFEST))
    else:
        # first run: assume every key's current text is the text its
        # latest green row certified (keys ACTUALLY changed in the
        # bootstrap round must be in that round's fold — which this
        # round's rotation already guarantees for r9's changed keys);
        # never-green keys stamp as current so they stay flagged
        manifest = {k: {"fp": fps[k],
                        "text_round": green.get(k, current)}
                    for k in fps}

    import __spark_entry__ as E
    # resolve the rotation list by pattern so renames (_PRIORITY_R09 ->
    # _PRIORITY_R10 -> ...) keep being read explicitly instead of
    # silently falling back to queries() order (ADVICE r9)
    # numeric sort: lexicographic would pick _PRIORITY_R9 over
    # _PRIORITY_R10 when a transition commit keeps both (r10 review)
    pri_names = sorted((n for n in dir(E)
                        if re.fullmatch(r"_PRIORITY_R\d+", n)),
                       key=lambda n: int(n.rsplit("R", 1)[1]))
    if not pri_names:
        # fail LOUDLY: silently falling back to queries() order with
        # fold_round=0 would disable boundary slack and hard-fail
        # every overage key on a mere rename (r11 ADVICE #4)
        print("FRESHNESS CHECK: FAIL — no _PRIORITY_R<n> rotation "
              "list found in __spark_entry__ (renamed without the "
              "pattern?); the fold cannot be resolved")
        sys.exit(1)
    fold = set(getattr(E, pri_names[-1])[:FOLD])
    fold_round = int(pri_names[-1].rsplit("R", 1)[1])
    changed, stale, problems, warnings = evaluate(
        current, green, fps, manifest, fold, fold_round, seen=seen)

    if changed and not update:
        print(f"# {len(changed)} key(s) have unrecorded text "
              f"fingerprints: {sorted(changed)[:10]}"
              + (" ..." if len(changed) > 10 else ""))
        print("# run with --update after confirming each is in the "
              "fold (text changes must re-certify)")

    if update:
        for key in fps:
            ent = manifest.get(key)
            if ent is None or ent["fp"] != fps[key]:
                manifest[key] = {"fp": fps[key], "text_round": current}
        # drop deleted keys
        manifest = {k: v for k, v in manifest.items() if k in fps}
        with open(MANIFEST, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        print(f"# manifest updated: {len(manifest)} keys, "
              f"round {current}")

    if warnings:
        print(f"# WARN (boundary slack, fold r{fold_round} vs round "
              f"{current}): {len(warnings)} key(s) one round over "
              f"budget — ship _PRIORITY_R{current} this round:")
        for w in sorted(warnings):
            print(f"#   {w}")
    if problems:
        print(f"FRESHNESS CHECK: {len(problems)} STALE KEY(S) OUTSIDE "
              f"THE FOLD (round {current}, budget {MAX_AGE_ROUNDS})")
        for p in sorted(problems):
            print(f"  {p}")
        return 1
    print(f"FRESHNESS CHECK: OK — round {current}, {len(fps)} keys, "
          f"{len(fold)} in fold ({len(stale & fold)} of them "
          f"stale-and-scheduled), budget {MAX_AGE_ROUNDS} rounds"
          + (f", {len(warnings)} boundary-slack warning(s)"
             if warnings else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main())
