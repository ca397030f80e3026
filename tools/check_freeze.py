#!/usr/bin/env python3
"""Freeze-order check (r14 verdict #2, made mechanical): every committed
evidence artifact that records the code SHA it was produced on must not
predate the last src/main commit — otherwise the artifact describes a
tree the repo no longer ships (the r14 episode: PLANS.md showed a plan
shape a later commit had already killed, and CORRECTNESS_sf1.json was
recorded two code commits early).

Checked artifacts and where their SHA lives:
  - PLANS.md                  -> "git_head: <sha>" header line
  - CORRECTNESS_sf1.json      -> _meta.git_head

Rule: `git rev-list <recorded>..HEAD -- src/main` must be EMPTY (no
src/main commit after the recorded SHA). Artifacts missing a SHA are
reported stale by definition. Exit 0 = frozen in order; 1 = stale.

Usage: python3 tools/check_freeze.py [repo_root=.]
"""
import json, os, re, subprocess, sys

root = sys.argv[1] if len(sys.argv) > 1 else "."


def git(*args):
    return subprocess.run(["git", "-C", root] + list(args),
                          capture_output=True, text=True)


def code_commits_after(sha):
    """src/main commits after `sha` (None if sha unknown to git)."""
    r = git("rev-list", f"{sha}..HEAD", "--", "src/main")
    if r.returncode != 0:
        return None
    return [c for c in r.stdout.split() if c]


def sha_of_plans():
    path = os.path.join(root, "PLANS.md")
    if not os.path.exists(path):
        return ("missing", None)
    head = open(path, encoding="utf-8").read(2000)
    # a "-dirty" suffix (PlanDump stamps it when src/main had
    # uncommitted changes at record time) is stale by definition: the
    # artifact describes code no commit ships (r15 ADVICE)
    if re.search(r"^git_head:\s*[0-9a-f]{7,40}-dirty", head, re.M):
        return ("dirty-stamped", None)
    m = re.search(r"^git_head:\s*([0-9a-f]{7,40})\s*$", head, re.M)
    return ("ok", m.group(1)) if m else ("no-sha", None)


def sha_of_sf1():
    path = os.path.join(root, "CORRECTNESS_sf1.json")
    if not os.path.exists(path):
        return ("missing", None)
    try:
        meta = json.load(open(path, encoding="utf-8")).get("_meta", {})
        sha = meta.get("git_head")
        if sha and str(sha).endswith("-dirty"):
            return ("dirty-stamped", None)
        return ("ok", sha) if sha else ("no-sha", None)
    except Exception as e:
        return (f"unreadable ({e})", None)


stale = []
for name, (status, sha) in [("PLANS.md", sha_of_plans()),
                            ("CORRECTNESS_sf1.json", sha_of_sf1())]:
    if status == "missing":
        print(f"[freeze] {name}: MISSING")
        stale.append(name)
        continue
    if sha is None:
        print(f"[freeze] {name}: {status} — no recorded SHA, stale by definition")
        stale.append(name)
        continue
    after = code_commits_after(sha)
    if after is None:
        print(f"[freeze] {name}: recorded SHA {sha[:9]} unknown to this repo")
        stale.append(name)
    elif after:
        print(f"[freeze] {name}: STALE — {len(after)} src/main commit(s) "
              f"after recorded {sha[:9]} (newest {after[0][:9]})")
        stale.append(name)
    else:
        print(f"[freeze] {name}: ok at {sha[:9]}")

if stale:
    print(f"[freeze] STALE: {stale} — re-record on the current code SHA "
          "(sbt 'runMain graft.PlanDump'; tools/check_oracle_budget.py for sf1)")
    sys.exit(1)
print("[freeze] all artifacts at or after the last src/main commit")
