"""Copy the repro/sweep result files from untracked save/ into the
TRACKED artifacts/repro/ directory.

save/ does not survive a VM reset (round 4 lost a half-finished sweep
exactly this way); the result files are tiny JSON, so the durable copy
is committed. scripts/write_experiments.py falls back to artifacts/repro/
whenever the live save/ copy is absent, keeping EXPERIMENTS.md rebuildable
from the repo alone.

  python scripts/archive_repro.py   # then: git add artifacts/repro
"""
import os
import shutil

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = os.path.join(REPO, "save", "repro_gender_row")
ARCHIVE = os.path.join(REPO, "artifacts", "repro")

FILES = [
    ("gender", "repro_stats.json"),
    ("asr", "repro_stats.json"),
    ("sweep_results.jsonl",),
    ("vocoder_ab.jsonl",),
    ("attack_results.jsonl",),
]


def archive():
    """Copy every present result file to artifacts/repro. Called by the
    sweep/attack/vocoder harnesses after EVERY row append (VERDICT r4 #6:
    a kill/reset must never again orphan results in save/)."""
    copied = []
    for rel in FILES:
        src = os.path.join(WORK, *rel)
        if not os.path.exists(src):
            continue
        dst = os.path.join(ARCHIVE, *rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copy2(src, dst)
        copied.append(os.path.relpath(dst, REPO))
    return copied


def main():
    copied = archive()
    if copied:
        print("archived:\n  " + "\n  ".join(copied))
    else:
        print("nothing to archive (no result files under save/)")


if __name__ == "__main__":
    main()
