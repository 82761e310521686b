"""Re-evaluate a finished sweep run under valid_frontier checkpoint
selection (recipes/anonymizer.py eval_ckpt_select) — no retraining: the
adversarial game oscillates epoch to epoch, so end-of-run utility-top-k
averaging can land on a privacy-poor point; the frontier pick selects the
epoch whose VALID ACC_external is closest to chance subject to a utility
floor, and this script records the resulting TEST row as a new variant
``<name>_frontier`` in sweep_results.jsonl.

Caveat (retention bias): the pool is only the ~5+5 checkpoints kept by
save_and_keep_only(max=[Utility_Retention], min=[ACC_external, ACC_dist])
— runs trained before the ACC_dist keep-key landed may have already
pruned the epochs closest to chance. The recorded row carries
``selected_pool_n``/``selected_kept_n`` so the pool size is visible.

  python scripts/reeval_frontier.py conf [seed]
"""
import json
import os
import sys
import time

import jax

if os.environ.get("SATPU_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import repro_gender_row as repro  # noqa: E402


def main():
    variant = sys.argv[1]
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    work = os.path.join(REPO, "save", "repro_gender_row")
    results_path = os.path.join(work, "sweep_results.jsonl")
    base = None
    with open(results_path) as f:
        for line in f:
            r = json.loads(line)
            if r["variant"] == variant and r["seed"] == seed:
                base = r
            if r["variant"] == f"{variant}_frontier" and r["seed"] == seed:
                sys.exit(f"[skip] {variant}_frontier seed={seed} already "
                         "recorded — delete the row to re-run")
    assert base is not None, f"no recorded run for {variant} seed={seed}"
    t0 = time.time()
    out = repro.run_stage2(
        work, f"anon_{variant}_s{seed}", base["schedule"],
        model_type=base["model_type"],
        epochs=base["warm_epochs"] + base["epochs"], seed=seed,
        grl_scale=base.get("grl_scale"), lr_adam=base["lr_adam"],
        eval_only=True,
        extra_args=["--eval_ckpt_select", "valid_frontier"],
    )
    # on_evaluate_start silently falls back to top-k averaging when no
    # kept checkpoint carries the frontier meta — recording that as a
    # "_frontier" row would mislabel an ordinary eval (ADVICE r4)
    if "selected_epoch" not in out:
        sys.exit(f"ABORT: the frontier branch did not run for {variant} "
                 f"seed={seed} (no kept checkpoint has ACC_external/"
                 "Utility_Retention meta) — nothing recorded")
    row = dict(base)
    row.update(out)
    row["variant"] = f"{variant}_frontier"
    row["wall_s"] = round(time.time() - t0, 1)
    with open(results_path, "a") as f:
        f.write(json.dumps(row) + "\n")
    import archive_repro

    archive_repro.archive()  # durable copy after EVERY row
    print(f"[recorded] {row['variant']} seed={seed} ({row['wall_s']}s)")


if __name__ == "__main__":
    main()
