"""Round-4 stage-2 (anonymizer) schedule sweep — VERDICT r3 item #1.

Reuses the cached stage-1 evaluator and stage-1.5 tiny ASR from
scripts/repro_gender_row.py (built on demand); trains ONLY the anonymizer
under each named variant and appends one JSON line per run to
save/repro_gender_row/sweep_results.jsonl. Render the table with
scripts/write_experiments.py.

  python scripts/round4_sweep.py baseline e2e_alt conf ...
  python scripts/round4_sweep.py baseline --seeds 0,1,2   # seed spread

Variant design notes:

* The round-3 failure mode: with the shipped recon0.5/sex0.5 GRL schedule
  the INTERNAL adversary ends at chance while the EXTERNAL evaluator still
  reads the cue (ACC_ext 0.980) — the GRL scrambled its own head, not the
  feature.
* ``e2e`` / ``e2e_alt`` reproduce the reference's 1_5_endtoend family
  (its BEST privacy rows: ACC_ext 0.60->0.22): model_type=endtoend trains
  the generator DIRECTLY against the frozen external classifier
  (loss subtracts sex NLL — speechbrain_convae_train.py:111-121), no
  internal adversary. ``e2e_alt`` is the archived 1_5_endtoend schedule
  (alternating (recon .4, sex .6) / (recon 0, sex 1.0) phases, there
  step%200, here per-epoch).
* ``conf``/``mix`` use NEGATIVE confusion weights: for GRL models the
  confusion gradient also passes through the gradient-reversal layer, so
  +w pushes the head output AWAY from uniform; -w is what "drive the head
  to uniform" actually requires. (The round-3 sweep_stage2.py variants had
  this sign inverted — they were never run; recorded here as fixed.)
* ``grl4`` scales the reversed gradient 4x (generator feels the adversary
  4x harder per adversary unit of competence).
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

GEN = ('{"weights": {"recon": %s, "sex": %s, "utility": 0.0, "confusion": %s},'
       ' "train": "generator"}')
ADV = ('{"weights": {"recon": 0.0, "sex": 0.5, "utility": 0.0, "confusion": 0.0},'
       ' "train": "sex_classifier"}')
E2E = ('{"weights": {"recon": %s, "sex": %s, "utility": %s, "confusion": 0.0},'
       ' "train": "all"}')


def _sched(*phases):
    return "[" + ",".join(phases) + "]"


VARIANTS = {
    # the shipped reference schedule (fullyconn_updatedsexclassifier_recon0.5_sex0.5)
    "baseline": dict(schedule=_sched(GEN % (0.5, 0.5, 0.0), ADV)),
    # stronger internal adversary between generator moves
    "adv2": dict(schedule=_sched(GEN % (0.5, 0.5, 0.0), ADV, ADV)),
    "adv4": dict(schedule=_sched(GEN % (0.5, 0.5, 0.0), ADV, ADV, ADV, ADV)),
    # uniform-output objective (negative weight: see module docstring)
    "conf": dict(schedule=_sched(GEN % (0.5, 0.0, -0.5), ADV)),
    "mix": dict(schedule=_sched(GEN % (0.5, 0.25, -0.25), ADV)),
    # 4x reversed-gradient scale on the baseline schedule
    "grl4": dict(schedule=_sched(GEN % (0.5, 0.5, 0.0), ADV), grl_scale=4.0),
    # reference 1_5_endtoend family: train against the FROZEN external
    # classifier (conv recon model, no internal adversary)
    "e2e": dict(schedule=_sched(E2E % (0.4, 0.6, 0.0)), model_type="endtoend",
                epochs=25),
    "e2e_alt": dict(schedule=_sched(E2E % (0.4, 0.6, 0.0), E2E % (0.0, 1.0, 0.0)),
                    model_type="endtoend", epochs=25),
    # reference 1_5_endtoend_resume_with_asr: constant sex0.9/utility0.1
    # (there resumed from 1_5_endtoend; here run with a recon floor so the
    # decoder does not start from garbage)
    "e2e_util": dict(schedule=_sched(E2E % (0.2, 0.7, 0.1)), model_type="endtoend",
                     epochs=25),
}


def main():
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    seeds = [0]
    for a in sys.argv[1:]:
        if a.startswith("--seeds"):
            seeds = [int(s) for s in a.split("=", 1)[1].split(",")] if "=" in a else seeds
    work = os.path.join(REPO, "save", "repro_gender_row")
    results_path = os.path.join(work, "sweep_results.jsonl")
    done = set()
    if os.path.exists(results_path):
        with open(results_path) as f:
            for line in f:
                r = json.loads(line)
                done.add((r["variant"], r["seed"]))

    acc_orig, wer_asr = repro.ensure_stages(work)

    for name in names:
        spec = dict(VARIANTS[name])
        for seed in seeds:
            if (name, seed) in done:
                print(f"[skip] {name} seed={seed} already recorded")
                continue
            t0 = time.time()
            try:
                out = repro.run_stage2(
                    work, f"anon_{name}_s{seed}", spec["schedule"],
                    model_type=spec.get("model_type", "fcae"),
                    epochs=spec.get("epochs", 40), seed=seed,
                    grl_scale=spec.get("grl_scale"),
                )
            except Exception as e:  # record and keep sweeping
                import traceback

                traceback.print_exc()
                print(f"[FAILED] {name} seed={seed}: {e!r}")
                continue
            row = {
                "variant": name, "seed": seed,
                "model_type": spec.get("model_type", "fcae"),
                "epochs": spec.get("epochs", 40),
                "grl_scale": spec.get("grl_scale"),
                "schedule": spec["schedule"],
                "acc_orig": acc_orig, "wer_asr": wer_asr,
                "wall_s": round(time.time() - t0, 1),
                **out,
            }
            with open(results_path, "a") as f:
                f.write(json.dumps(row) + "\n")
            print(f"[recorded] {name} seed={seed} ({row['wall_s']}s)")


if __name__ == "__main__":
    main()
