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
* ``e2e`` reproduces the reference's 1_5_endtoend family (its BEST
  privacy rows: ACC_ext 0.60->0.22): model_type=endtoend trains the
  generator DIRECTLY against the frozen external classifier (loss
  subtracts sex NLL — speechbrain_convae_train.py:111-121), no internal
  adversary. Cold-started it collapses (the -sex NLL is unbounded); the
  ``*_warm`` variants mirror the reference's actual protocol (its
  endtoend runs RESUMED recon-pretrained models) via a recon-only warm
  phase resumed in place. ``e2e_conf`` replaces the unbounded -sex term
  with the bounded drive-the-EXTERNAL-head-to-uniform confusion
  objective.
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

import archive_repro  # noqa: E402
import repro_gender_row as repro  # noqa: E402

GEN = ('{"weights": {"recon": %s, "sex": %s, "utility": 0.0, "confusion": %s},'
       ' "train": "generator"}')
ADV = ('{"weights": {"recon": 0.0, "sex": 0.5, "utility": 0.0, "confusion": 0.0},'
       ' "train": "sex_classifier"}')
E2E = ('{"weights": {"recon": %s, "sex": %s, "utility": %s, "confusion": 0.0},'
       ' "train": "all"}')
E2EC = ('{"weights": {"recon": %s, "sex": %s, "utility": %s, "confusion": %s},'
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
    # classifier (conv recon model, no internal adversary).
    # COLD start collapses immediately (-sex NLL is unbounded: measured
    # epoch 2 valid loss 858, utility 0.36, ACC_ext pinned 0.50 on garbage
    # features) — kept short to record the negative. The reference never
    # ran it cold either: 1_5_endtoend resumed a recon-pretrained model
    # (results/1_5_endtoend/8886/train_log.txt starts from a loaded ckpt).
    "e2e": dict(schedule=_sched(E2E % (0.4, 0.6, 0.0)), model_type="endtoend",
                epochs=10),
    # warm variants mirror the reference's resume protocol: recon-only
    # pretrain in the SAME output dir, then continue with the adversarial
    # schedule (checkpointer resume carries params + Noam state across).
    "e2e_warm": dict(schedule=_sched(E2E % (0.4, 0.6, 0.0)), model_type="endtoend",
                     warm_epochs=10, epochs=15, lr_adam=0.25),
    # bounded alternative to the unbounded -sex NLL: drive the EXTERNAL
    # head's output to uniform (confusion = MSE(log-probs, ln 1/2), min at
    # uniform). endtoend _total subtracts w_conf*confusion, so the
    # uniform-driving direction is confusion = -0.5.
    "e2e_conf": dict(schedule=_sched(E2EC % (0.5, 0.0, 0.0, -0.5)),
                     model_type="endtoend", warm_epochs=6, epochs=19,
                     lr_adam=0.25),
    # reference 1_5_endtoend_resume_with_asr: sex-heavy with a utility
    # anchor, resumed from a recon model (here: warm phase)
    "e2e_util": dict(schedule=_sched(E2E % (0.2, 0.7, 0.1)), model_type="endtoend",
                     warm_epochs=10, epochs=15, lr_adam=0.25),
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
            out_name = f"anon_{name}_s{seed}"
            mt = spec.get("model_type", "fcae")
            warm = spec.get("warm_epochs", 0)
            lr = spec.get("lr_adam", 0.55)
            try:
                if warm:
                    # recon-only pretrain in the same dir; the adversarial
                    # run below resumes it (reference resume protocol)
                    warm_sched = _sched(
                        E2E % (1.0, 0.0, 0.0) if mt == "endtoend"
                        else GEN % (1.0, 0.0, 0.0)
                    )
                    repro.run_stage2(
                        work, out_name, warm_sched, model_type=mt,
                        epochs=warm, seed=seed, lr_adam=lr,
                    )
                out = repro.run_stage2(
                    work, out_name, spec["schedule"], model_type=mt,
                    epochs=warm + spec.get("epochs", 40), seed=seed,
                    grl_scale=spec.get("grl_scale"), lr_adam=lr,
                )
            except Exception as e:  # record and keep sweeping
                import traceback

                traceback.print_exc()
                print(f"[FAILED] {name} seed={seed}: {e!r}")
                continue
            row = {
                "variant": name, "seed": seed,
                "model_type": mt,
                "epochs": spec.get("epochs", 40),
                "warm_epochs": warm,
                "lr_adam": lr,
                "grl_scale": spec.get("grl_scale"),
                "schedule": spec["schedule"],
                "acc_orig": acc_orig, "wer_asr": wer_asr,
                "wall_s": round(time.time() - t0, 1),
                **out,
            }
            with open(results_path, "a") as f:
                f.write(json.dumps(row) + "\n")
            archive_repro.archive()  # durable copy after EVERY row
            print(f"[recorded] {name} seed={seed} ({row['wall_s']}s)")


if __name__ == "__main__":
    main()
