"""Attack-after-anonymization row (the reference's strongest privacy
metric): RETRAIN a fresh gender classifier ON the anonymized features of
a swept variant and measure its held-out accuracy — the
gender_classifier_train_recon recipe (reference
gender_classifier_train_recon.py:58-93). A variant that only fools the
FIXED evaluator fails this test; a variant that actually removed the cue
holds the retrained attacker near chance.

  python scripts/attack_retrain.py <variant> [seed] [frontier]

With ``frontier``, the frozen anonymizer is the SAME valid_frontier
checkpoint the ``<variant>_frontier`` sweep row reports (instead of the
default max-utility checkpoint), so the retrained attacker attacks the
reported operating point; the row is recorded under
``<variant>_frontier``.

Appends one JSON line to save/repro_gender_row/attack_results.jsonl.
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


def main():
    from speech_anonymization_tpu.recipes import gender_classifier

    variant = sys.argv[1]
    seed = sys.argv[2] if len(sys.argv) > 2 else "0"
    frontier = "frontier" in sys.argv[3:]
    work = os.path.join(REPO, "save", "repro_gender_row")
    root = os.path.join(work, "corpus")
    test_csv = os.path.join(root, "test-clean.csv")
    anon_dir = os.path.join(work, f"anon_{variant}_s{seed}", "save", "ckpts")
    assert os.path.isdir(anon_dir), f"run round4_sweep.py {variant} first ({anon_dir})"
    # the sweep's variant specs record the model_type in sweep_results.jsonl
    model_type = "fcae"
    with open(os.path.join(work, "sweep_results.jsonl")) as f:
        for line in f:
            r = json.loads(line)
            if r["variant"] == variant and str(r["seed"]) == seed:
                model_type = r["model_type"]
    tag = f"{variant}_frontier" if frontier else variant
    out = os.path.join(work, f"attack_{tag}_s{seed}")
    t0 = time.time()
    gb = gender_classifier.main(
        [os.path.join(repro.BASE, "gender_classifier_recon.yaml")]
        + repro._common(root, out)
        + ["--test_csv", test_csv, "--batch_size", "16",
           "--number_of_epochs", "8",
           "--trained_recon_model_dir", anon_dir,
           "--recon_model_type", model_type]
        + (["--recon_ckpt_select", "valid_frontier"] if frontier else [])
    )
    row = {
        "variant": tag, "seed": int(seed), "model_type": model_type,
        "attack_acc": 1.0 - float(gb.test_stats["error"]),
        "wall_s": round(time.time() - t0, 1),
    }
    with open(os.path.join(work, "attack_results.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")
    archive_repro.archive()  # durable copy after EVERY row
    print(f"[attack {tag} s{seed}] retrained-attacker ACC on anonymized "
          f"features = {row['attack_acc']:.3f}")


if __name__ == "__main__":
    main()
