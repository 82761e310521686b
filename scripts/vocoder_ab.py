"""Vocoder-implementation sensitivity bound (VERDICT r3 missing #3 / #5).

pyworld is uninstallable in this environment, so the divergence between
native/world_vocoder.cc and pw.wav2world/pw.synthesize
(/root/reference/gender_classifier_train_pitch_norm.py:253-258) cannot be
measured directly. This script runs the cheap proxy the VERDICT proposes:
the pitch-norm recipe chain on the synthetic corpus TWICE — once with the
WORLD-class vocoder, once with the structurally different TD-PSOLA
resynthesis — and checks the downstream CONCLUSION (gender ACC on
pitch-normalized audio, i.e. "how much sex cue survives when pitch is
neutralized") is invariant to the vocoder implementation. If two unrelated
resynthesis algorithms agree, the result is not an artifact of this
repo's WORLD reimplementation details.

Appends one JSON line per run to save/repro_gender_row/vocoder_ab.jsonl.

  python scripts/vocoder_ab.py
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
    from speech_anonymization_tpu.recipes import gender_classifier_pitch_norm

    work = os.path.join(REPO, "save", "repro_gender_row")
    results_path = os.path.join(work, "vocoder_ab.jsonl")
    done = {}
    if os.path.exists(results_path):
        with open(results_path) as f:
            for line in f:
                r = json.loads(line)
                done[r["method"]] = r
    # stage 1 also anchors the ACC on ORIGINAL (non-pitch-normalized) audio
    acc_orig, _ = repro.ensure_stages(work)
    root = os.path.join(work, "corpus")
    test_csv = os.path.join(root, "test-clean.csv")

    for method in ("world", "psola"):
        if method in done:
            print(f"[skip] {method} already recorded: {done[method]}")
            continue
        out = os.path.join(work, f"pitch_{method}")
        t0 = time.time()
        gb = gender_classifier_pitch_norm.main(
            [os.path.join(repro.BASE, "gender_classifier_pitch_norm.yaml")]
            + repro._common(root, out)
            + ["--test_csv", test_csv, "--batch_size", "16",
               "--number_of_epochs", "8",
               "--pitch_method", method]
        )
        row = {
            "method": method,
            "acc_pitch_norm": 1.0 - float(gb.test_stats["error"]),
            "acc_orig_audio": acc_orig,
            "wall_s": round(time.time() - t0, 1),
        }
        done[method] = row
        with open(results_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        archive_repro.archive()  # durable copy after EVERY row
        print(f"[vocoder_ab {method}] ACC on pitch-normalized audio = "
              f"{row['acc_pitch_norm']:.3f} (original-audio ACC {acc_orig:.3f})")

    if len(done) == 2:
        d = abs(done["world"]["acc_pitch_norm"] - done["psola"]["acc_pitch_norm"])
        print(f"[vocoder_ab] |ACC_world - ACC_psola| = {d:.3f}")


if __name__ == "__main__":
    main()
