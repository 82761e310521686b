"""Stage-2 (adversarial FC-AE) schedule sweep for the reduced-scale
reproduction. Reuses scripts/repro_gender_row.py's cached stage-1
evaluator and stage-1.5 tiny ASR; trains ONLY the anonymizer under a
named schedule variant and prints the test triple (ACC_ext / WER /
utility).

  python scripts/sweep_stage2.py <variant> [epochs]

Variants (generator-phase weights; all keep the sex_classifier phase):
  baseline    recon0.5 sex0.5            (the shipped reference schedule)
  conf        recon0.5 confusion0.5      (uniform-output objective: GRL's
                                          max-NLL can merely scramble the
                                          internal head while an external
                                          classifier still reads the cue;
                                          pushing log-probs to ln(1/2)
                                          removes the cue itself)
  mix         recon0.5 sex0.25 conf0.25
  adv2        recon0.5/sex0.5 but TWO adversary epochs per generator
              epoch (stronger internal adversary between generator moves)
"""
import os
import sys

import jax

if os.environ.get("SATPU_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
BASE = os.path.join(REPO, "configs")

from speech_anonymization_tpu.recipes import anonymizer  # noqa: E402

GEN = '{"weights": {"recon": %s, "sex": %s, "utility": 0.0, "confusion": %s}, "train": "generator"}'
ADV = '{"weights": {"recon": 0.0, "sex": 0.5, "utility": 0.0, "confusion": 0.0}, "train": "sex_classifier"}'

VARIANTS = {
    "baseline": "[" + GEN % (0.5, 0.5, 0.0) + "," + ADV + "]",
    "conf": "[" + GEN % (0.5, 0.0, 0.5) + "," + ADV + "]",
    "mix": "[" + GEN % (0.5, 0.25, 0.25) + "," + ADV + "]",
    "adv2": "[" + GEN % (0.5, 0.5, 0.0) + "," + ADV + "," + ADV + "]",
}


def main():
    variant = sys.argv[1]
    epochs = sys.argv[2] if len(sys.argv) > 2 else "60"
    work = os.path.join(REPO, "save", "repro_gender_row")
    root = os.path.join(work, "corpus")
    gout = os.path.join(work, "gender")
    aout = os.path.join(work, "asr")
    for d in (root, os.path.join(gout, "save"), os.path.join(aout, "save")):
        assert os.path.exists(d), f"run scripts/repro_gender_row.py first ({d})"
    test_csv = os.path.join(root, "test-clean.csv")
    nout = os.path.join(work, f"anon_{variant}_{epochs}")

    csv = os.path.join(root, "train-clean.csv")
    nb = anonymizer.main(
        [os.path.join(BASE, "convae.yaml"),
         "--data_folder", root,
         "--train_splits", '["train-clean"]',
         "--dev_splits", '["train-clean"]',
         "--test_splits", '["test-clean"]',
         "--train_csv", csv,
         "--valid_csv", csv,
         "--output_folder", nout,
         "--save_folder", os.path.join(nout, "save"),
         "--train_log", os.path.join(nout, "train_log.txt"),
         "--gradient_accumulation", "1",
         "--test_csv", f'["{test_csv}"]',
         "--batch_size", "8", "--number_of_epochs", epochs,
         "--model_type", "fcae",
         "--lr_adam", "0.55", "--n_warmup_steps", "100",
         "--adversarial_schedule", VARIANTS[variant],
         "--external_classifier_dir", os.path.join(gout, "save", "ckpts"),
         "--asr_checkpoint_dir", os.path.join(aout, "save", "ckpts"),
         "--tokenizer_path", os.path.join(aout, "save", "tokenizer.json"),
         "--d_model", "64", "--nhead", "4", "--num_encoder_layers", "2",
         "--num_decoder_layers", "2", "--d_ffn", "128",
         "--output_neurons", "40", "--test_beam_size", "4",
         ]
    )
    s = nb.test_stats
    print(f"[sweep {variant} e{epochs}] "
          f"ACC_ext orig={float(s['ACC_external_orig']):.3f} "
          f"anon={float(s['ACC_external']):.3f} "
          f"internal={float(s['ACC']):.3f} "
          f"utility={float(s['Utility_Retention']):.3f} "
          f"WER orig={float(s.get('WER_orig', float('nan'))):.1f}% "
          f"anon={float(s['WER']):.1f}%")


if __name__ == "__main__":
    main()
