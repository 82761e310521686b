"""Experiment directory setup: config snapshot + environment capture.

Reference: sb.create_experiment_directory (gender_classifier_train.py:
314-318) — creates output_folder, snapshots the hyperparams file (with
overrides appended) and dumps an env.log (pip freeze) as seen in
results/*/8886/{hyperparams.yaml,env.log}.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys


def create_experiment_directory(
    experiment_directory: str,
    hyperparams_to_save: str | None = None,
    overrides: dict | str | None = None,
):
    os.makedirs(experiment_directory, exist_ok=True)
    if hyperparams_to_save and os.path.exists(hyperparams_to_save):
        dst = os.path.join(experiment_directory, "hyperparams.yaml")
        shutil.copyfile(hyperparams_to_save, dst)
        if overrides:
            with open(dst, "a") as f:
                f.write("\n# --- CLI overrides ---\n")
                if isinstance(overrides, dict):
                    for k, v in overrides.items():
                        f.write(f"{k}: {v}\n")
                else:
                    f.write(str(overrides) + "\n")
    env_log = os.path.join(experiment_directory, "env.log")
    try:
        freeze = subprocess.run(
            [sys.executable, "-m", "pip", "freeze", "--disable-pip-version-check"],
            capture_output=True,
            text=True,
            timeout=60,
        ).stdout
    except Exception:
        freeze = ""
    with open(env_log, "w") as f:
        f.write(f"python {sys.version}\n")
        f.write(freeze)
