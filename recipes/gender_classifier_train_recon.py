#!/usr/bin/env python3
"""CLI: retrain the gender classifier ON anonymized (reconstructed)
features — attack-after-anonymization accuracy.

    python recipes/gender_classifier_train_recon.py configs/gender_classifier_recon.yaml \
        --trained_recon_model_dir <anonymizer save/ckpts dir>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from speech_anonymization_tpu.recipes.gender_classifier import main

if __name__ == "__main__":
    main()
