#!/usr/bin/env python3
"""CLI: gender classifier on pitch-normalized audio (WORLD-style F0 shift
to mean 500 Hz via the native world_lite extension).

    python recipes/gender_classifier_train_pitch_norm.py configs/gender_classifier_pitch_norm.yaml
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from speech_anonymization_tpu.recipes.gender_classifier_pitch_norm import main

if __name__ == "__main__":
    main()
