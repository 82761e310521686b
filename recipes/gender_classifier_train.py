#!/usr/bin/env python3
"""CLI: train the x-vector gender classifier (privacy evaluator).

Usage (mirrors the reference command):
    python recipes/gender_classifier_train.py configs/gender_classifier.yaml \
        [--data_folder ...] [--batch_size ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from speech_anonymization_tpu.recipes.gender_classifier import main

if __name__ == "__main__":
    main()
