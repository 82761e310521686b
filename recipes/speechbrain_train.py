#!/usr/bin/env python3
"""CLI: baseline transformer-ASR training (the utility evaluator).

    python recipes/speechbrain_train.py configs/transformer.yaml
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from speech_anonymization_tpu.recipes.asr_train import main

if __name__ == "__main__":
    main()
