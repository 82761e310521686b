#!/usr/bin/env python3
"""CLI: adversarial anonymizer training/eval (the core entry point).

    python recipes/speechbrain_convae_train.py configs/convae.yaml \
        --model_type [convae|fcae|endtoend|cyclegan] \
        [--external_classifier_dir ...] [--asr_checkpoint_dir ...] [--eval_only]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from speech_anonymization_tpu.recipes.anonymizer import main

if __name__ == "__main__":
    main()
