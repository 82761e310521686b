#!/usr/bin/env python3
"""CLI: transformer-LM training (shallow-fusion LM for test decoding).

    python recipes/lm_train.py configs/lm.yaml

The reference has no LM training script — it fetched a pretrained lm.ckpt
via Pretrainer (speechbrain_configs/convae.yaml:306-317). This recipe
produces the equivalent checkpoint for load_asr_bundle's
``lm_checkpoint_dir``.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from speech_anonymization_tpu.recipes.lm_train import main

if __name__ == "__main__":
    main()
