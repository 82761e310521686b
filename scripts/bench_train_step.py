"""Anonymizer adversarial train-step throughput on the real chip.

Times the jitted SexAnonymizationBrain update (fbank -> normalize -> %36
pad -> ConvAE fwd/bwd with GRL sex head, masked dual optimizers) at a
production shape (batch 16 x ~2.9 s utterances), both adversarial phases.

  timeout 1750 env PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_train_step.py
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from speech_anonymization_tpu.ops.fbank import Fbank, FbankConfig
from speech_anonymization_tpu.ops.normalization import InputNormalizer
from speech_anonymization_tpu.recipes.anonymizer import SexAnonymizationBrain
from speech_anonymization_tpu.train import EpochCounter, FileTrainLogger, NoamScheduler

B, K = 16, 8  # wav len (36K-1)*160 -> ~2.9 s per utt
N = (36 * K - 1) * 160
tmp = tempfile.mkdtemp()
hparams = {
    "model_type": os.environ.get("BT_MODEL", "convae"),
    "compute_features": Fbank(FbankConfig()),
    "normalize": InputNormalizer(dim=80),
    "train_logger": FileTrainLogger(os.path.join(tmp, "log.txt")),
    "epoch_counter": EpochCounter(1),
    "noam_annealing": NoamScheduler(lr_initial=1.0, n_warmup_steps=25000, model_size=768),
    "gradient_accumulation": 1,
    "gradient_clipping": 5.0,
    "adversarial_schedule": [
        {"weights": {"recon": 0.0, "sex": 0.8, "utility": 0.2}, "train": "generator"},
        {"weights": {"recon": 0.0, "sex": 0.5, "utility": 0.0}, "train": "sex_classifier"},
    ],
}
brain = SexAnonymizationBrain(hparams, checkpointer=None)
rng = np.random.default_rng(0)
wavs = jnp.asarray(rng.standard_normal((B, N)).astype(np.float32) * 0.1)
lens = jnp.ones((B,), jnp.float32)
sex = rng.integers(0, 2, (B,)).astype(np.int32)


class _Batch:
    sig = (wavs, lens)
    gender = sex


batch = _Batch()
brain.init_state(brain._device_batch(batch), seed=0)

print(f"devices: {jax.devices()}  B={B} x {N/16000:.1f}s  model={hparams['model_type']}")
t0 = time.perf_counter()
loss = brain.fit_batch(batch, epoch=1)
print(f"compile+first: {time.perf_counter()-t0:.1f}s  loss {float(loss):.4f}", flush=True)

reps = 20
t0 = time.perf_counter()
for i in range(reps):
    loss = brain.fit_batch(batch, epoch=1 + (i % 2))  # both phases
np.asarray(brain.state.params["encoder"]["Conv_0"]["kernel"][0, 0, :2]) if False else None
loss_h = float(loss)  # host sync
dt = (time.perf_counter() - t0) / reps
audio_s = B * N / 16000.0
print(f"train step: {dt*1e3:.1f} ms  ({audio_s/dt:.0f}x realtime training)  loss {loss_h:.4f}")
