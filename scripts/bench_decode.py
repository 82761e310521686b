"""End-to-end beam-search decode benchmark on the real chip.

Full-size ASR (768d, 12 enc / 6 dec) + 12-layer TransformerLM, beam 66,
joint CTC 0.4 + LM 0.6, B=8 x 5 s utterances, 64 decode steps — the
reference's test-decode configuration (speechbrain_configs/convae.yaml:
226-240). Random weights (timing only).

Timings force a host transfer (np.asarray) — jax.block_until_ready does
NOT block under the axon tunnel backend.

  timeout 1750 env PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_decode.py
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from speech_anonymization_tpu.models.asr import ASRModel
from speech_anonymization_tpu.models.transformer import TransformerLM
from speech_anonymization_tpu.recipes.asr_bundle import ASRBundle


class _Tok:
    def decode_ids(self, ids):
        return " ".join(str(i) for i in ids)


B = int(os.environ.get("DEC_B", "8"))
SECONDS = float(os.environ.get("DEC_SECONDS", "5.0"))
T_FEATS = int(SECONDS * 100)  # 10 ms hop
STEPS = int(os.environ.get("DEC_STEPS", "64"))

hparams = {
    "test_beam_size": 66,
    "lm_weight": 0.6,
    "ctc_weight_decode": 0.4 if os.environ.get("DEC_CTC", "1") == "1" else 0.0,
    "temperature": 1.15,
    "temperature_lm": 1.15,
    "max_decode_steps": STEPS,
    "bos_index": 1,
    "eos_index": 2,
    "blank_index": 0,
}
# benches measure the serving configuration: bf16 caches by default
# (the recipe default is float32 for reference score parity)
hparams["decode_cache_dtype"] = os.environ.get("DEC_CACHE_DTYPE", "bfloat16")
# surface the certified top-k fallback counter (DEC_STATS=0 to disable)
hparams["decode_return_stats"] = os.environ.get("DEC_STATS", "1") == "1"
# DEC_PAGED=0 forces the physical per-step cache reorder (A/B baseline)
hparams["decode_paged_kv"] = os.environ.get("DEC_PAGED", "1") == "1"
USE_LM = os.environ.get("DEC_LM", "1") == "1"

print(f"devices: {jax.devices()}  B={B} beam=66 steps={STEPS} lm={USE_LM}")

model = ASRModel()
rng = jax.random.PRNGKey(0)
feats0 = jnp.zeros((1, 8, 80))
toks0 = jnp.zeros((1, 3), jnp.int32)
variables = model.init(rng, feats0, toks0, jnp.ones((1,)))

lm = lm_vars = None
if USE_LM:
    lm = TransformerLM()
    lm_vars = lm.init(jax.random.PRNGKey(1), jnp.zeros((1, 4), jnp.int32))

bundle = ASRBundle(model, variables, _Tok(), hparams, lm=lm, lm_variables=lm_vars)

feats = jax.random.normal(jax.random.PRNGKey(2), (B, T_FEATS, 80))
lens = jnp.ones((B,))

def _unpack(res):
    if len(res) == 4:
        return res
    return (*res, None)


t0 = time.perf_counter()
toks, lengths, scores, stats = _unpack(bundle._decode_test(feats, lens))
np.asarray(scores)
print(f"compile+first run: {time.perf_counter()-t0:.1f} s", flush=True)

reps = 3
t0 = time.perf_counter()
for _ in range(reps):
    toks, lengths, scores, stats = _unpack(bundle._decode_test(feats, lens))
out = np.asarray(scores)
dt = (time.perf_counter() - t0) / reps

audio_s = B * SECONDS
print(f"decode: {dt*1e3:.0f} ms/batch  {dt/STEPS*1e3:.2f} ms/step  "
      f"RTF {audio_s/dt:.1f}x realtime", flush=True)
print("lengths:", np.asarray(lengths), " scores:", out[:4])
if stats is not None:
    print(f"certified top-k fallbacks: {int(np.asarray(stats['topk_fallbacks']))}"
          f"/{stats['steps']} steps", flush=True)
