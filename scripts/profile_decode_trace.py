"""Capture a REAL on-chip profiler trace of the long-utterance decode step
(VERDICT r3 #2: confirm or kill the 'HBM-efficiency design floor'
hypothesis with a trace, not an ablation).

Runs the 30 s int8 paged decode configuration (B=8, beam 66, LM 0.6,
CTC 0.4 — BENCHMARKS.md's 21.55 ms/step row), captures a jax.profiler
trace around the steady-state repetitions, and post-processes the xplane
with xprof/tensorboard-plugin-profile into a per-op self-time table.

  timeout 1750 env PYTHONPATH=/root/.axon_site:/root/repo \
      DEC_SECONDS=30 DEC_STEPS=448 DEC_CACHE_DTYPE=int8 \
      python scripts/profile_decode_trace.py

Trace is written to save/decode_trace/ (gitignored); the printed table is
what BENCHMARKS.md records.
"""

import glob
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
SECONDS = float(os.environ.get("DEC_SECONDS", "30.0"))
T_FEATS = int(SECONDS * 100)
STEPS = int(os.environ.get("DEC_STEPS", "448"))
TRACE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "save", "decode_trace")

hparams = {
    "test_beam_size": 66,
    "lm_weight": 0.6,
    "ctc_weight_decode": 0.4,
    "temperature": 1.15,
    "temperature_lm": 1.15,
    "max_decode_steps": STEPS,
    "bos_index": 1,
    "eos_index": 2,
    "blank_index": 0,
    "decode_cache_dtype": os.environ.get("DEC_CACHE_DTYPE", "int8"),
    "decode_return_stats": False,
    "decode_paged_kv": True,
}

print(f"devices: {jax.devices()}  B={B} beam=66 steps={STEPS} "
      f"cache={hparams['decode_cache_dtype']}")

model = ASRModel()
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 80)),
                       jnp.zeros((1, 3), jnp.int32), jnp.ones((1,)))
lm = TransformerLM()
lm_vars = lm.init(jax.random.PRNGKey(1), jnp.zeros((1, 4), jnp.int32))
bundle = ASRBundle(model, variables, _Tok(), hparams, lm=lm, lm_variables=lm_vars)

feats = jax.random.normal(jax.random.PRNGKey(2), (B, T_FEATS, 80))
lens = jnp.ones((B,))

t0 = time.perf_counter()
res = bundle._decode_test(feats, lens)
np.asarray(res[2])
print(f"compile+first run: {time.perf_counter() - t0:.1f} s", flush=True)

os.makedirs(TRACE_DIR, exist_ok=True)
jax.profiler.start_trace(TRACE_DIR)
res = bundle._decode_test(feats, lens)
np.asarray(res[2])
jax.profiler.stop_trace()

t0 = time.perf_counter()
res = bundle._decode_test(feats, lens)
np.asarray(res[2])
dt = time.perf_counter() - t0
print(f"steady-state: {dt * 1e3:.0f} ms/batch  {dt / STEPS * 1e3:.2f} ms/step  "
      f"RTF {B * SECONDS / dt:.1f}x", flush=True)

# ---- post-process: per-op self time on the device ------------------------
xplanes = sorted(glob.glob(os.path.join(TRACE_DIR, "**", "*.xplane.pb"),
                           recursive=True), key=os.path.getmtime)
print(f"trace files: {xplanes}")
if xplanes:
    path = xplanes[-1]
    table = None
    try:
        from xprof.convert import raw_to_tool_data as rttd

        data, _ = rttd.xspace_to_tool_data([path], "framework_op_stats", {})
        table = data
    except Exception as e:  # API differs across versions — try the plugin
        print(f"xprof convert failed: {e!r}")
        try:
            from tensorboard_plugin_profile.convert import raw_to_tool_data as rttd

            data, _ = rttd.xspace_to_tool_data([path], "framework_op_stats", {})
            table = data
        except Exception as e2:
            print(f"plugin convert failed: {e2!r}")
    if table is not None:
        out = os.path.join(TRACE_DIR, "op_stats.csv")
        mode = "wb" if isinstance(table, bytes) else "w"
        with open(out, mode) as f:
            f.write(table)
        print(f"wrote {out} ({len(table)} bytes)")
        # quick textual top-of-table for the log
        text = table.decode() if isinstance(table, bytes) else str(table)
        for line in text.splitlines()[:40]:
            print(line)
