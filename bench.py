"""Benchmark: anonymization real-time factor per chip.

Measures the full anonymization inference path (fbank frontend -> global
normalization -> ConvAutoencoder forward) on the available accelerator and
prints ONE JSON line. The north-star target (BASELINE.json) is >=50x
real-time per TPU v5e chip; ``vs_baseline`` is the measured RTF divided by
that 50x target (>1.0 = beating the target).
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    # SATPU_BENCH_DTYPE=bfloat16 serves the AE in bf16 (~1.5x faster on the
    # MXU; measured 17.8k x vs 12.1k x realtime) — default f32 keeps the
    # anonymized features bit-stable for the privacy/utility metrics.
    bench_dtype = os.environ.get("SATPU_BENCH_DTYPE", "float32")
    from speech_anonymization_tpu.models import ConvAutoencoder
    from speech_anonymization_tpu.ops.fbank import Fbank
    from speech_anonymization_tpu.ops.normalization import InputNormalizer

    batch = 32
    k = 28                      # wav len (36k-1)*160 -> ~44.7 s per utt
    n = (36 * k - 1) * 160
    audio_seconds = batch * n / 16000.0

    rng = np.random.default_rng(0)
    wavs = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32) * 0.1)
    lens = jnp.ones((batch,), jnp.float32)

    fbank = Fbank()
    normalizer = InputNormalizer(dim=80)
    norm_state = normalizer.init_state()
    model = ConvAutoencoder()
    feats0 = fbank(wavs[:1])
    variables = model.init(jax.random.PRNGKey(0), feats0, train=False)
    cast_bf16 = bench_dtype == "bfloat16"
    if cast_bf16:
        variables = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, variables
        )

    @jax.jit
    def anonymize(wavs, lens):
        feats = fbank(wavs)
        feats, _ = normalizer(norm_state, feats, lens, epoch=10**9, training=False)
        if cast_bf16:
            feats = feats.astype(jnp.bfloat16)
        # inference path skips the adversarial classifier head
        return model.apply(variables, feats, method=ConvAutoencoder.anonymize)

    # IMPORTANT: jax.block_until_ready does NOT block under the axon
    # tunnel (BENCHMARKS.md round 2) — completion must be forced by a host
    # transfer. A tiny dependent slice keeps the transfer itself (~4 bytes)
    # out of the measurement while still waiting for the full computation:
    # programs execute in order on the chip, so the last iteration's slice
    # arriving implies every queued iteration finished.
    out = anonymize(wavs, lens)
    np.asarray(out[0, 0, :1])

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = anonymize(wavs, lens)
    np.asarray(out[0, 0, :1])
    dt = (time.perf_counter() - t0) / iters

    rtf = audio_seconds / dt
    print(
        json.dumps(
            {
                "metric": "anonymization_realtime_factor_per_chip",
                "value": round(rtf, 1),
                "unit": "x_realtime",
                "vs_baseline": round(rtf / 50.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
