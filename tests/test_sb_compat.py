"""Reference-artifact compatibility: load the ACTUAL torch checkpoints the
reference repo ships and verify they hydrate our state objects."""

import os

import numpy as np
import pytest

REF = "/root/reference/model_checkpoints/initial_baseline_30_epochs"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference artifacts not mounted"
)


def test_load_reference_normalizer():
    from speech_anonymization_tpu.utils.sb_compat import load_normalizer_ckpt
    from speech_anonymization_tpu.ops.normalization import InputNormalizer

    state = load_normalizer_ckpt(os.path.join(REF, "normalizer.ckpt"))
    assert state.glob_mean.shape == (80,)
    assert float(state.count) > 0
    # stats plug straight into our normalizer
    import jax.numpy as jnp

    norm = InputNormalizer(dim=80)
    x = jnp.ones((1, 10, 80))
    out, _ = norm(state, x, None, epoch=10**9, training=False)
    assert np.isfinite(np.asarray(out)).all()


def test_load_reference_noam():
    from speech_anonymization_tpu.train.schedulers import NoamScheduler
    from speech_anonymization_tpu.utils.sb_compat import load_noam_ckpt

    sched = NoamScheduler(lr_initial=1.0, n_warmup_steps=25000, model_size=768)
    d = load_noam_ckpt(os.path.join(REF, "noam_scheduler.ckpt"), sched)
    assert sched.n_steps == int(d["n_steps"])
    assert sched.current_lr > 0


def test_load_reference_counter():
    from speech_anonymization_tpu.utils.sb_compat import load_counter_ckpt

    epoch = load_counter_ckpt(os.path.join(REF, "counter.ckpt"))
    assert isinstance(epoch, int) and epoch >= 0
