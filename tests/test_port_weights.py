"""Weight porting: forward-equivalence between live torch modules and flax
modules loaded with converted tensors."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import flax.linen as fnn  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from speech_anonymization_tpu.utils import (  # noqa: E402
    conv1d_from_torch,
    conv2d_from_torch,
    linear_from_torch,
    batchnorm_from_torch,
)
from speech_anonymization_tpu.utils.port_weights import conv_transpose1d_from_torch  # noqa: E402


def test_linear_port():
    tl = torch.nn.Linear(8, 5)
    x = torch.randn(3, 8)
    want = tl(x).detach().numpy()
    fl = fnn.Dense(5)
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, linear_from_torch(tl.weight, tl.bias))}
    got = np.asarray(fl.apply(variables, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_conv1d_port():
    tc = torch.nn.Conv1d(4, 6, kernel_size=5, padding=2)
    x = torch.randn(2, 4, 20)
    want = tc(x).detach().numpy()  # (B, C, W)
    fc = fnn.Conv(6, kernel_size=(5,), padding=[(2, 2)])
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, conv1d_from_torch(tc.weight, tc.bias))}
    got = np.asarray(fc.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 1))))
    np.testing.assert_allclose(got.transpose(0, 2, 1), want, atol=1e-4)


def test_conv2d_port():
    tc = torch.nn.Conv2d(3, 8, kernel_size=(3, 3), stride=(2, 2), padding=(1, 1))
    x = torch.randn(2, 3, 16, 12)
    want = tc(x).detach().numpy()
    fc = fnn.Conv(8, kernel_size=(3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, conv2d_from_torch(tc.weight, tc.bias))}
    got = np.asarray(fc.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=1e-4)


def test_conv_transpose1d_port():
    tc = torch.nn.ConvTranspose1d(4, 3, kernel_size=5, stride=2, padding=2, output_padding=1)
    x = torch.randn(2, 4, 10)
    want = tc(x).detach().numpy()
    fc = fnn.ConvTranspose(3, kernel_size=(5,), strides=(2,), padding=[(2, 3)])
    variables = {
        "params": jax.tree_util.tree_map(
            jnp.asarray, conv_transpose1d_from_torch(tc.weight, tc.bias)
        )
    }
    got = np.asarray(fc.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 1))))
    np.testing.assert_allclose(got.transpose(0, 2, 1), want, atol=1e-4)


def test_batchnorm_port_eval_mode():
    tb = torch.nn.BatchNorm1d(6)
    tb.train()
    for _ in range(3):
        tb(torch.randn(16, 6) * 2 + 1)  # accumulate running stats
    tb.eval()
    x = torch.randn(4, 6)
    want = tb(x).detach().numpy()
    p, s = batchnorm_from_torch(tb.weight, tb.bias, tb.running_mean, tb.running_var)
    fb = fnn.BatchNorm(use_running_average=True, epsilon=1e-5)
    variables = {
        "params": jax.tree_util.tree_map(jnp.asarray, p),
        "batch_stats": jax.tree_util.tree_map(jnp.asarray, s),
    }
    got = np.asarray(fb.apply(variables, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, want, atol=1e-5)
