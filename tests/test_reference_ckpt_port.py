"""Port the reference's SHIPPED torch checkpoints and prove forward parity.

VERDICT r1 #1: load real reference weights through port_state_dict, run
recon on fixture audio, assert trained-model statistics, and exact
torch-vs-JAX forward round-trips (<=1e-4). The torch replicas below are
written fresh from the architecture tables (models/FullyConnected.py:65-159,
models/external_gender_classifiers.py:118-183) — eval-mode only, used as
independent golden references for the layout conversion.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from speech_anonymization_tpu.utils.reference_ckpts import (
    load_reference_classifier_head,
    load_reference_fcae,
)
from speech_anonymization_tpu.utils.sb_compat import (
    load_normalizer_ckpt,
    load_state_dict_ckpt,
)

REF = "/root/reference/results"
FCAE_55 = f"{REF}/5_5_fc/8886/save/CKPT+2022-05-06+15-54-03+00/model.ckpt"
FCAE_RECON_DIR = (
    f"{REF}/fullyconn_normalize_recon1.0_l1_2_60_epoch_adam_lr_1.0/8886/save/"
    "CKPT+2022-03-23+18-48-15+00"
)
CLS_128 = f"{REF}/gender_classifier/1230/save/trained_external_classifier_ckpt/classifier.ckpt"
CLS_512 = f"{REF}/gender_classifier/1230/save/CKPT+2022-04-18+01-00-10+00/classifier.ckpt"

needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkpoints not available"
)


# ------------------------------------------------------------ torch replicas

class _TorchFCAE(tnn.Module):
    """Reference FC-AE forward (eval): per-frame Linear/ReLU stack."""

    def __init__(self):
        super().__init__()
        self.encoder = tnn.Sequential(
            tnn.Linear(80, 60), tnn.ReLU(), tnn.Linear(60, 40), tnn.ReLU(),
            tnn.Linear(40, 20),
        )
        self.decoder = tnn.Sequential(
            tnn.Linear(20, 40), tnn.ReLU(), tnn.Linear(40, 60), tnn.ReLU(),
            tnn.Linear(60, 80),
        )

    def forward(self, x):
        z = self.encoder(x)
        return self.decoder(z), z


class _TorchFCSexClassifier(tnn.Module):
    """HEAD FullyConnSexClassifier, eval mode, with the LAYOUT-CORRECT
    transpose for the input BatchNorm (the reference's .reshape(B, C, T)
    scrambles channels — conscious fix, see utils/reference_ckpts.py)."""

    def __init__(self):
        super().__init__()
        self.norm = tnn.BatchNorm1d(20)
        self.initial = tnn.Sequential(
            tnn.Linear(20, 40), tnn.ReLU(), tnn.Linear(40, 40), tnn.ReLU()
        )
        self.classify = tnn.Sequential(
            tnn.Linear(80, 40), tnn.BatchNorm1d(40), tnn.ReLU(),
            tnn.Linear(40, 40), tnn.ReLU(), tnn.Linear(40, 20),
            tnn.BatchNorm1d(20), tnn.Linear(20, 2),
        )

    def forward(self, x):  # (B, T, 20)
        x = self.norm(x.transpose(1, 2)).transpose(1, 2)
        h = self.initial(x)
        pooled = torch.cat([h.mean(1), h.std(1) + 1e-5], dim=1)
        return torch.log_softmax(self.classify(pooled), dim=1)


class _TorchClassifierHead(tnn.Module):
    """SpeechBrain Classifier head: act -> BN -> (Linear act BN) -> out."""

    def __init__(self, d, out=2):
        super().__init__()
        self.norm = tnn.BatchNorm1d(d)
        self.lin = tnn.Linear(d, d)
        self.norm2 = tnn.BatchNorm1d(d)
        self.out = tnn.Linear(d, out)

    def forward(self, emb):  # (B, d)
        h = self.norm(F.leaky_relu(emb))
        h = self.norm2(F.leaky_relu(self.lin(h)))
        return torch.log_softmax(self.out(h), 1)


def _assign(param, array):
    param.data = torch.as_tensor(np.asarray(array, np.float32))


def _load_torch_fcae(sd):
    m = _TorchFCAE()
    for part in ("encoder", "decoder"):
        for i in (0, 2, 4):
            layer = getattr(m, part)[i]
            _assign(layer.weight, sd[f"0.{part}.{i}.weight"])
            _assign(layer.bias, sd[f"0.{part}.{i}.bias"])
    return m.eval()


def _load_torch_sex_classifier(sd):
    m = _TorchFCSexClassifier()
    p = "0.sex_classifier."
    for attr, key in ((m.norm, "norm"), (m.classify[1], "classify.1"),
                      (m.classify[6], "classify.6")):
        _assign(attr.weight, sd[p + key + ".weight"])
        _assign(attr.bias, sd[p + key + ".bias"])
        attr.running_mean = torch.as_tensor(np.asarray(sd[p + key + ".running_mean"], np.float32))
        attr.running_var = torch.as_tensor(np.asarray(sd[p + key + ".running_var"], np.float32))
    for attr, key in ((m.initial[0], "initial.0"), (m.initial[2], "initial.2"),
                      (m.classify[0], "classify.0"), (m.classify[3], "classify.3"),
                      (m.classify[5], "classify.5"), (m.classify[7], "classify.7")):
        _assign(attr.weight, sd[p + key + ".weight"])
        _assign(attr.bias, sd[p + key + ".bias"])
    return m.eval()


def _load_torch_head(sd):
    d = int(np.asarray(sd["DNN.block_0.linear.w.weight"]).shape[0])
    m = _TorchClassifierHead(d, out=int(np.asarray(sd["out.w.weight"]).shape[0]))
    for attr, key in ((m.norm, "norm.norm"), (m.norm2, "DNN.block_0.norm.norm")):
        _assign(attr.weight, sd[key + ".weight"])
        _assign(attr.bias, sd[key + ".bias"])
        attr.running_mean = torch.as_tensor(np.asarray(sd[key + ".running_mean"], np.float32))
        attr.running_var = torch.as_tensor(np.asarray(sd[key + ".running_var"], np.float32))
    for attr, key in ((m.lin, "DNN.block_0.linear.w"), (m.out, "out.w")):
        _assign(attr.weight, sd[key + ".weight"])
        _assign(attr.bias, sd[key + ".bias"])
    return m.eval()


# ------------------------------------------------------------------- tests

@needs_ref
def test_fcae_5_5_fc_full_parity():
    """5_5_fc model.ckpt (HEAD sex classifier): recon AND classifier
    log-probs match a torch forward on the same features <=1e-4."""
    model, variables, ported_cls = load_reference_fcae(FCAE_55)
    assert ported_cls, "5_5_fc ships the HEAD FullyConnSexClassifier"
    sd = load_state_dict_ckpt(FCAE_55)
    t_ae = _load_torch_fcae(sd)
    t_cls = _load_torch_sex_classifier(sd)

    rng = np.random.default_rng(0)
    feats = rng.standard_normal((3, 50, 80)).astype(np.float32)

    recon_j, sex_j = model.apply(variables, jnp.asarray(feats), train=False)
    with torch.no_grad():
        x = torch.as_tensor(feats)
        recon_t, z = t_ae(x)
        sex_t = t_cls(z)

    np.testing.assert_allclose(
        np.asarray(recon_j), recon_t.numpy(), atol=1e-4, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(sex_j), sex_t.numpy(), atol=1e-4, rtol=0
    )


@needs_ref
def test_fcae_recon_ckpt_parity_and_trained_statistics():
    """fullyconn_normalize recon1.0 model.ckpt: encoder/decoder port exact;
    on normalizer-standardized features the trained AE reconstructs far
    better than the best constant predictor."""
    path = os.path.join(FCAE_RECON_DIR, "model.ckpt")
    model, variables, ported_cls = load_reference_fcae(path)
    assert not ported_cls  # Dummy classifier variant — not the HEAD arch
    sd = load_state_dict_ckpt(path)
    t_ae = _load_torch_fcae(sd)

    rng = np.random.default_rng(1)
    feats = rng.standard_normal((2, 40, 80)).astype(np.float32)
    recon_j, _ = model.apply(variables, jnp.asarray(feats), train=False)
    with torch.no_grad():
        recon_t, _ = t_ae(torch.as_tensor(feats))
    np.testing.assert_allclose(np.asarray(recon_j), recon_t.numpy(), atol=1e-4, rtol=0)

    # trained-model statistics on realistic features: fbank of synthetic
    # speech-band audio, standardized with the SHIPPED normalizer stats
    from speech_anonymization_tpu.ops import Fbank

    norm_state = load_normalizer_ckpt(os.path.join(FCAE_RECON_DIR, "normalizer.ckpt"))
    assert float(norm_state.count) > 1e6  # stats from a real LibriSpeech run
    t = np.arange(32000) / 16000.0
    wav = np.zeros((2, 32000), np.float32)
    for i, f0 in enumerate((110.0, 220.0)):
        for h in range(1, 6):
            wav[i] += (0.3 / h) * np.sin(2 * np.pi * f0 * h * t + 0.1 * h)
    feats = np.asarray(Fbank()(jnp.asarray(wav)))
    x = (feats - np.asarray(norm_state.glob_mean)) / np.asarray(norm_state.glob_std)

    recon, _ = model.apply(variables, jnp.asarray(x), train=False)
    recon = np.asarray(recon)
    mse = float(np.mean((recon - x) ** 2))
    var = float(np.var(x))
    corr = float(np.corrcoef(recon.ravel(), x.ravel())[0, 1])
    # a trained recon1.0 AE must beat predicting the mean by a wide margin
    assert mse < 0.5 * var, (mse, var)
    assert corr > 0.75, corr


@needs_ref
def test_recon_recipe_accepts_reference_save_dir():
    """gender_classifier_train_recon's ``trained_recon_model_dir`` may point
    straight at a reference ``save/`` tree (torch ckpts are auto-detected)."""
    from speech_anonymization_tpu.recipes.gender_classifier import load_recon_model

    save_dir = os.path.dirname(FCAE_RECON_DIR)
    module, variables = load_recon_model(save_dir, model_type="fcae")
    feats = jnp.asarray(np.random.default_rng(3).standard_normal((1, 12, 80)), jnp.float32)
    recon, _ = module.apply(variables, feats, train=False)
    assert recon.shape == (1, 12, 80)
    # weights actually came from the torch ckpt, not a fresh init
    sd = load_state_dict_ckpt(os.path.join(FCAE_RECON_DIR, "model.ckpt"))
    np.testing.assert_allclose(
        np.asarray(variables["params"]["Dense_0"]["kernel"]),
        np.asarray(sd["0.encoder.0.weight"]).T,
        atol=0,
    )


@needs_ref
@pytest.mark.parametrize("ckpt", [CLS_128, CLS_512])
def test_classifier_head_parity(ckpt):
    model, variables = load_reference_classifier_head(ckpt)
    sd = load_state_dict_ckpt(ckpt)
    t_head = _load_torch_head(sd)
    d = int(np.asarray(sd["norm.norm.weight"]).shape[0])

    rng = np.random.default_rng(2)
    emb = rng.standard_normal((5, d)).astype(np.float32) * 3.0
    out_j = model.apply(variables, jnp.asarray(emb), train=False)
    with torch.no_grad():
        out_t = t_head(torch.as_tensor(emb))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=1e-4, rtol=0)
    # shipped head is a trained binary classifier: log-probs, 2 classes
    assert out_j.shape == (5, 2)
    np.testing.assert_allclose(np.exp(np.asarray(out_j)).sum(-1), 1.0, atol=1e-5)
