"""valid_frontier checkpoint selection (recipes/anonymizer.py
on_evaluate_start) — VERDICT r4 #3.

Unit tests drive the selection branch over a synthetic checkpoint set
with crafted ACC_external/Utility_Retention meta (the pick under the
utility floor, the tie-break, the empty-pool fallback, the no-meta
fallback to top-k averaging); the e2e test wires
``--eval_ckpt_select valid_frontier`` through the real recipe with
``--eval_only`` against checkpoints produced by a prior training run.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_anonymization_tpu.recipes import anonymizer as recipe
from speech_anonymization_tpu.train.checkpoint import Checkpointer
from tests.fixtures import make_fake_librispeech

CFG = os.path.join(os.path.dirname(__file__), "..", "configs", "convae.yaml")


class _State:
    def __init__(self, params):
        self.params = params


class _StubBrain:
    """Minimal host for the unbound on_evaluate_start hook."""

    def __init__(self, checkpointer, hparams, template):
        self.checkpointer = checkpointer
        self.hparams = hparams
        self.state = _State(template)
        self.set_calls = []

    def _set(self, **kw):
        self.set_calls.append(kw)


def _make_ckpts(tmp_path, metas):
    """One checkpoint per meta dict; the 'model' pytree encodes the epoch
    number so the loaded params identify which checkpoint was picked."""
    ckpt = Checkpointer(str(tmp_path / "ckpts"))
    for meta in metas:
        ckpt.recoverables["model"] = {"w": jnp.full((2,), float(meta.get("epoch", -1)))}
        ckpt.save_checkpoint(meta, name=f"CKPT+e{meta.get('epoch', 'x')}")
    return ckpt


def _run(tmp_path, metas, min_utility=None):
    ckpt = _make_ckpts(tmp_path, metas)
    hparams = {"eval_ckpt_select": "valid_frontier"}
    if min_utility is not None:
        hparams["eval_ckpt_min_utility"] = min_utility
    stub = _StubBrain(ckpt, hparams, {"w": jnp.zeros((2,))})
    recipe.SexAnonymizationBrain.on_evaluate_start(stub)
    return stub


def test_frontier_picks_closest_to_chance_above_floor(tmp_path):
    stub = _run(
        tmp_path,
        [
            {"epoch": 1, "ACC_external": 0.90, "Utility_Retention": 0.95},
            {"epoch": 2, "ACC_external": 0.55, "Utility_Retention": 0.90},
            # closest to chance overall, but below the 0.85 utility floor
            {"epoch": 3, "ACC_external": 0.51, "Utility_Retention": 0.80},
            {"epoch": 4, "ACC_external": 0.60, "Utility_Retention": 0.88},
        ],
    )
    assert stub.selected_ckpt_meta["epoch"] == 2
    assert stub.selected_ckpt_meta["pool_n"] == 3  # epochs 1, 2, 4
    assert stub.selected_ckpt_meta["kept_n"] == 4
    # the picked checkpoint's params were actually loaded
    (call,) = stub.set_calls
    np.testing.assert_allclose(np.asarray(call["params"]["w"]), 2.0)


def test_frontier_tiebreak_prefers_higher_utility(tmp_path):
    stub = _run(
        tmp_path,
        [
            # same |ACC - 0.5| = 0.1 on both sides of chance
            {"epoch": 1, "ACC_external": 0.60, "Utility_Retention": 0.90},
            {"epoch": 2, "ACC_external": 0.40, "Utility_Retention": 0.97},
        ],
    )
    assert stub.selected_ckpt_meta["epoch"] == 2
    (call,) = stub.set_calls
    np.testing.assert_allclose(np.asarray(call["params"]["w"]), 2.0)


def test_frontier_empty_pool_falls_back_to_max_utility(tmp_path):
    stub = _run(
        tmp_path,
        [
            # every epoch below the floor: fall back to the single
            # max-utility checkpoint (NOT the closest-to-chance one)
            {"epoch": 1, "ACC_external": 0.50, "Utility_Retention": 0.40},
            {"epoch": 2, "ACC_external": 0.95, "Utility_Retention": 0.70},
        ],
    )
    assert stub.selected_ckpt_meta["epoch"] == 2
    assert stub.selected_ckpt_meta["pool_n"] == 1


def test_frontier_custom_floor(tmp_path):
    stub = _run(
        tmp_path,
        [
            {"epoch": 1, "ACC_external": 0.55, "Utility_Retention": 0.60},
            {"epoch": 2, "ACC_external": 0.80, "Utility_Retention": 0.95},
        ],
        min_utility=0.5,
    )
    assert stub.selected_ckpt_meta["epoch"] == 1


def test_no_frontier_meta_falls_back_to_averaging(tmp_path):
    """Checkpoints without ACC_external/Utility_Retention meta must NOT be
    mislabeled as a frontier pick (ADVICE r4 medium): selected_ckpt_meta
    stays unset and the default top-k averaging branch runs."""
    stub = _run(tmp_path, [{"epoch": 1}, {"epoch": 2}])
    assert not hasattr(stub, "selected_ckpt_meta")
    # averaging branch ran over both checkpoints: mean of epochs 1 and 2
    (call,) = stub.set_calls
    np.testing.assert_allclose(np.asarray(call["params"]["w"]), 1.5)


# ---- e2e: the CLI knob reaches the hook through the real recipe ----------


def _argv(root, out, **overrides):
    base = {
        "data_folder": root,
        "train_splits": '["train-clean"]',
        "dev_splits": '["train-clean"]',
        "test_splits": '["train-clean"]',
        "train_csv": os.path.join(root, "train-clean.csv"),
        "valid_csv": os.path.join(root, "train-clean.csv"),
        "test_csv": f'["{os.path.join(root, "train-clean.csv")}"]',
        "output_folder": out,
        "save_folder": os.path.join(out, "save"),
        "train_log": os.path.join(out, "train_log.txt"),
        "batch_size": "4",
        "gradient_accumulation": "1",
    }
    base.update({k: str(v) for k, v in overrides.items()})
    argv = [CFG]
    for k, v in base.items():
        argv += [f"--{k}", v]
    return argv


def test_load_recon_model_valid_frontier(tmp_path):
    """The retrained-attacker path must be able to attack the SAME
    checkpoint the valid_frontier evaluation reports (ADVICE r4 follow-on:
    attack_retrain otherwise silently attacks the max-utility epoch)."""
    from speech_anonymization_tpu.recipes.anonymizer import MODEL_TYPES
    from speech_anonymization_tpu.recipes.gender_classifier import (
        load_recon_model,
    )

    module = MODEL_TYPES["fcae"]()
    rng = jax.random.PRNGKey(0)
    variables = module.init({"params": rng, "dummy": rng},
                            jnp.zeros((1, 8, 80)), train=False)
    ckpt_dir = str(tmp_path / "ckpts")
    ckptr = Checkpointer(ckpt_dir)
    metas = [
        {"epoch": 1, "ACC_external": 0.9, "Utility_Retention": 0.99},
        {"epoch": 2, "ACC_external": 0.55, "Utility_Retention": 0.90},
        {"epoch": 3, "ACC_external": 0.50, "Utility_Retention": 0.40},
    ]
    for meta in metas:
        e = float(meta["epoch"])
        ckptr.recoverables["model"] = jax.tree.map(
            lambda a, e=e: a + e, variables["params"])
        ckptr.recoverables["model_state"] = {
            k: v for k, v in variables.items() if k != "params"}
        ckptr.save_checkpoint(meta, name=f"CKPT+e{meta['epoch']}")

    def _leaf(vs):
        return np.asarray(jax.tree.leaves(vs["params"])[0])

    base = _leaf(variables)
    _, vs = load_recon_model(ckpt_dir, "fcae", ckpt_select="valid_frontier")
    np.testing.assert_allclose(_leaf(vs), base + 2.0)  # epoch 2: frontier
    _, vs = load_recon_model(ckpt_dir, "fcae")  # default: max utility
    np.testing.assert_allclose(_leaf(vs), base + 1.0)  # epoch 1


def test_eval_only_valid_frontier_e2e(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ls_vf"))
    make_fake_librispeech(root, utts_per_speaker=3, duration_s=0.7)
    out = str(tmp_path_factory.mktemp("out_vf"))
    # train 2 epochs -> per-epoch checkpoints with frontier meta on disk
    recipe.main(_argv(root, out, model_type="fcae", number_of_epochs=2))
    brain = recipe.main(
        _argv(root, out, model_type="fcae", number_of_epochs=2)
        + ["--eval_only", "--eval_ckpt_select", "valid_frontier",
           # fixture utilities are low; floor 0 keeps the pool non-empty
           "--eval_ckpt_min_utility", "0.0"]
    )
    sel = getattr(brain, "selected_ckpt_meta", None)
    assert sel is not None, "frontier branch did not run through the CLI"
    assert sel["epoch"] in (1, 2)
    assert sel["pool_n"] >= 1 and sel["kept_n"] >= 1
    assert "ACC" in brain.test_stats
