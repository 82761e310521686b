"""Prefetching loader tests: ordering, parity with the plain loader,
error propagation."""

import numpy as np
import pytest

from speech_anonymization_tpu.data.dataset import DynamicItemDataset, SaveableDataLoader
from speech_anonymization_tpu.data.prefetch import PrefetchLoader


def _dataset(n=20):
    data = {str(i): {"value": i, "duration": float(i)} for i in range(n)}
    ds = DynamicItemDataset(data)
    ds.add_dynamic_item(lambda v: np.full((4,), float(v), np.float32), takes=["value"], provides=["sig"])
    ds.set_output_keys(["id", "sig"])
    return ds


def test_prefetch_matches_plain_loader():
    ds = _dataset()
    plain = SaveableDataLoader(ds, batch_size=3, shuffle=True, seed=7)
    pf = PrefetchLoader(SaveableDataLoader(ds, batch_size=3, shuffle=True, seed=7), 2, 4)
    b1 = [b.sig[0] for b in plain]
    b2 = [b.sig[0] for b in pf]
    assert len(b1) == len(b2)
    for a, b in zip(b1, b2):
        np.testing.assert_array_equal(a, b)


def test_prefetch_multiple_epochs():
    ds = _dataset(9)
    pf = PrefetchLoader(SaveableDataLoader(ds, batch_size=2), 2, 2)
    for _ in range(3):
        assert sum(1 for _ in pf) == 5


def test_prefetch_propagates_errors():
    ds = _dataset(6)
    ds.add_dynamic_item(
        lambda v: (_ for _ in ()).throw(ValueError("boom")) if v == 3 else v,
        takes=["value"],
        provides=["maybe"],
    )
    ds.set_output_keys(["id", "maybe"])
    pf = PrefetchLoader(SaveableDataLoader(ds, batch_size=2), 1, 2)
    with pytest.raises(ValueError):
        list(pf)
