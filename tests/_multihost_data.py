"""Shared fixture for the multi-host test: deterministic synthetic loaders
and the tiny TrainerConfig, used identically by the 2-process workers and
the in-test single-process reference run so the two runs are comparable."""

import numpy as np

BATCH = 8
SHAPE = (16, 16, 16)
N_TRAIN_BATCHES = 2
N_EVAL_BATCHES = 1


class ListLoader:
    """Minimal loader protocol (len / peek / iter / batch_size) over a
    fixed list of numpy batches — identical on every process."""

    def __init__(self, batches):
        self.batches = batches
        self.batch_size = batches[0]["label"].shape[0]

    def __len__(self):
        return len(self.batches)

    def peek(self):
        return self.batches[0]

    def __iter__(self):
        return iter(self.batches)


def _batches(seed, n):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        out.append({
            "MRI": rng.standard_normal((BATCH, *SHAPE)).astype(np.float32),
            "PET": rng.standard_normal((BATCH, *SHAPE)).astype(np.float32),
            "label": rng.integers(0, 2, BATCH).astype(np.int32),
        })
    return out


def make_loaders():
    return (ListLoader(_batches(0, N_TRAIN_BATCHES)),
            ListLoader(_batches(1, N_EVAL_BATCHES)),
            ListLoader(_batches(2, N_EVAL_BATCHES)))


def trainer_config_kwargs():
    # SGD: linear in the gradient, so cross-process reduction-order noise
    # stays O(lr * eps) (same rationale as tests/test_parallel.py::_make)
    return dict(
        model="cnn_ad", dim=8, depth=1, heads=2,
        optimizer="SGD", lr=1e-2, epochs=2, aug=False,
        dtype="float32", use_pallas=False, progress=False,
        save_latest_every=1, seed=7,
    )
