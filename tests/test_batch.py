"""Batched device API == per-pair align(), for every mode and task."""

import numpy as np
import pytest

from edlib_tpu import align, align_batch


def make_pairs(rng, n=24, sigma=4, qmax=80, tmax=400):
    queries, targets = [], []
    alpha = b"ACGTXYZU"[:sigma]
    for _ in range(n):
        qlen = rng.randint(1, qmax)
        tlen = rng.randint(1, tmax)
        queries.append(bytes(rng.choice(list(alpha), qlen).tolist()))
        targets.append(bytes(rng.choice(list(alpha), tlen).tolist()))
    return queries, targets


@pytest.fixture(scope="module")
def shared_pairs():
    # One pair set for every mode/task combo so compiled sweep shapes are
    # reused across the parametrized tests.
    return make_pairs(np.random.RandomState(42))


@pytest.mark.parametrize("task", ["distance", "locations", "path"])
@pytest.mark.parametrize("mode", ["NW", "SHW", "HW"])
def test_batch_matches_single(mode, task, shared_pairs):
    queries, targets = shared_pairs
    batch = align_batch(queries, targets, mode=mode, task=task,
                        backend="jax")
    for q, t, got in zip(queries, targets, batch):
        want = align(q, t, mode=mode, task=task)
        assert got == want, f"mode={mode} task={task} q={q!r} t={t!r}"


def test_batch_with_k_and_equalities(rng):
    queries, targets = make_pairs(rng, n=10)
    eqs = [("A", "C")]
    for k in (-1, 3, 0):
        batch = align_batch(queries, targets, mode="HW", task="locations",
                            k=k, additionalEqualities=eqs, backend="jax")
        for q, t, got in zip(queries, targets, batch):
            want = align(q, t, mode="HW", task="locations", k=k,
                         additionalEqualities=eqs)
            assert got == want


def test_batch_broadcast_target_and_empty(rng):
    queries = [b"ACGT", b"", b"TTTT", b"ACG"]
    res = align_batch(queries, b"ACGTACGT", mode="HW", task="path",
                      backend="jax")
    for q, got in zip(queries, res):
        assert got == align(q, b"ACGTACGT", mode="HW", task="path")
    # Empty target in the batch.
    res = align_batch([b"AC", b"A"], [b"", b"G"], mode="NW",
                      backend="jax")
    assert res[0] == align(b"AC", b"")
    assert res[1] == align(b"A", b"G")


def test_batch_word_boundaries(rng):
    # Query lengths crossing 32/64-bit word boundaries + the -1 quirk.
    queries, targets = [], []
    for qlen in (1, 31, 32, 33, 64, 65, 128):
        queries.append(bytes(rng.choice(list(b"AB"), qlen).tolist()))
        targets.append(b"B")
    for mode in ("HW", "SHW", "NW"):
        batch = align_batch(queries, targets, mode=mode,
                            task="locations", backend="jax")
        for q, t, got in zip(queries, targets, batch):
            assert got == align(q, t, mode=mode, task="locations")


def test_batch_hashable_fallback():
    res = align_batch([[1, 2, 3]], [[1, 2, 4]])
    assert res[0]["editDistance"] == 1


def test_batch_auto_routes_host_without_device(rng, monkeypatch):
    """backend="auto" with no device (and none forced) must use the native
    host loop — the CPU XLA fallback is ~20x slower — with identical
    results; "jax" still forces the device driver."""
    monkeypatch.delenv("EDLIB_TPU_FORCE_PALLAS", raising=False)
    monkeypatch.setenv("EDLIB_TPU_DISABLE_DEVICE", "1")
    import edlib_tpu.align as align_mod
    calls = []
    import edlib_tpu.batch as batch_mod
    orig = batch_mod.align_batch_device

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(batch_mod, "align_batch_device", spy)
    queries, targets = make_pairs(rng, n=6)
    auto = align_batch(queries, targets, mode="HW", task="locations")
    assert not calls  # host loop, device driver untouched
    forced = align_batch(queries, targets, mode="HW", task="locations",
                         backend="jax")
    assert calls
    assert auto == forced
