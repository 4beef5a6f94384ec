"""Label-set algebra vs the reference semantics (labels/mod.rs tests,
labels/mod.rs:249-425)."""

import numpy as np
import pytest

from pgvectorscale_tpu import labels as L


def sets_to_array(sets, width):
    return L.make_label_array(sets, width)


def test_make_label_array_sorts_dedups():
    arr = sets_to_array([[3, 1, 3, 2], None, []], 4)
    assert arr[0].tolist() == [1, 2, 3, int(L.LABEL_SENTINEL)]
    assert (arr[1] == L.LABEL_SENTINEL).all()
    assert (arr[2] == L.LABEL_SENTINEL).all()


def test_label_bounds():
    with pytest.raises(ValueError):
        sets_to_array([[40000]], 2)
    with pytest.raises(ValueError):
        sets_to_array([[-40000]], 2)
    sets_to_array([[-32768, 32767]], 2)  # bounds OK


def test_too_many_labels():
    with pytest.raises(ValueError):
        sets_to_array([[1, 2, 3]], 2)


@pytest.mark.parametrize(
    "a,b,want",
    [
        ([1, 2], [2, 3], True),
        ([1, 2], [3, 4], False),
        ([], [1], False),
        ([], [], False),
        ([5], [5], True),
        ([-3, 7], [7], True),
    ],
)
def test_overlaps(a, b, want):
    arr = sets_to_array([a, b], 4)
    got = bool(np.asarray(L.overlaps(arr[0], arr[1])))
    assert got == want
    # symmetric
    assert bool(np.asarray(L.overlaps(arr[1], arr[0]))) == want


@pytest.mark.parametrize(
    "self_l,a,b,want",
    [
        # a ∩ b = {2}; self contains 2 -> True
        ([2, 9], [1, 2], [2, 3], True),
        # a ∩ b = {2}; self misses 2 -> False
        ([9], [1, 2], [2, 3], False),
        # a ∩ b empty -> vacuously True
        ([9], [1], [2], True),
        ([], [1], [2], True),
        # a ∩ b = {1, 2}; self has only 1 -> False
        ([1], [1, 2], [1, 2], False),
        # a ∩ b = {1, 2}; self has both -> True
        ([1, 2], [1, 2], [1, 2], True),
        ([], [], [], True),
    ],
)
def test_contains_intersection(self_l, a, b, want):
    width = 4
    arrs = sets_to_array([self_l, a, b], width)
    got = bool(np.asarray(L.contains_intersection(arrs[0], arrs[1], arrs[2])))
    assert got == want


def test_contains_intersection_batch(rng):
    """Randomized cross-check vs python sets."""
    width = 5
    for _ in range(50):
        mk = lambda: rng.choice(10, size=rng.integers(0, width + 1), replace=False)
        s, a, b = mk(), mk(), mk()
        arrs = sets_to_array([s, a, b], width)
        want = (set(a) & set(b)) <= set(s)
        got = bool(
            np.asarray(L.contains_intersection(arrs[0], arrs[1], arrs[2]))
        )
        assert got == want, (s, a, b)


def test_array_overlap_operator():
    # smallint_array_overlap, both small and hashed paths
    assert L.array_overlap([1, 2, 3], [3, 9])
    assert not L.array_overlap([1, 2], [4])
    big_a = list(range(100))
    big_b = list(range(99, 200))
    assert L.array_overlap(big_a, big_b)
    assert not L.array_overlap(big_a, list(range(100, 200)))
