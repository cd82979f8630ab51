"""Aggregator function tests.

Mirrors the reference's ``tests/test_aggregators.py`` (170 LoC) with
JAX arrays standing in for torch tensors (reference
``pulser-core/pulser/backend/aggregators.py:80-188``).
"""

from __future__ import annotations

from collections import Counter
from unittest.mock import patch

import jax.numpy as jnp
import numpy as np
import pytest

from pulser_tpu.backend.aggregators import (
    _bag_union_aggregator,
    _mean_aggregator,
    _mean_std_aggregator,
    _std_aggregator,
)


def test_bag_union():
    counter1 = {"1010": 5, "0101": 7, "0000": 2}
    counter2 = Counter({"1010": 3, "0101": 9, "1111": 4})

    union = _bag_union_aggregator([counter1, counter2])
    assert union == {"1010": 8, "0101": 16, "0000": 2, "1111": 4}


@pytest.mark.parametrize("test_jax", [True, False])
def test_mean_aggregator(test_jax: bool):
    values = [1.0, 2.0, 3.0, 4.0]
    assert _mean_aggregator(values) == 2.5

    values2 = [1.0j, 2.0j, 3.0j, 4.0j]
    assert _mean_aggregator(values2) == 2.5j

    values3 = [
        np.array([1.0, 2.0, 3.0]),
        np.array([2.0, 3.0, 4.0]),
        np.array([3.0, 4.0, 5.0]),
    ]
    assert np.all(
        _mean_aggregator(values3) == np.array([2.0, 3.0, 4.0])
    )

    values4 = [[1.0, 2.0, 3.0], [2.0, 3.0, 4.0], [3.0, 4.0, 5.0]]
    assert _mean_aggregator(values4) == [2.0, 3.0, 4.0]

    values5 = [[[1.0, 2.0, 3.0]], [[2.0, 3.0, 4.0]], [[3.0, 4.0, 5.0]]]
    assert _mean_aggregator(values5) == [[2.0, 3.0, 4.0]]

    if test_jax:
        values6 = [
            jnp.array([1.0, 2.0, 3.0]),
            jnp.array([2.0, 3.0, 4.0]),
            jnp.array([3.0, 4.0, 5.0]),
        ]
        assert jnp.allclose(
            _mean_aggregator(values6), jnp.array([2.0, 3.0, 4.0])
        )


def test_mean_aggregator_errors():
    with pytest.raises(ValueError, match="Cannot process 0 samples."):
        _mean_aggregator([])

    with pytest.raises(
        ValueError, match="Cannot process list of empty lists."
    ):
        _mean_aggregator([[], []])

    with pytest.raises(
        ValueError,
        match="Need to supply a list of values to process.",
    ):
        _mean_aggregator("abcd")

    with pytest.raises(
        ValueError, match="Mean aggregator cannot process data"
    ):
        _mean_aggregator([{}, {}])

    with pytest.raises(
        ValueError,
        match=f"Cannot process list of lists of {type({})}.",
    ):
        _mean_aggregator([[{}], [{}]])

    with pytest.raises(
        ValueError,
        match=f"Cannot process list of matrices of {type('a')}.",
    ):
        _mean_aggregator([[["abcd"]], [["efgh"]]])

    with pytest.raises(
        ValueError,
        match="Cannot process list of matrices with empty columns.",
    ):
        _mean_aggregator([[[]], [[]]])


@pytest.mark.parametrize("test_jax", [True, False])
def test_std_aggregator(test_jax: bool):
    values = [1.0, 2.0, 3.0, 4.0]
    assert np.isclose(_std_aggregator(values), 1.2909944487358056)

    values2 = [1.0j, 2.0j, 3.0j, 4.0j]
    assert np.isclose(
        abs(_std_aggregator(values2)), 1.2909944487358056
    )

    values3 = [
        np.array([1.0, 2.0, 3.0]),
        np.array([2.0, 3.0, 4.0]),
        np.array([3.0, 4.0, 5.0]),
    ]
    assert np.all(
        _std_aggregator(values3) == np.array([1.0, 1.0, 1.0])
    )

    values4 = [[1.0, 2.0, 3.0], [2.0, 3.0, 4.0], [3.0, 4.0, 5.0]]
    assert _std_aggregator(values4) == [1.0, 1.0, 1.0]

    values5 = [[[1.0, 2.0, 3.0]], [[2.0, 3.0, 4.0]], [[3.0, 4.0, 5.0]]]
    assert _std_aggregator(values5) == [[1.0, 1.0, 1.0]]

    if test_jax:
        values6 = [
            jnp.array([1.0, 2.0, 3.0]),
            jnp.array([2.0, 3.0, 4.0]),
            jnp.array([3.0, 4.0, 5.0]),
        ]
        assert jnp.allclose(
            _std_aggregator(values6), jnp.array([1.0, 1.0, 1.0])
        )


def test_std_aggregator_errors():
    with pytest.raises(ValueError, match="Cannot process 0 samples."):
        _std_aggregator([])

    with pytest.raises(
        ValueError, match="Cannot process list of empty lists."
    ):
        _std_aggregator([[], []])

    with pytest.raises(
        ValueError,
        match="Need to supply a list of values to process.",
    ):
        _std_aggregator("abcd")

    with pytest.raises(
        ValueError, match="Std aggregator cannot process data"
    ):
        _std_aggregator([{}, {}])

    with pytest.raises(
        ValueError,
        match=f"Cannot process list of lists of {type({})}.",
    ):
        _std_aggregator([[{}], [{}]])

    with pytest.raises(
        ValueError,
        match=f"Cannot process list of matrices of {type('a')}.",
    ):
        _std_aggregator([[["abcd"]], [["efgh"]]])

    with pytest.raises(
        ValueError,
        match="Cannot process list of matrices with empty columns.",
    ):
        _std_aggregator([[[]], [[]]])


def test_mean_std_aggregator():
    with patch(
        "pulser_tpu.backend.aggregators._mean_aggregator"
    ) as mock_mean, patch(
        "pulser_tpu.backend.aggregators._std_aggregator"
    ) as mock_std:
        mock_mean.return_value = 5.5
        mock_std.return_value = 6.5
        values = [1000.0, 2000.0]
        result = _mean_std_aggregator(values)
        mock_mean.assert_called_once_with(values)
        mock_std.assert_called_once_with(values)
        assert result == (5.5, 6.5)
