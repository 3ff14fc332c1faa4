"""scan_time: the relay-proof device timer (benchmarks/device_time.py)."""

import sys
from pathlib import Path

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent.parent / "benchmarks"))

from device_time import scan_time  # noqa: E402


def test_scan_time_basic():
    x = np.ones((64, 64), np.float32)
    ms, total = scan_time(lambda a: a * 2.0, (x,), iters=4)
    assert ms > 0
    # carry perturbs the input by +i each step: sum over steps of
    # sum(2*(x+i)) = sum_i 2*(4096 + 4096*i)
    expected = sum(2 * (4096 + 4096 * i) for i in range(4))
    assert total == expected


def test_scan_time_perturb_index_and_pytree():
    a = np.ones((8,), np.float32)
    b = np.full((8,), 3.0, np.float32)
    ms, total = scan_time(
        lambda u, v: {"s": u + v, "d": u - v}, (a, b),
        perturb_index=1, iters=2,
    )
    assert ms > 0
    # step i: v = b + i; sum(u+v) + sum(u-v) = sum(2u) = 16 each step
    assert total == 32.0


def test_scan_time_iterations_not_hoisted():
    # The body's input must differ per step (else XLA could CSE the scan
    # body to one evaluation); the accumulated value proves each step saw
    # a different input.
    x = np.zeros((4,), np.float32)
    _, total = scan_time(lambda a: jnp.sum(a), (x,), iters=3)
    assert total == 0 + 4 + 8
