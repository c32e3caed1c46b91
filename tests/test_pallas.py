"""Pallas staggered-kernel parity tests (TPU only).

Kernel self-check strategy per SURVEY.md §4: the Pallas kernel must agree
with the jnp reference (`ops.myers`) and the oracle on the same inputs.
XLA:CPU cannot compile the interpreted kernel in reasonable time (the
per-step interpret graph explodes), so these tests run only when a real TPU
is attached; `scripts/check_tpu.py` runs the same checks at larger shapes.
"""

import numpy as np
import pytest

from astarpa_tpu import generate, oracle


def _has_tpu() -> bool:
    try:
        import jax

        return jax.devices()[0].platform.lower() in ("tpu", "axon")
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _has_tpu(), reason="needs a TPU device")


@pytest.fixture(scope="module")
def interpret_mode():
    yield  # on-device, no interpretation needed


def test_nw_cost_pairs_vs_oracle(interpret_mode):
    from astarpa_tpu.ops import pallas_myers

    rng = np.random.default_rng(7)
    pairs = [(b"ACTCGCT", b"AACTCGTT"), (b"A", b"T"), (b"ACGT", b"ACGT"), (b"AAAA", b"A")]
    for n, e in [(20, 0.1), (33, 0.3), (40, 0.0)]:
        pairs.append(
            generate.generate_model(n, e, generate.ErrorModel.UNIFORM, int(rng.integers(1 << 31)))
        )
    got = list(pallas_myers.nw_cost_pairs(pairs, lanes_per_program=128))
    want = [oracle.levenshtein(a, b) for a, b in pairs]
    assert got == want


def test_ragged_batch(interpret_mode):
    from astarpa_tpu.ops import pallas_myers

    # Very different lengths in one batch exercise the activity masking,
    # including m spanning multiple words (65 rows -> 3 words).
    pairs = [
        (b"A" * 5, b"A" * 65),
        (b"ACGT" * 10, b"ACGT" * 16),
        (b"T" * 40, b"T" * 3),
        (b"G", b"C"),
    ]
    got = list(pallas_myers.nw_cost_pairs(pairs, lanes_per_program=128))
    want = [oracle.levenshtein(a, b) for a, b in pairs]
    assert got == want
