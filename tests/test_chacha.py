"""ChaCha8 RNG core (astarpa_tpu/chacha.py): the block function is checked
against the RFC 8439 quarter-round and 20-round block vectors (the 8-round
variant is the identical core with fewer double rounds)."""

import numpy as np

from astarpa_tpu.chacha import ChaCha8Rng, chacha_core, seed_from_u64


def test_rfc8439_quarter_round():
    from astarpa_tpu.chacha import _qr

    x = np.array(
        [[0x11111111], [0x01020304], [0x9B8D6F43], [0x01234567]], dtype=np.uint32
    )
    with np.errstate(over="ignore"):
        _qr(x, 0, 1, 2, 3)
    assert [hex(int(v)) for v in x[:, 0]] == [
        hex(0xEA2A92F4),
        hex(0xCB1CF8CE),
        hex(0x4581472E),
        hex(0x5881C4BB),
    ]


def test_rfc8439_block():
    # RFC 8439 section 2.3.2: 20 rounds, IETF layout (32-bit counter in
    # word 12, 96-bit nonce in words 13-15).
    key = bytes(range(32))
    init = np.zeros((16, 1), dtype=np.uint32)
    init[0:4, 0] = [0x61707865, 0x3320646E, 0x79622D32, 0x6B206574]
    init[4:12, 0] = np.frombuffer(key, dtype="<u4")
    init[12, 0] = 1
    init[13, 0] = 0x09000000
    init[14, 0] = 0x4A000000
    init[15, 0] = 0x00000000
    out = chacha_core(init, 20)
    expect = [
        0xE4E7F110, 0x15593BD1, 0x1FDD0F50, 0xC47120A3,
        0xC7F4D1C7, 0x0368C033, 0x9AAA2204, 0x4E6CD4C3,
        0x466482D2, 0x09AA9F07, 0x05D7C214, 0xA2028BD9,
        0xD19C12B5, 0xB94E16DE, 0xE883D0CB, 0x4E3C50A2,
    ]
    assert [int(v) for v in out[:, 0]] == expect
    # Serialization order: little-endian per word.
    ks = out[:, 0].astype("<u4").tobytes()
    assert ks[:16].hex() == "10f1e7e4d13b5915500fdd1fa32071c4"
    assert ks[-16:].hex() == "b5129cd1de164eb9cbd083e8a2503c4e"


def test_seed_from_u64_expansion():
    # rand_core expands the u64 with PCG32; deterministic and seed-sensitive.
    s0, s1 = seed_from_u64(0), seed_from_u64(1)
    assert len(s0) == 32 and s0 != s1
    assert seed_from_u64(0) == s0


def test_stream_and_refill_continuity():
    rng = ChaCha8Rng.seed_from_u64(42)
    a = rng.words(10_000)
    rng2 = ChaCha8Rng.seed_from_u64(42)
    # Different read granularity, same stream (refills are transparent).
    b = np.concatenate([rng2.words(1) for _ in range(7)] + [rng2.words(9_993)])
    assert np.array_equal(a, b)
    # Streams are independent sequences.
    c = ChaCha8Rng.seed_from_u64(42, stream=1).words(10_000)
    assert not np.array_equal(a, c)
    # 8 rounds, not 20: differs from the 20-round core on the same state.
    rng3 = ChaCha8Rng.seed_from_u64(42)
    rng3.ROUNDS = 20
    assert not np.array_equal(a, rng3.words(10_000))


def test_integers_uniform():
    rng = ChaCha8Rng.seed_from_u64(7)
    xs = rng.integers(0, 4, size=40_000)
    assert xs.min() == 0 and xs.max() == 3
    counts = np.bincount(xs)
    assert (np.abs(counts - 10_000) < 500).all()
    # Scalar form + non-zero low.
    vals = {int(rng.integers(3, 11)) for _ in range(500)}
    assert vals == set(range(3, 11))


def test_generate_chacha8_backend():
    from astarpa_tpu import generate

    a, b = generate.generate_model(
        2000, 0.1, generate.ErrorModel.UNIFORM, seed=5, rng="chacha8"
    )
    a2, b2 = generate.generate_model(
        2000, 0.1, generate.ErrorModel.UNIFORM, seed=5, rng="chacha8"
    )
    assert (a, b) == (a2, b2)
    assert set(a) <= set(b"ACGT") and abs(len(b) - 2000) < 400
    # Distinct from the numpy backend and across seeds.
    a3, _ = generate.generate_model(2000, 0.1, seed=5)
    assert a3 != a
    a4, _ = generate.generate_model(
        2000, 0.1, generate.ErrorModel.UNIFORM, seed=6, rng="chacha8"
    )
    assert a4 != a
    # Batch: per-pair streams from one seed.
    pairs = generate.generate_batch(
        3, 500, 0.05, generate.ErrorModel.UNIFORM, seed=9, rng="chacha8"
    )
    assert len({p[0] for p in pairs}) == 3
    # All error models run under the chacha backend.
    for model in generate.ErrorModel:
        aa, bb = generate.generate_model(800, 0.12, model, seed=3, rng="chacha8")
        assert len(aa) > 0 and len(bb) > 0
