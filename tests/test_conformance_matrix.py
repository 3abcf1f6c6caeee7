"""Conformance matrix over the BASELINE.json configuration space:
gray/4:2:0/4:2:2/4:4:4 x 8/12-bit x RST/no-RST x default/optimized tables,
all gated on bit-exactness against the reference binary.
"""

import itertools

import pytest

import jpeg_tpu
from jpeg_tpu.encoder import EncodeParams, encode_jpeg
from refbin import (
    ReferenceEncodeFailed,
    ensure_reference_binaries,
    make_pgm,
    make_ppm,
    ref_decode,
    ref_encode,
)

pytestmark = [
    pytest.mark.slow,  # quick tier: -m 'not slow'
    pytest.mark.skipif(
        ensure_reference_binaries() is None,
        reason="reference toolchain unavailable",
    ),
]

SUBSAMPLING = [("gray", 1, 1), ("444", 1, 1), ("422", 2, 1), ("420", 2, 2)]
PRECISION = [255, 4095]
OPTIMIZE = [0, 1]


@pytest.mark.parametrize(
    "mode,h,v,maxval,optimize",
    [
        (m, h, v, p, o)
        for (m, h, v), p, o in itertools.product(SUBSAMPLING, PRECISION, OPTIMIZE)
    ],
)
def test_matrix_roundtrip_bit_exact(mode, h, v, maxval, optimize):
    """Encoder byte-identical; decoder bit-exact; per config cell."""
    seed = hash((mode, maxval, optimize)) % 1000
    if mode == "gray":
        pnm = make_pgm(41, 27, seed=seed, maxval=maxval)
    else:
        pnm = make_ppm(41, 27, seed=seed, maxval=maxval)

    try:
        theirs = ref_encode(pnm, h=h, v=v, q=75, optimize=optimize)
    except ReferenceEncodeFailed:
        # The reference can't encode some 12-bit content: default tables
        # lack DC categories > 11 (value_to_vlc hard-fails), and its
        # optimized path asserts an 8-bit DC-diff range (encoder.c:447)
        # that 12-bit legitimately exceeds.
        if not optimize:
            # Parity: our encoder must also refuse default-table encodes
            # whose content exceeds the table range.
            with pytest.raises(jpeg_tpu.UnsupportedError):
                encode_jpeg(
                    pnm, EncodeParams(h=h, v=v, quality=75, optimize=False)
                )
        else:
            # We go beyond the reference here (its 12-bit assert is an
            # 8-bit leftover): our stream must still decode bit-exact by
            # the reference DECODER, which handles 12-bit fine.
            ours = encode_jpeg(
                pnm, EncodeParams(h=h, v=v, quality=75, optimize=True)
            )
            assert (
                jpeg_tpu.decode_jpeg(ours, exact=True).to_pnm()
                == ref_decode(ours)
            )
        return

    ours = encode_jpeg(
        pnm, EncodeParams(h=h, v=v, quality=75, optimize=bool(optimize))
    )
    assert ours == theirs, "encoder not byte-identical"
    assert jpeg_tpu.decode_jpeg(ours, exact=True).to_pnm() == ref_decode(theirs)


@pytest.mark.parametrize("mode,h,v", SUBSAMPLING)
def test_matrix_restart_interval(mode, h, v):
    """RST streams (our emission extension) decode bit-exact everywhere."""
    seed = hash((mode, "rst")) % 1000
    pnm = (
        make_pgm(41, 27, seed=seed) if mode == "gray" else make_ppm(41, 27, seed=seed)
    )
    jpg = encode_jpeg(
        pnm, EncodeParams(h=h, v=v, quality=75, restart_interval=2)
    )
    golden = ref_decode(jpg)
    for backend in ("serial", "lockstep", "lockstep-jax", "native"):
        try:
            out = jpeg_tpu.decode_jpeg(jpg, exact=True, entropy=backend).to_pnm()
        except Exception as e:  # noqa: BLE001 - native may be unavailable
            if backend == "native":
                pytest.skip(f"native backend unavailable: {e}")
            raise
        assert out == golden, backend


@pytest.mark.parametrize("q", [1, 10, 25, 50, 75, 90, 95, 100])
def test_quality_sweep_byte_identical(q):
    """BASELINE.json config: quality sweep -- encode byte-identity and
    decode bit-exactness hold across the quality range."""
    pnm = make_ppm(48, 32, seed=200 + q)
    params = EncodeParams(h=2, v=2, quality=q, optimize=True)
    ours = encode_jpeg(pnm, params)
    assert ours == ref_encode(pnm, h=2, v=2, q=q, optimize=1)
    assert jpeg_tpu.decode_jpeg(ours).to_pnm() == ref_decode(ours)
