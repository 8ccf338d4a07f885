"""Native IO runtime tests (C++ library via ctypes + Python fallback)."""

import numpy as np
import pytest

from physicsbasedbayesianinference_tpu import native
from physicsbasedbayesianinference_tpu.config import RunConfig
from physicsbasedbayesianinference_tpu.main import run


def test_native_library_builds():
    # the toolchain is part of this environment; the library must build
    assert native.native_available(), native._build_error


PL3 = (" 3  220.0 0.1\n0.9999\n1e-5\n9e-5\n"
       "0 0 0\n1 0 0\n-2.25 0 0\n"
       "0 0 0\n0 1 0\n0 -0.66667 0\n")


def test_parse_nbody_native():
    m, x, v, tmax, dt = native.parse_nbody_text(PL3)
    assert m.shape == (3,) and x.shape == (3, 3) and v.shape == (3, 3)
    assert (tmax, dt) == (220.0, 0.1)
    assert x[2, 0] == -2.25 and v[2, 1] == -0.66667


def test_parse_nbody_fallback_matches_native(monkeypatch):
    m1 = native.parse_nbody_text(PL3)
    monkeypatch.setattr(native, "get_lib", lambda: None)
    m2 = native.parse_nbody_text(PL3)
    for a, b in zip(m1, m2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_parse_truncated_raises():
    with pytest.raises(ValueError, match="truncated"):
        native.parse_nbody_text("3 1.0 0.1\n0.5\n")


@pytest.mark.parametrize("force_fallback", [False, True])
def test_sample_sink_roundtrip(tmp_path, monkeypatch, force_fallback):
    if force_fallback:
        monkeypatch.setattr(native, "get_lib", lambda: None)
    p = str(tmp_path / "s.pbbi")
    with native.SampleSink(p, 4, 2) as sink:
        for i in range(3):
            total = sink.append(np.full((4, 2), i, np.float32))
    assert total == 12
    data = native.read_samples(p)
    assert data.shape == (12, 2)
    np.testing.assert_allclose(np.asarray(data[8:, 0]), 2.0)


def test_read_samples_rejects_garbage(tmp_path):
    p = str(tmp_path / "bad.bin")
    with open(p, "wb") as f:
        f.write(b"not a pbbi file at all, definitely")
    with pytest.raises(ValueError, match="PBBI"):
        native.read_samples(p)


def test_cli_stream_mode(tmp_path):
    out = str(tmp_path / "stream.pbbi")
    cfg = RunConfig(model="builtin:std_normal_2d", sampler="hmc",
                    num_walkers=128, num_warmup=100, num_samples=50,
                    num_steps=8, collect="stream", output_path=out)
    summary = run(cfg)
    assert summary["streamed_rows"] == 50 * 128
    np.testing.assert_allclose(summary["posterior_mean"], 0.0, atol=0.12)
    np.testing.assert_allclose(summary["posterior_sd"], 1.0, atol=0.12)
    data = native.read_samples(out)
    assert data.shape == (50 * 128, 2)
