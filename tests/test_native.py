"""C++ native runtime: crc32c and skeleton parser parity with Python."""

import numpy as np
import pytest

from skeleton_action_recognition_tpu import native
from skeleton_action_recognition_tpu.data import skeleton, tfrecord


needs_native = pytest.mark.skipif(
    native.load() is None, reason="native library not built"
)


@needs_native
def test_native_crc32c_matches_software():
    rng = np.random.default_rng(0)
    for n in (0, 1, 7, 8, 9, 100, 4096, 65537):
        buf = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
        soft = np.uint32(0xFFFFFFFF)
        table = tfrecord._TABLE
        for b in buf:
            soft = table[(soft ^ b) & np.uint32(0xFF)] ^ (
                soft >> np.uint8(8)
            )
        soft = int(soft ^ np.uint32(0xFFFFFFFF))
        assert native.crc32c(buf) == soft


def _skeleton_text(rng, frames=4, bodies=2, joints=25):
    lines = [str(frames)]
    for _ in range(frames):
        lines.append(str(bodies))
        for _ in range(bodies):
            lines.append(
                "72057594037931101 0 1 1 1 1 0 0.13 -0.25 2"
            )
            lines.append(str(joints))
            for _ in range(joints):
                vals = rng.normal(size=3)
                rest = " ".join("0" for _ in range(9))
                lines.append(
                    f"{vals[0]:.6f} {vals[1]:.6f} {vals[2]:.6f} {rest}"
                )
    return ("\n".join(lines) + "\n").encode()


@needs_native
def test_native_parser_matches_python(tmp_path):
    rng = np.random.default_rng(1)
    text = _skeleton_text(rng)
    path = tmp_path / "S001C001P001R001A001.skeleton"
    path.write_bytes(text)

    via_native = skeleton.read_xyz(str(path), use_native=True)
    via_python = skeleton.read_xyz(str(path), use_native=False)
    assert via_native.shape == via_python.shape
    np.testing.assert_allclose(via_native, via_python, atol=1e-6)


@needs_native
def test_native_parser_truncated_input_errors():
    with pytest.raises(ValueError):
        native.parse_skeleton(b"3\n2\n", 4, 3, 25)


def test_python_fallback_when_native_missing(tmp_path, monkeypatch):
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_load_failed", True)
    assert native.crc32c(b"x") is None
    # tfrecord falls back to the table loop and still validates
    assert tfrecord.crc32c(b"123456789") == 0xE3069283
