"""Native TensorBoard event writer (utils/tb_events.py).

The serve loop's TB backend must not import torch/tensorflow (the import
leaked ~20 MB/round of native memory alongside the TPU tunnel client —
BENCH_NOTES round 4), so the event-file format is hand-encoded. These
tests pin the format three independent ways: our generic wire-format
decoder (fast), the crc32c fallback vs google_crc32c (fast), and
TensorFlow's own ``summary_iterator`` (slow tier).
"""

import importlib
import struct

import pytest

from shapley_vit_tpu.utils import tb_events


def test_round_trip_scalars(tmp_path):
    w = tb_events.ScalarEventWriter(str(tmp_path))
    expect = []
    for step in range(3):
        for tag, v in (("shapley/accuracy/client_1", 0.25 * step),
                       ("round/wall_s", 1.5 + step),
                       ("neg/loss", -3.25)):
            w.add_scalar(tag, v, step)
            expect.append((tag, v, step))
    w.close()
    got = tb_events.read_scalar_events(w.path)
    assert got == [(t, pytest.approx(v), s) for t, v, s in expect]


def test_file_starts_with_version_event(tmp_path):
    w = tb_events.ScalarEventWriter(str(tmp_path))
    w.close()
    with open(w.path, "rb") as f:
        data = f.read()
    (n,) = struct.unpack_from("<Q", data, 0)
    body = data[12:12 + n]
    fields = tb_events._decode_fields(body)
    assert fields[(3, 2)] == b"brain.Event:2"


def test_crc32c_fallback_matches_native():
    """The table-driven fallback must agree with google_crc32c (when the
    import is absent the fallback IS the format)."""
    google_crc32c = pytest.importorskip("google_crc32c")
    table = []
    poly = 0x82F63B78
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ poly if c & 1 else c >> 1
        table.append(c)

    def fallback(data):
        c = 0xFFFFFFFF
        for b in data:
            c = table[(c ^ b) & 0xFF] ^ (c >> 8)
        return c ^ 0xFFFFFFFF

    for payload in (b"", b"a", b"hello world", bytes(range(256)) * 3):
        assert fallback(payload) == int(google_crc32c.value(payload))


def test_crc_corruption_detected(tmp_path):
    w = tb_events.ScalarEventWriter(str(tmp_path))
    w.add_scalar("t", 1.0, 0)
    w.close()
    with open(w.path, "rb") as f:
        data = bytearray(f.read())
    data[-6] ^= 0xFF  # flip a payload byte of the last record
    with open(w.path, "wb") as f:
        f.write(data)
    with pytest.raises(AssertionError):
        tb_events.read_scalar_events(w.path)


def test_writer_no_heavy_imports(tmp_path):
    """The whole point: logging a round must not pull torch/tensorflow."""
    import subprocess
    import sys

    code = (
        "import sys\n"
        "from shapley_vit_tpu.utils.logging import TensorBoardWriter\n"
        f"w = TensorBoardWriter({str(tmp_path)!r})\n"
        "w.log_round(0, [{0: 0.5}], utility=[0.1], wall_s=1.0)\n"
        "w.close()\n"
        "banned = [m for m in ('torch', 'tensorflow', 'tensorboard')"
        " if m in sys.modules]\n"
        "assert not banned, banned\n"
        "print('CLEAN')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=120
    )
    assert out.returncode == 0, out.stderr
    assert "CLEAN" in out.stdout


@pytest.mark.slow
def test_tensorflow_reads_our_files(tmp_path):
    """Ground truth: TF's summary_iterator parses the file bit-for-bit."""
    tf = pytest.importorskip("tensorflow")
    w = tb_events.ScalarEventWriter(str(tmp_path))
    for step in range(4):
        w.add_scalar("sv/client_1", 0.1 * step, step)
    w.close()
    got = []
    for ev in tf.compat.v1.train.summary_iterator(w.path):
        for v in ev.summary.value:
            got.append((v.tag, round(float(v.simple_value), 6), int(ev.step)))
    assert got == [("sv/client_1", round(0.1 * s, 6), s) for s in range(4)]


def test_writer_threaded_appends(tmp_path):
    """The serve loop and the artifact worker may both log; records must
    interleave whole (the framing makes torn writes unreadable)."""
    import threading

    w = tb_events.ScalarEventWriter(str(tmp_path))

    def log(tid):
        for i in range(200):
            w.add_scalar(f"t{tid}", float(i), i)

    threads = [threading.Thread(target=log, args=(t,)) for t in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    w.close()
    got = tb_events.read_scalar_events(w.path)
    assert len(got) == 800
    for tid in range(4):
        vals = [(v, s) for tag, v, s in got if tag == f"t{tid}"]
        assert vals == [(float(i), i) for i in range(200)]


def test_negative_step_encodes_and_round_trips(tmp_path):
    """Protobuf varints encode negative int64s as 10-byte two's complement;
    the old shift loop never terminated for n<0 (Python keeps -1 at -1
    under >>), hanging add_scalar in the caller's thread (round-4 review).
    """
    enc = tb_events._varint(-1)
    assert enc == b"\xff" * 9 + b"\x01"  # canonical proto encoding of -1
    w = tb_events.ScalarEventWriter(str(tmp_path))
    w.add_scalar("relative/epoch", 0.5, step=-3)
    w.close()
    assert tb_events.read_scalar_events(w.path) == [
        ("relative/epoch", 0.5, -3)
    ]
