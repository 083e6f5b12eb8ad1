"""Multimodal decode path (SURVEY.md §2.D C5).

The fixture payloads are REAL container formats (24bpp BMP, PCM-16
WAV, binary-PPM frame streams) synthesized deterministically from each
document row; `make_decoder` genuinely parses the bytes back. These
tests pin:

- the writer/parser round trip against the closed-form geometry the
  SQL oracle predicts,
- loud failure on corrupt payloads (no decode-to-garbage),
- that every Arrow worker the engine ships is pickled BY VALUE — a
  worker pickled by module reference dies with ModuleNotFoundError on
  any executor whose PYTHONPATH lacks this package (the driver-contract
  runner adds the repo to sys.path only driver-side).
"""

import os
import struct
import subprocess
import sys
import tempfile

import pandas as pd
import pytest

from gomysql2pg_spark.operators.multimodal import (
    BITS_PER_SAMPLE,
    SAMPLE_RATE,
    _bmp_bytes,
    _ppm_stream_bytes,
    _wav_bytes,
    make_decoder,
    make_media_synth,
)


def _decode_one(payload: bytes):
    batch = pd.DataFrame({"doc_id": [0], "payload": [payload]})
    out = list(make_decoder()(iter([batch])))[0]
    row = out.iloc[0]
    return (
        int(row["n_bytes"]),
        int(row["width"]),
        int(row["height"]),
        int(row["n_frames"]),
        row["codec"],
    )


def test_bmp_writer_parser_roundtrip():
    b = _bmp_bytes(33, 47, 123)
    assert b[:2] == b"BM"
    # file size field == actual length == 54 + stride*h
    assert struct.unpack_from("<I", b, 2)[0] == len(b)
    assert len(b) == 54 + ((3 * 33 + 3) // 4) * 4 * 47
    assert _decode_one(b) == (len(b), 33, 47, 1, "bmp")


def test_wav_writer_parser_roundtrip():
    b = _wav_bytes(100, 777)
    assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
    assert len(b) == 44 + 2 * 100
    assert _decode_one(b) == (
        len(b),
        SAMPLE_RATE,
        BITS_PER_SAMPLE,
        100,
        "pcm_s16le",
    )


def test_ppm_stream_writer_parser_roundtrip():
    b = _ppm_stream_bytes(12, 34, 3, 9)
    assert b[:3] == b"P6\n"
    assert len(b) == 3 * (13 + 3 * 12 * 34)
    assert _decode_one(b) == (len(b), 12, 34, 3, "ppm")


def test_corrupt_payload_raises():
    with pytest.raises(ValueError, match="unknown media magic"):
        _decode_one(b"GARBAGE!")
    with pytest.raises(ValueError, match="corrupt PPM"):
        # valid first frame followed by trailing junk that is not a P6
        # header → the frame walk must refuse, not silently truncate
        _decode_one(_ppm_stream_bytes(10, 10, 1, 0) + b"XXXX")


def test_synth_matches_closed_form_geometry():
    """The generator's geometry must equal the SQL oracle's closed form
    for every modality, including c=0 (empty text) and multi-byte
    utf-8 (c != len(text))."""
    texts = ["", "a", "ab", "hello world", "x" * 100, "αβγ", "y" * 193]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    out = list(make_media_synth()(iter([pdf])))[0]
    for (_, row), t in zip(out.iterrows(), texts):
        c = len(t.encode("utf-8"))
        got = _decode_one(bytes(row["payload"]))
        if c % 3 == 0:
            w, h = 16 + c % 48, 16 + (c * 7) % 32
            exp = (54 + ((3 * w + 3) // 4) * 4 * h, w, h, 1, "bmp")
        elif c % 3 == 1:
            n = 64 + c % 192
            exp = (44 + 2 * n, SAMPLE_RATE, BITS_PER_SAMPLE, n, "pcm_s16le")
        else:
            w, h, nf = 10 + c % 80, 10 + (c * 3) % 80, 1 + c % 4
            exp = (nf * (13 + 3 * w * h), w, h, nf, "ppm")
        assert got == exp, (t, c, got, exp)


def _all_shipped_workers():
    """Every Arrow-batch worker the engine passes to mapInPandas /
    applyInPandas / applyInPandasWithState."""
    from gomysql2pg_spark.operators.custom import make_ema_worker
    from gomysql2pg_spark.operators.frequency import make_batch_candidates
    from gomysql2pg_spark.operators.multimodal import make_resizer
    from gomysql2pg_spark.sources.copytext import make_copytext_source
    from gomysql2pg_spark.streaming.stream import (
        make_anomaly_worker,
        make_user_totals_worker,
    )

    return {
        "media_synth": make_media_synth(),
        "decoder": make_decoder(),
        "resizer": make_resizer(),
        "batch_candidates": make_batch_candidates(),
        "ema": make_ema_worker(),
        "user_totals": make_user_totals_worker(),
        "anomaly": make_anomaly_worker(),
        "copytext_source": make_copytext_source(),
    }


def test_workers_unpickle_without_package_on_path(tmp_path):
    """Pickle every shipped worker here, unpickle it in a subprocess
    whose sys.path does NOT contain this repo. By-reference pickling
    (the bug class behind the r9 freq_sketch_check worker failure)
    raises ModuleNotFoundError there."""
    import cloudpickle

    blob = tmp_path / "workers.pkl"
    blob.write_bytes(cloudpickle.dumps(_all_shipped_workers()))
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    code = (
        "import pickle, sys\n"
        "assert not any('repo' in p for p in sys.path), sys.path\n"
        f"ws = pickle.load(open({str(blob)!r}, 'rb'))\n"
        "assert len(ws) == 8 and all(callable(f) for f in ws.values())\n"
        "print('UNPICKLE_OK')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=tempfile.gettempdir(),
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr
    assert "UNPICKLE_OK" in proc.stdout


def test_truncated_and_overrun_payloads_raise():
    """The fail-loudly contract covers every format, not just PPM: a
    BMP magic with a truncated header, a WAV whose data chunk declares
    more bytes than exist, and a WAV with trailing junk must all raise
    instead of decoding header-derived garbage."""
    with pytest.raises(ValueError, match="truncated BMP"):
        _decode_one(b"BM" + b"\x00" * 20)
    wav = _wav_bytes(10, 0)
    with pytest.raises(ValueError, match="chunk overruns"):
        _decode_one(wav[:-4])  # data chunk promises 20 bytes, has 16
    with pytest.raises(ValueError, match="trailing bytes"):
        _decode_one(wav + b"XX")
    # PPM whose final frame's pixel payload is cut short: the frame
    # walk lands past end-of-buffer — must raise, not report the full
    # frame count (the r9 silent-exit hole)
    with pytest.raises(ValueError, match="truncated frame pixels"):
        _decode_one(_ppm_stream_bytes(10, 10, 2, 0)[:-5])
